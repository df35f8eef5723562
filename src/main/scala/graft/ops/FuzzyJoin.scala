package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (entity resolution): find record pairs
  * whose names are within an edit-distance budget WITHOUT the
  * all-pairs comparison that is quadratic in the corpus. The
  * classic blocking construction: a cheap deterministic block key
  * partitions the corpus, candidates are generated only within a
  * block (one equi-join shuffle), and the expensive verifier
  * (`levenshtein`, codegen'd) runs on candidates only.
  *
  * Recall is exactly "pairs sharing a block" — the standard
  * blocking trade-off, stated rather than hidden: a pair whose
  * first tokens differ ("red widgett" / "rad widgett") is missed by
  * the default first-token block. Callers needing higher recall
  * union several `pairs` runs with different `blockKey`s (multi-pass
  * blocking), which stays sub-quadratic; the oracle replicates the
  * block definition so the semantics stay exact.
  *
  * Scale: with B blocks of size n_i, candidate volume is
  * Σ n_i²/2 — sub-quadratic whenever blocking is selective, the
  * same candidate-volume argument as `NearDup`'s PPJoin filter.
  * A hot block (skewed first token) degrades toward n² within that
  * block only; pick a finer `blockKey` (token + length band) when a
  * block outgrows one task's comfort.
  */
object FuzzyJoin {

  /** Default block: lower-cased first whitespace-delimited token.
    * Edit distance ≤ k pairs that disagree on it are missed (see
    * scaladoc); it is deterministic, null-safe (null text → null
    * block → dropped), and replicable in any engine. */
  def firstTokenBlock(text: Column): Column =
    lower(split(trim(text), " +").getItem(0))

  /** Self-match: pairs (id_l < id_r) from one frame whose `textCol`
    * values share a block and are within `maxDist` edits. Output:
    * id_l, id_r, text_l, text_r, dist (INT). */
  def selfPairs(df: DataFrame, idCol: String, textCol: String, maxDist: Int,
                blockKey: Column => Column = firstTokenBlock): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val keyed = df
      .select(col(idCol), col(textCol))
      .where(col(textCol).isNotNull)
      .withColumn("__blk", blockKey(col(textCol)))
    val l = keyed.select(col("__blk"), col(idCol).as("id_l"), col(textCol).as("text_l"))
    val r = keyed.select(col("__blk"), col(idCol).as("id_r"), col(textCol).as("text_r"))
    l.join(r, "__blk")
      .where(col("id_l") < col("id_r"))
      // cheap length pre-filter: |len diff| > maxDist can't pass
      .where(abs(length(col("text_l")) - length(col("text_r"))) <= maxDist)
      .withColumn("dist", levenshtein(col("text_l"), col("text_r")))
      .where(col("dist") <= maxDist)
      .select(col("id_l"), col("id_r"), col("text_l"), col("text_r"),
        col("dist").cast("int").as("dist"))
  }

  /** Two-frame variant (link records of `left` to `right`). */
  def pairs(left: DataFrame, right: DataFrame,
            leftId: String, rightId: String,
            leftText: String, rightText: String, maxDist: Int,
            blockKey: Column => Column = firstTokenBlock): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val l = left.select(col(leftId), col(leftText))
      .where(col(leftText).isNotNull)
      .withColumn("__blk", blockKey(col(leftText)))
    val r = right.select(col(rightId), col(rightText))
      .where(col(rightText).isNotNull)
      .withColumn("__blk", blockKey(col(rightText)))
    l.join(r, "__blk")
      .where(abs(length(col(leftText)) - length(col(rightText))) <= maxDist)
      .withColumn("dist", levenshtein(col(leftText), col(rightText)))
      .where(col("dist") <= maxDist)
      .select(col(leftId), col(rightId), col(leftText), col(rightText),
        col("dist").cast("int").as("dist"))
  }
}
