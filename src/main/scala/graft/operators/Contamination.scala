package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval contamination detection — the n-gram containment check
  * an LLM data pipeline runs before trusting a benchmark number: for
  * every eval document, what fraction of its n-gram shingles appears
  * ANYWHERE in the training corpus?
  *
  * Scale shape: the training side collapses to its DISTINCT shingle
  * hashes (one explode + distinct — shuffles longs, never text; at
  * 100 TB this is the same cardinality the near-dup index already
  * carries); the eval side is shingled ONCE, exploded, LEFT-joined
  * against the training set per shingle (hit = found), and
  * re-aggregated per eval doc — one join end to end, with empty
  * docs carried through on a NULL sentinel shingle instead of a
  * second spine branch. The join is a hash-partitioned equi-join on
  * a long key; eval corpora are small, so it is usually
  * broadcast-able from the eval side — but the plan also works when
  * the eval set is large (skew on stopword-heavy shingles is bounded
  * because shingle sets are DISTINCT per doc).
  *
  * Contamination is reported per eval doc (containment in [0,1] and
  * the flag at `threshold`); a doc with no shingles (shorter than n
  * tokens) reports containment 0 — too short to say anything, never
  * "contaminated by default".
  */
object Contamination {

  /** Per-eval-doc containment vs the training corpus.
    * Output: (doc_id, n_shingles, n_contaminated, containment,
    * is_contaminated). */
  def evalContamination(train: DataFrame, eval: DataFrame, textCol: String,
                        n: Int, threshold: Double): DataFrame = {
    val trainShingles = NearDup.shingled(train, textCol, n)
      .select(explode(col("hs")).as("h")).distinct()
    // ONE pass over the eval corpus, ONE join: docs with no shingles
    // explode a single NULL sentinel (null joins nothing, counts
    // nothing) so every doc survives to the re-aggregation — no
    // second shingling branch, no spine join
    val evalShingles = NearDup.shingled(eval, textCol, n)
      .select(col("doc_id"), col("n_shingles"),
        explode(when(size(col("hs")) > 0, col("hs"))
          .otherwise(array(lit(null).cast("long")))).as("h"))
    evalShingles
      .join(trainShingles.withColumn("__hit", lit(1)), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(max(col("n_shingles")).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_contaminated"))
      .withColumn("containment",
        when(col("n_shingles") > 0,
          col("n_contaminated").cast("double") / col("n_shingles").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("is_contaminated", col("containment") >= threshold)
  }

  /** Contamination ATTRIBUTION: for each eval doc, the top-k training
    * documents sharing at least `minCommon` shingles — the action
    * list a decontamination pass needs (drop or audit those TRAIN
    * docs), where `evalContamination` only says how bad it is.
    *
    * Scale shape: both sides explode to (doc, shingle) longs and meet
    * in one equi-join on the shingle; the per-shingle fan-out is
    * df_train · df_eval, so ubiquitous shingles (stopword runs,
    * boilerplate) would dominate the join while carrying no
    * attribution signal. `maxTrainDf` drops shingles above a training
    * document frequency cap BEFORE the join — the standard inverted-
    * index stop-list, applied identically in the oracle. Pair counts
    * then aggregate with map-side partials and the top-k is one
    * window per eval doc. */
  def contaminationSources(train: DataFrame, eval: DataFrame, textCol: String,
                           n: Int, minCommon: Long, k: Int,
                           maxTrainDf: Long = 1000000L): DataFrame = {
    require(minCommon >= 1, "minCommon must be at least 1")
    require(k > 0, "k must be positive")
    require(maxTrainDf >= 1, "maxTrainDf must be at least 1")
    val tr = NearDup.shingled(train, textCol, n)
      .select(col("doc_id").as("train_id"), explode(col("hs")).as("h"))
    // df via groupBy + key join, NOT a count window partitioned by h:
    // the window form funnels every occurrence of a hot shingle
    // through one task BEFORE the cap can drop it — the exact
    // hot-gram serialization SubstringDedup documents avoiding. The
    // aggregate has map-side partials; the join is narrow longs.
    val trAllowed = tr.groupBy(col("h")).agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxTrainDf)
      .select(col("h"))
    val trCapped = tr.join(trAllowed, Seq("h"))
    val ev = NearDup.shingled(eval, textCol, n)
      .select(col("doc_id").as("eval_id"), explode(col("hs")).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("eval_id"))
      .orderBy(col("n_common").desc, col("train_id").asc)
    ev.join(trCapped, Seq("h"))
      .groupBy(col("eval_id"), col("train_id"))
      .agg(count(lit(1)).as("n_common"))
      .where(col("n_common") >= minCommon)
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
  }
}
