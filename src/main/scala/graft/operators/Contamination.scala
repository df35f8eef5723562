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
  * carries), the eval side explodes its shingles and LEFT SEMI-joins
  * the training set per shingle, then re-aggregates per eval doc.
  * Both joins are hash-partitioned equi-joins on a long key; eval
  * corpora are small, so the per-shingle join is usually
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
    // ONE shingling pass over the eval corpus, reused for both the
    // exploded semi-join side and the per-doc spine
    val evalSh = NearDup.shingled(eval, textCol, n)
    val evalShingles = evalSh
      .select(col("doc_id"), col("n_shingles"), explode(col("hs")).as("h"))
    val hits = evalShingles.join(trainShingles, Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contaminated"))
    evalSh
      .select(col("doc_id"), col("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_contaminated", coalesce(col("n_contaminated"), lit(0L)))
      .withColumn("containment",
        when(col("n_shingles") > 0,
          col("n_contaminated").cast("double") / col("n_shingles").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("is_contaminated", col("containment") >= threshold)
  }
}
