package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-quality metrics — grading a ranked result list against
  * relevance judgments. The evaluation half of the hybrid-search
  * stack ([[Fusion]] builds the list, this module scores it):
  * nDCG@k for graded relevance, reciprocal rank for "how deep is
  * the first hit".
  *
  * Exactness ladder: gains 2^rel − 1 are EXACT doubles (pow of 2 is
  * correctly rounded hence exact, rel capped loud at 16), one IEEE
  * division by log2(pos+1) per position — rendered ·ln2 / ln(pos+1)
  * so both engines run the identical tree — nano-rounded PER TERM
  * then summed order-free (the Adamic-Adar mirrored-log precedent). nDCG's final division operates on the
  * two already-exact nano longs, one mirrored tree. MRR is fully
  * integer: 10⁹ div rank, truncating division identical in both
  * engines.
  *
  * Scale: everything is per-query frames — the shuffle key is qid
  * and each partition holds one query's top-N plus its judgment
  * pool (bounded by the judged set, never the corpus). Two hash
  * aggregates and one join end to end.
  */
object RankEval {

  /** log2 is rendered as ln(x)/ln(2) with this shared literal —
    * Spark's log2 is Math.log(x)/Math.log(2) while DuckDB's log2 is
    * libm log2(); mirroring through ln (the q_adamic_adar precedent)
    * plus one identical constant keeps both engines on the same
    * IEEE tree. */
  private val Ln2 = 0.6931471805599453

  private def relCol(judgments: DataFrame): DataFrame = {
    // Dup (qid, item) judgments would double-join; negative or
    // oversized rel breaks the exact-gain contract. Both guards
    // live INSIDE the consumed rel column (an unreferenced guard
    // column gets pruned and never fires).
    judgments.select(col("qid"), col("item"),
      when(count(lit(1)).over(Window.partitionBy(col("qid"), col("item"))) > 1,
        raise_error(concat(lit("rankeval: duplicate judgment for "),
          col("qid").cast("string"), lit("/"), col("item").cast("string"))))
      .when(col("rel").isNull || col("rel") < 0 || col("rel") > 16,
        raise_error(concat(lit("rankeval: rel must be in [0, 16], got "),
          col("rel").cast("string"))))
      .otherwise(col("rel")).cast("long").as("rel"))
  }

  /** Result-side dup guards, INSIDE the consumed pos column (the
    * relCol precedent): a duplicate rank would be two items at one
    * position, a duplicate item would double-count one item against
    * a single judgment — each silently inflates every metric here. */
  private def guardedResults(results: DataFrame): DataFrame =
    results.select(col("qid"), col("item"),
      when(count(lit(1)).over(Window.partitionBy(col("qid"), col("rank"))) > 1,
        raise_error(concat(lit("rankeval: duplicate rank in results for qid "),
          col("qid").cast("string"))))
      .when(count(lit(1)).over(Window.partitionBy(col("qid"), col("item"))) > 1,
        raise_error(concat(lit("rankeval: duplicate item in results for "),
          col("qid").cast("string"), lit("/"), col("item").cast("string"))))
      .otherwise(col("rank")).cast("long").as("pos"))

  /** Per-query precision@k and recall@k — the set-based complement
    * to the graded [[ndcg]]: hits = top-k retrieved items with
    * rel > 0; precision divides by k (the standard fixed-denominator
    * form — a query that retrieved fewer than k items is penalized
    * for it), recall by the query's FULL relevant pool (NULL when
    * the pool is empty — undefined, not zero). Exact integer counts,
    * two mirrored divisions. Output: (qid, n_hits, n_rel, p_nano,
    * r_nano). */
  def precisionRecallAtK(results: DataFrame, judgments: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"precisionRecallAtK: k must be >= 1, got $k")
    val j = relCol(judgments)
    val hits = guardedResults(results).where(col("pos") <= k)
      .join(j, Seq("qid", "item"), "left")
      .groupBy(col("qid"))
      .agg(sum(when(coalesce(col("rel"), lit(0L)) > 0, 1L).otherwise(0L)).as("n_hits"))
    val pool = j.where(col("rel") > 0)
      .groupBy(col("qid")).agg(count(lit(1)).as("n_rel"))
    hits.join(pool, Seq("qid"), "left")
      .select(col("qid"), col("n_hits"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        round(lit(1e9) * col("n_hits").cast("double") / lit(k.toDouble))
          .cast("long").as("p_nano"),
        when(coalesce(col("n_rel"), lit(0L)) === 0, lit(null).cast("long"))
          .otherwise(round(lit(1e9) * col("n_hits").cast("double") /
            col("n_rel").cast("double")).cast("long")).as("r_nano"))
  }

  /** Per-query nDCG@k. `results`: (qid, item, rank) with rank
    * 1-based and unique per qid (duplicates raise); `judgments`:
    * (qid, item, rel) with rel in [0, 16]. The ideal ranking draws
    * from the FULL judgment pool of the query (standard nDCG —
    * an engine that never retrieved the best document is penalized
    * for it), rel desc then item asc, truncated at k.
    *
    * Output: qid, dcg_nano, idcg_nano, ndcg_nano (NULL when the
    * query has no relevant judgments at all). */
  def ndcg(results: DataFrame, judgments: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"ndcg: k must be >= 1, got $k")
    val j = relCol(judgments)
    val res = guardedResults(results)
    def gainTerm(pos: org.apache.spark.sql.Column,
                 rel: org.apache.spark.sql.Column) =
      round(lit(1e9) * (pow(lit(2.0), rel.cast("double")) - 1.0) * lit(Ln2) /
        log((pos + 1L).cast("double"))).cast("long")
    val dcg = res.where(col("pos") <= k)
      .join(j, Seq("qid", "item"), "left")
      .select(col("qid"), gainTerm(col("pos"), coalesce(col("rel"), lit(0L))).as("__t"))
      .groupBy(col("qid")).agg(sum(col("__t")).as("dcg_nano"))
    val ideal = j.where(col("rel") > 0)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("rel").desc, col("item"))).cast("long"))
      .where(col("pos") <= k)
      .select(col("qid"), gainTerm(col("pos"), col("rel")).as("__t"))
      .groupBy(col("qid")).agg(sum(col("__t")).as("idcg_nano"))
    dcg.join(ideal, Seq("qid"), "left")
      .select(col("qid"), col("dcg_nano"),
        coalesce(col("idcg_nano"), lit(0L)).as("idcg_nano"),
        when(coalesce(col("idcg_nano"), lit(0L)) === 0, lit(null).cast("long"))
          .otherwise(round(lit(1e9) * col("dcg_nano").cast("double") /
            col("idcg_nano").cast("double")).cast("long")).as("ndcg_nano"))
  }

  /** Per-query reciprocal rank: 10⁹ div rank of the FIRST relevant
    * (rel > 0) retrieved item; rank NULL and rr_nano 0 when the
    * result list has no relevant item. Fully integer. */
  def reciprocalRank(results: DataFrame, judgments: DataFrame): DataFrame = {
    val j = relCol(judgments)
    results.select(col("qid"), col("item"), col("rank").cast("long").as("pos"))
      .join(j, Seq("qid", "item"), "left")
      .groupBy(col("qid"))
      .agg(min(when(coalesce(col("rel"), lit(0L)) > 0, col("pos"))).as("first_rel_rank"))
      .select(col("qid"), col("first_rel_rank"),
        coalesce(expr("1000000000L div first_rel_rank"), lit(0L)).as("rr_nano"))
  }
}
