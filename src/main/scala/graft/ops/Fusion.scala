package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion — combining several retrieval rankings (BM25 lexical,
  * cosine/ANN semantic, recency, popularity…) into ONE list per
  * query. The hybrid-search half of an LLM data/RAG stack: each
  * retriever emits its own top-N, and the fused order decides what
  * the model actually sees.
  *
  * Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
  *
  *   score(q, d) = Σ_lists 1 / (k + rank_list(q, d))
  *
  * RRF only reads RANKS, never raw scores, so wildly different score
  * scales (BM25 vs cosine) fuse without calibration — the reason it
  * is the default hybrid combiner in production search engines.
  *
  * Exactness: each contribution is the EXACT integer
  * `10⁹ div (k + rank)` — positive-domain truncating division,
  * identical in Spark (`div`) and DuckDB (`//`) — summed order-free
  * per (query, item) as longs. No doubles anywhere, so the fused
  * order is partition- and engine-independent. Max contribution
  * 10⁹/(k+1) and ≤ ~100 lists keeps sums far from Long range.
  *
  * Scale: ranking is one window per (list, query) — the shuffle key
  * is (list, query) and each partition holds ONE retriever's
  * candidates for ONE query (bounded by the retriever's top-N, not
  * the corpus). Fusion is a single hash aggregate on (query, item).
  * Nothing global, nothing quadratic; 100 TB of corpus never
  * appears here — only the candidate lists do.
  */
object Fusion {

  /** Fuse ranked candidate lists. Input: one row per (list, query,
    * item) with a raw score; rank within (list, query) is by score
    * DESC then item ASC (a deterministic total order — ties cannot
    * reorder across engines or partitionings). NULL scores raise
    * (a retriever emitting NULL is a bug upstream, not a rank).
    * Duplicate (list, query, item) rows raise — they would silently
    * double-count a retriever's vote.
    *
    * Output: qid, item, n_lists, best_rank, rrf_nano. */
  def rrf(df: DataFrame, listCol: String, qidCol: String,
          itemCol: String, scoreCol: String, k: Int = 60): DataFrame = {
    require(k >= 1, s"rrf: k must be >= 1, got $k")
    val score = when(col(scoreCol).isNull,
        raise_error(lit(s"rrf: NULL $scoreCol — retriever emitted a null score")))
      .otherwise(col(scoreCol))
    // The dup guard lives INSIDE rk (the consumed column) — a guard
    // in its own unreferenced column gets pruned by Catalyst and
    // never fires.
    val ranked = df.select(col(listCol).as("__l"), col(qidCol).as("qid"),
        col(itemCol).as("item"), score.as("__s"))
      .withColumn("rk",
        when(count(lit(1)).over(
            Window.partitionBy(col("__l"), col("qid"), col("item"))) > 1,
          raise_error(concat(lit("rrf: duplicate (list, query, item) row: "),
            col("__l"), lit("/"), col("qid").cast("string"), lit("/"),
            col("item").cast("string"))))
        .otherwise(row_number().over(
          Window.partitionBy(col("__l"), col("qid"))
            .orderBy(col("__s").desc, col("item"))).cast("long")))
    ranked.groupBy(col("qid"), col("item"))
      .agg(count(lit(1)).as("n_lists"), min(col("rk")).as("best_rank"),
        sum(expr(s"1000000000L div ($k + rk)")).as("rrf_nano"))
  }

  /** Top-N fused items per query, by rrf_nano DESC then item ASC
    * (deterministic under score ties). One window over the
    * metadata-sized fused frame. */
  def topFused(fused: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"topFused: n must be >= 1, got $n")
    fused.withColumn("__fr", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("rrf_nano").desc, col("item"))))
      .where(col("__fr") <= n).drop("__fr")
  }
}
