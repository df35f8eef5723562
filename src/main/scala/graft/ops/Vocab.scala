package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus vocabulary statistics: the top-k tokens by frequency with
  * each prefix's cumulative share of total token mass — the curve
  * behind "how large a vocabulary covers 95% of the corpus", the
  * first question of any tokenizer/vocab design pass.
  *
  * Plan shape, inside-out: one (token) hash aggregate with map-side
  * partials (the only full-corpus shuffle, moving one row per
  * DISTINCT token per map partition); the global top-k plans as
  * TakeOrderedAndProject (no total sort — each partition keeps its
  * local k); total mass enters as a 1-row broadcast cross join (same
  * move as TfIdf's N). The rank/cumulative window runs over the k
  * SURVIVORS only — a k-row single partition, constant work at any
  * corpus size.
  *
  * `cum_share` divides two exactly-aggregated longs, so the double is
  * bit-identical across engines (no float summation-order hazard).
  * Ordering is total: count desc, then token — ties can't reshuffle
  * the top-k frontier between runs or engines.
  */
object Vocab {

  /** (token, cnt, rank, cum_share) for the `k` most frequent tokens.
    * Empty tokens (from leading whitespace) are excluded; NULL text
    * contributes nothing. */
  def coverage(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val counts = docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    val top = counts.orderBy(col("cnt").desc, col("token").asc).limit(k)
    val w = Window.orderBy(col("cnt").desc, col("token").asc)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_share",
        sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double") / col("total").cast("double"))
      .select(col("token"), col("cnt"), col("rank"), col("cum_share"))
  }

  /** Per-document out-of-vocabulary rate against a vocabulary table
    * (one `token` column — the output of `coverage`, a tokenizer's
    * vocab dump, whatever): (doc_id, n_tokens, n_oov, oov_rate).
    * The tokenizer-eval question — "how much of each document does
    * this vocabulary NOT cover?"
    *
    * One explode + one broadcast left join + one aggregate; empty
    * documents ride `explode_outer`'s null row through the join
    * (counted as neither token nor OOV — rate 0) so no second spine
    * branch is needed. Vocabulary tables are vocabulary-sized:
    * always broadcastable. */
  /** Per-document unigram surprisal — a corpus-statistics quality
    * signal (the cheap cousin of LM-perplexity filtering): documents
    * of only ultra-common tokens (boilerplate, navigation chrome)
    * score near 0 bits/token; documents of corpus-rare tokens
    * (noise, mojibake, exotic jargon) score high. Both tails are the
    * usual curation targets.
    *
    * Surprisal of a token with corpus count c out of N total tokens
    * is −log2(c/N) = log2(N) − log2(c). To stay bit-reproducible
    * across engines this uses the FLOOR-log2 image of each side —
    * `length(bin(x)) − 1`, an exact integer in any engine — rather
    * than IEEE log() (whose last-ulp rounding differs between
    * libms). The per-doc output is integer bit-sums plus ONE double
    * division, so it hash-matches the DuckDB oracle exactly. The
    * quantization is at most 1 bit per token and monotone in the
    * count's magnitude — ranking fidelity, the thing a filter
    * threshold needs, survives.
    *
    * Plan shape: one token-count aggregate (map-side partials, the
    * only full-corpus shuffle), a token equi-join that REUSES the
    * count side's hash partitioning, the 1-row total as a broadcast
    * cross join (Vocab.coverage's move), then a doc_id aggregate.
    * The count frame is vocabulary-sized, not corpus-sized; at
    * 100 TB it is still a shuffle join on token (vocabularies with
    * long tails outgrow broadcast), which AQE skew-splits for
    * stop-word-heavy tokens. Empty/NULL documents ride
    * explode_outer's null row: n_tokens 0, 0 bits, avg 0.0. */
  def surprisal(docs: DataFrame, textCol: String): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode_outer(filter(graft.functions.TextFunctions.tokens(col(textCol)),
        t => length(t) > 0)).as("token"))
    val counts = toks.where(col("token").isNotNull)
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    // floor-log2 via binary-string length: length(bin(x)) − 1, exact
    val bits = length(bin(col("total"))) - length(bin(col("cnt")))
    toks
      .join(counts, Seq("token"), "left")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        count(col("token")).as("n_tokens"),
        sum(when(col("token").isNotNull, bits.cast("long")).otherwise(0L))
          .as("surprisal_bits"))
      .withColumn("avg_surprisal",
        when(col("n_tokens") > 0,
          col("surprisal_bits").cast("double") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)))
  }

  def oovRate(docs: DataFrame, textCol: String, vocab: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode_outer(filter(graft.functions.TextFunctions.tokens(col(textCol)),
        t => length(t) > 0)).as("token"))
    toks
      .join(broadcast(vocab.select(col("token")).distinct()
        .withColumn("__v", lit(1))), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("token")).as("n_tokens"),
        sum(when(col("token").isNotNull && col("__v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        when(col("n_tokens") > 0,
          col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)))
  }
}
