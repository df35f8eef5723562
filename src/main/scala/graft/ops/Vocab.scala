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

  /** Per-document bigram perplexity under a stupid-backoff bigram
    * model trained on `statsDocs` — the CCNet/Gopher-style
    * "perplexity filter" one rung up from [[surprisal]]'s unigram
    * model: it also penalizes documents whose tokens are individually
    * common but locally incoherent (shuffled text, keyword stuffing,
    * template soup), the failure mode a unigram model can't see.
    *
    * Model: S(w2|w1) = B(w1,w2)/U(w1) when the bigram was seen in
    * `statsDocs`; else backoff α·U(w2)/N; else (OOV) α/N — stupid
    * backoff (Brants et al. 2007) with α fixed at 1/2, because
    * −log2(1/2) is EXACTLY one bit: with floor-log2 as
    * `length(bin(x))−1` (surprisal's trick) every per-bigram score is
    * exact integer arithmetic in both engines, so the oracle
    * replicates the output bit-for-bit — no IEEE log anywhere.
    * Quantization is ≤1 bit per bigram and monotone in each count, so
    * ranking fidelity (what a filter threshold consumes) survives.
    *
    * Plan shape: bigrams are built ROW-LOCALLY from the token array
    * (a guarded sequence/transform — map-side Generate, no window, no
    * self-join); what shuffles is 60-bit hashes, never token text.
    * Stats side: one unigram and one bigram hash aggregate (map-side
    * partials) plus a vocabulary-sized join attaching each bigram's
    * context count. Scoring side: two hash equi-joins (bigram key,
    * backoff-unigram key) — both shuffle-partitionable and
    * AQE-skew-splittable for stop-word bigrams — the 1-row total as a
    * broadcast cross join, one doc_id aggregate, and the docs spine
    * LEFT join so sub-2-token documents emit zeros. Stats frames are
    * distinct-bigram-sized (sub-linear in corpus growth once the
    * n-gram space saturates), never corpus-row-sized.
    *
    * Hash collisions (60-bit) merge counts IDENTICALLY in both
    * engines (same md5 prefix), so exactness of the comparison is
    * unaffected; the model itself treats a collision as count noise,
    * the standard hashed-LM trade. */
  def bigramPerplexity(docs: DataFrame, statsDocs: DataFrame, textCol: String): DataFrame = {
    import graft.plans.Hash60.hash60
    def toksOf(df: DataFrame) = df.select(col("doc_id"),
      filter(graft.functions.TextFunctions.tokens(coalesce(col(textCol), lit(""))),
        t => length(t) > 0).as("__t"))
    // (doc_id, bh, w1h, w2h) per consecutive token pair; docs with
    // <2 tokens yield a NULL array, which explode drops (the output
    // spine join restores them). sequence() would step DOWNWARD for
    // size-1 docs, hence the guard (TextFunctions.wordShingles' rule).
    def bigramsOf(df: DataFrame) = toksOf(df)
      .select(col("doc_id"), explode(when(size(col("__t")) >= 2,
        transform(sequence(lit(1), size(col("__t")) - 1),
          i => struct(element_at(col("__t"), i).as("w1"),
            element_at(col("__t"), i + 1).as("w2"))))).as("__bg"))
      .select(col("doc_id"),
        hash60(concat(col("__bg.w1"), lit("\u001f"), col("__bg.w2"))).as("bh"),
        hash60(col("__bg.w1")).as("w1h"),
        hash60(col("__bg.w2")).as("w2h"))

    val uni = toksOf(statsDocs).select(explode(col("__t")).as("__w"))
      .groupBy(hash60(col("__w")).as("wh")).agg(count(lit(1)).as("u_cnt"))
    // greatest(·,1) keeps bin() defined under an EMPTY stats corpus
    // (every bigram then scores as OOV at 1 bit)
    val total = uni.agg(greatest(coalesce(sum(col("u_cnt")), lit(0L)), lit(1L)).as("n_total"))
    // one row per bh even under collisions: min(w1h) picks the
    // context key deterministically (and identically in the oracle)
    val stats = bigramsOf(statsDocs)
      .groupBy(col("bh")).agg(count(lit(1)).as("b_cnt"), min(col("w1h")).as("__ctx"))
      .join(uni.select(col("wh").as("__ctx"), col("u_cnt").as("ctx_cnt")), Seq("__ctx"))
      .select(col("bh"), col("b_cnt"), col("ctx_cnt"))

    val flogN = length(bin(col("n_total"))) // = floor(log2 N) + 1
    val bits =
      when(col("b_cnt").isNotNull,
        (length(bin(col("ctx_cnt"))) - length(bin(col("b_cnt")))).cast("long"))
      .when(col("u2_cnt").isNotNull,
        (lit(1) + flogN - length(bin(col("u2_cnt")))).cast("long"))
      .otherwise(flogN.cast("long")) // 1 + floor(log2 N): α/N floor
    val per = bigramsOf(docs)
      .join(stats, Seq("bh"), "left")
      .join(uni.select(col("wh").as("w2h"), col("u_cnt").as("u2_cnt")), Seq("w2h"), "left")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(bits).as("ppl_bits"),
        sum(when(col("b_cnt").isNull && col("u2_cnt").isNotNull, 1L).otherwise(0L)).as("n_backoff"),
        sum(when(col("u2_cnt").isNull, 1L).otherwise(0L)).as("n_oov"))
    docs.select(col("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("ppl_bits"), lit(0L)).as("ppl_bits"),
        coalesce(col("n_backoff"), lit(0L)).as("n_backoff"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("avg_bits",
        when(col("n_bigrams") > 0,
          col("ppl_bits").cast("double") / col("n_bigrams").cast("double"))
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

  /** Interpolated Kneser-Ney bigram probabilities (Kneser & Ney
    * 1995; Chen & Goodman 1998's interpolated form) — the real LM
    * smoothing next to [[bigramPerplexity]]'s stupid backoff:
    * absolute discount D = 3/4 off every observed bigram, the freed
    * mass backed off to the CONTINUATION unigram (how many distinct
    * contexts a word follows — why "Francisco" gets low weight
    * despite high frequency):
    *
    *   P(w2|w1) = (c12 − D)/c1 + (D·N1+(w1·)/c1) · (N1+(·w2)/N1+(··))
    *
    * (observed bigrams have c12 ≥ 1 > D, so the max(·,0) clamp of
    * the general form never binds on this table).
    *
    * Exactness: all five statistics are exact integer counts; the
    * probability is ONE double expression over them, nano-rounded —
    * the q_bm25 determinism contract. D = 3/4 is exactly
    * representable, so the discount introduces no decimal noise.
    *
    * Scale shape: one corpus-sized bigram aggregate; left/right/type
    * statistics fold from the BIGRAM-TYPE frame (vocab²-bounded, not
    * corpus-bounded); two joins on its keys plus a 1-row broadcast;
    * top-k is TakeOrderedAndProject under the (c12 DESC, w1, w2)
    * total order.
    *
    * Output: w1, w2, c12, c1, n1fw, n1bw, p_kn_nano.
    */
  def knBigramTable(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"knBigramTable: k must be >= 1, got $k")
    val toks = docs.select(
      filter(graft.functions.TextFunctions.tokens(coalesce(col(textCol), lit(""))),
        t => length(t) > 0).as("__t"))
    val bg = toks.select(explode(when(size(col("__t")) >= 2,
        transform(sequence(lit(1), size(col("__t")) - 1),
          i => struct(element_at(col("__t"), i).as("w1"),
            element_at(col("__t"), i + 1).as("w2"))))).as("__bg"))
      .select(col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
    val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val left = cb.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1fw"))
    val right = cb.groupBy(col("w2")).agg(count(lit(1)).as("n1bw"))
    val types = cb.agg(count(lit(1)).as("__ntypes"))
    val d = col("c12").cast("double")
    cb.join(left, Seq("w1")).join(right, Seq("w2"))
      .crossJoin(broadcast(types))
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        col("n1fw"), col("n1bw"),
        round(lit(1e9) * (
          (d - lit(0.75)) / col("c1").cast("double") +
            (lit(0.75) * col("n1fw").cast("double") / col("c1").cast("double")) *
              (col("n1bw").cast("double") / col("__ntypes").cast("double"))))
          .cast("long").as("p_kn_nano"))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(k)
  }
}
