package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level health statistics: the Zipf rank-frequency exponent
  * and pairwise source overlap — the two numbers a curation run
  * reads to answer "does this corpus look like natural language"
  * and "are my sources secretly the same crawl".
  *
  * Determinism: both follow the nano-rounding ladder — logs and
  * divisions are single mirrored expressions over exact integers,
  * rounded to fixed-point longs BEFORE any summation, so totals are
  * order-free. Zipf's regression sums use MICRO units (10⁶): two
  * micro factors multiply to 10¹² per term, keeping thousands of
  * summed terms far under 2⁶³ (nano factors would overflow at ~10
  * terms).
  */
object CorpusStats {

  /** Least-squares slope of ln(freq) on ln(rank) over the top-k
    * tokens — natural text sits near −1 (Zipf); machine-generated
    * or template-heavy corpora drift flat (head too even) or steep
    * (vocabulary collapse). Output one row: n_tokens (the k actually
    * available), slope_nano.
    *
    *   x = round(10⁶·ln rank), y = round(10⁶·ln freq)  (exact longs)
    *   slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx·Σx)       (one division)
    *
    * Ranks come from the (freq DESC, token ASC) total order over the
    * top-k frame — k rows, so the rank window is bounded by the
    * parameter, not the vocabulary. The corpus-sized work is one
    * token-count hash aggregate + a TakeOrderedAndProject top-k. */
  def zipfSlope(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 2, s"zipfSlope: need k >= 2 points, got $k")
    val toks = docs.select(explode(
        filter(graft.functions.TextFunctions.tokens(coalesce(col(textCol), lit(""))),
          t => length(t) > 0)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("tok"))
      .limit(k)
    // k rows: the rank window is parameter-bounded (single partition
    // of <= k rows, same contract as Skyline's bucket frame)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("f").desc, col("tok"))
    val pts = toks
      .withColumn("r", row_number().over(w).cast("long"))
      .select(
        round(lit(1e6) * log(col("r").cast("double"))).cast("long").as("x"),
        round(lit(1e6) * log(col("f").cast("double"))).cast("long").as("y"))
    val s = pts.agg(count(lit(1)).as("n_tokens"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    // the normal-equation PRODUCTS move to doubles: n·Σxy overflows
    // longs at k ≈ 10³ (Σxy itself stays an exact long; each double
    // product is one correctly-rounded op, mirrored in the oracle)
    val m = col("n_tokens").cast("double")
    val num = m * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")
    val den = m * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")
    s.select(col("n_tokens"),
      when(den === 0.0, lit(null).cast("long"))
        .otherwise(round(lit(1e9) * num / den).cast("long"))
        .as("slope_nano"))
  }

  /** Pairwise exact shingle-set Jaccard between corpus sources — the
    * "are these two crawls the same content" report. Each source
    * collapses to its DISTINCT n-gram hash set (one aggregate; longs
    * only, text never shuffles); intersections come from one
    * self-equi-join on the hash, sizes from the same frame. Output
    * per unordered source pair (a < b): n_a, n_b, n_common,
    * jaccard_nano. Pair count is |sources|² — a metadata-sized
    * frame; the data-sized work is the one distinct aggregate. */
  def sourceOverlap(docs: DataFrame, sourceCol: String, textCol: String,
                    n: Int): DataFrame = {
    // Parallelism guard: a small-file corpus arrives as ONE input
    // partition, and the shingle transform then runs on one core
    // (measured: 8.8 of the query's 9.2 s at sf0.1). Widening costs
    // one narrow shuffle of (source, text) rows — cheap next to the
    // O(text) shingle work it parallelizes — and is skipped when the
    // input is already wide (a real corpus with many files).
    val base = docs.where(col(sourceCol).isNotNull)
      .select(col(sourceCol).as("src"), col(textCol).as("__t"))
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val wide = if (base.rdd.getNumPartitions < par) base.repartition(par) else base
    // truncate: both self-join sides AND the size aggregate consume
    // this frame — un-materialized, the data-sized shingle distinct
    // ran three times
    val sh = wide
      .select(col("src"), explode(
        graft.functions.TextFunctions.wordShingles(col("__t"), n)).as("g"))
      .select(col("src"), graft.plans.Hash60.hash60(col("g")).as("h"))
      .distinct()
      .transform(Checkpoints.truncate)
    val sizes = sh.groupBy(col("src")).agg(count(lit(1)).as("n_sh"))
    val common = sh.select(col("src").as("a"), col("h"))
      .join(sh.select(col("src").as("b"), col("h")), Seq("h"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("src").as("a"), col("n_sh").as("n_a")), Seq("a"))
      .join(sizes.select(col("src").as("b"), col("n_sh").as("n_b")), Seq("b"))
      .select(col("a"), col("b"), col("n_a"), col("n_b"), col("n_common"),
        round(lit(1e9) * col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .cast("long").as("jaccard_nano"))
  }

  /** Per-document n-gram NOVELTY in arrival order (`idCol` ascending
    * = ingestion order): the fraction of a document's distinct
    * n-grams that no earlier document used. The curation signal
    * between exact dup (novelty 0 for the later copy) and fully
    * fresh (novelty 1): boilerplate-heavy feeds trend toward 0 as
    * the crawl progresses, so the per-source novelty TREND is the
    * "this feed stopped adding information" alarm.
    *
    * One grouped aggregate finds each gram's first-introducing doc
    * (min id — ties resolved by the minimum, so a gram's first
    * appearance is unique by construction), one join back counts how
    * many of a doc's grams it introduced itself. Exact integers;
    * novelty_nano is the single mirrored IEEE division. Shuffles are
    * keyed on the gram then the doc id — both data-sized, no
    * quadratic anything. Distinct STRING grams (not the engine-
    * private 64-bit shingle hashes) so the DuckDB oracle replays
    * bit-for-bit; a production run at corpus scale would swap in
    * [[graft.plans.ShingleHashes]] and shuffle longs instead
    * (collision odds ≈ |grams|²/2⁶⁴ — the NearDup argument).
    *
    * Output: (idCol, n_grams, n_new, novelty_nano); documents with
    * fewer than n tokens carry n_grams = 0 and NULL novelty
    * (undefined, not zero — the A4/A7 null-semantics split). */
  def gramNovelty(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val grams = docs
      .select(col(idCol).as("__id"),
        explode(graft.functions.TextFunctions.wordShingles(col(textCol), n)).as("g"))
    val firstSeen = grams.groupBy(col("g")).agg(min(col("__id")).as("first_id"))
    val perDoc = grams.join(firstSeen, Seq("g"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_id") === col("__id"), 1L).otherwise(0L)).as("n_new"))
    docs.select(col(idCol).as("__id"))
      .join(perDoc, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        when(coalesce(col("n_grams"), lit(0L)) === 0, lit(null).cast("long"))
          .otherwise(round(lit(1e9) * col("n_new").cast("double") /
            col("n_grams").cast("double")).cast("long")).as("novelty_nano"))
  }
}
