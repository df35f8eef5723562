package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between two samples — the
  * monitoring layer of a training-data pipeline (did this week's
  * crawl shift against last week's? does the holdout still match
  * the train split?).
  *
  * [[ksStatistic]] is the two-sample Kolmogorov-Smirnov statistic
  * computed EXACTLY: D = max over values of |F̂_a(v) − F̂_b(v)| =
  * max |ca·N_b − cb·N_a| / (N_a·N_b), where ca/cb are cumulative
  * counts. The numerator is pure integer arithmetic (cross-
  * multiplication instead of two divisions), so the statistic is
  * bit-identical in any engine — the usual floating-point ECDF
  * comparison is not even deterministic across partitionings.
  *
  * Plan shape: one tagged union + one groupBy(value) shuffle
  * produces the per-value HISTOGRAM (n_a, n_b per distinct value);
  * the cumulative pass then runs over that histogram, not the rows —
  * a single-partition window, but over a frame bounded by the
  * DISTINCT-VALUE count (cents of a bounded metric: thousands), not
  * the corpus. That is the honest scale story: KS needs a global
  * order; confining it to the value histogram is what makes it
  * runnable at 100 TB. For unbounded-cardinality values, quantile-
  * sketch both sides instead (`operators.QuantileSketch`) and
  * compare sketches — stated, not hidden.
  *
  * [[histogramCompare]] is the bucketed companion (PSI-style
  * inputs): equi-width bucket counts for both sides, ZERO-FILLED on
  * whichever side lacks a bucket — the edge every naive histogram
  * join silently drops, and exactly where drift hides (a bucket one
  * side has never seen). Consumers compute χ² etc. from the exact
  * counts.
  *
  * [[psi]] computes the Population Stability Index on top of those
  * counts without giving up determinism: each bucket's contribution
  * (p_a − p_b)·ln(p_a/p_b) is ONE double expression over exact
  * integers, rounded to integer NANO-UNITS per row — and a sum of
  * already-rounded longs is order-free, so the total (unlike a
  * float sum of raw contributions) is bit-identical across
  * partitionings and engines. ln() itself follows the q_surprisal/
  * q_bm25 precedent (empirically identical across engines on these
  * values). Zero-count buckets — where textbook PSI is undefined —
  * get Laplace smoothing with exact rationals: p = (n+1)/(N+B) over
  * the B buckets either side has seen.
  */
object Drift {

  /** Exact two-sample KS. Output: ONE row —
    * (ks_num, n_a, n_b, ks) with ks = ks_num/(n_a·n_b) as the single
    * IEEE division. NULL values are excluded (an ECDF has no place
    * for them); either side empty fails loud (the statistic is
    * undefined, and a silent 0 would read as "no drift"). */
  def ksStatistic(a: DataFrame, b: DataFrame, valCol: String): DataFrame = {
    val av = a.select(col(valCol).cast("long").as("v")).where(col("v").isNotNull)
      .withColumn("__a", lit(1L)).withColumn("__b", lit(0L))
    val bv = b.select(col(valCol).cast("long").as("v")).where(col("v").isNotNull)
      .withColumn("__a", lit(0L)).withColumn("__b", lit(1L))
    val hist = av.unionByName(bv)
      .groupBy(col("v"))
      .agg(sum(col("__a")).as("na_v"), sum(col("__b")).as("nb_v"))
    // cumulative pass over the distinct-value histogram (bounded by
    // value cardinality — see scaladoc); values are distinct after
    // the groupBy so ROWS vs RANGE framing cannot differ
    val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("ca", sum(col("na_v")).over(w))
      .withColumn("cb", sum(col("nb_v")).over(w))
    // totals are a ONE-row scalar frame, broadcast back over the
    // histogram (the adcTopK broadcast-scalar pattern); empty sides
    // fail loud — a silent ks=0 would read as "no drift"
    val totals = cum.agg(max(col("ca")).as("__na"), max(col("cb")).as("__nb"))
      .select(
        when(col("__na").isNull || col("__na") === 0 || col("__nb").isNull || col("__nb") === 0,
          raise_error(lit("Drift.ksStatistic: a side has no non-NULL values — " +
            "the statistic is undefined")).cast("long"))
          .otherwise(col("__na")).as("n_a"),
        col("__nb").as("n_b"))
    cum.crossJoin(broadcast(totals))
      .agg(max(abs(col("ca") * col("n_b") - col("cb") * col("n_a"))).as("ks_num"),
        max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
      .withColumn("ks",
        col("ks_num").cast("double") / (col("n_a") * col("n_b")).cast("double"))
  }

  /** Equi-width bucket counts of both sides, zero-filled: one row
    * per bucket seen by EITHER side — (bucket, n_a, n_b). Bucket =
    * floor(value / width). */
  def histogramCompare(a: DataFrame, b: DataFrame, valCol: String, width: Long): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    def side(df: DataFrame, an: Long, bn: Long) =
      df.select(floor(col(valCol).cast("long") / width).as("bucket"))
        .where(col("bucket").isNotNull)
        .withColumn("__a", lit(an)).withColumn("__b", lit(bn))
    side(a, 1L, 0L).unionByName(side(b, 0L, 1L))
      .groupBy(col("bucket"))
      .agg(sum(col("__a")).as("n_a"), sum(col("__b")).as("n_b"))
  }

  /** PSI per bucket, in integer nano-units. Output: (bucket, n_a,
    * n_b, psi_e9) — one row per bucket either side has seen;
    * PSI(total) = SUM(psi_e9)/1e9, exact because the summands are
    * already-rounded longs (interpretation: <0.1 stable, 0.1-0.25
    * moderate shift, >0.25 major shift). Laplace-smoothed shares
    * p = (n+1)/(N+B) keep one-sided buckets finite; B rides a 1-row
    * broadcast with the totals (the ksStatistic scalar pattern).
    * Either side empty fails loud — smoothing would silently score
    * "uniform noise vs data" as a real comparison. */
  def psi(a: DataFrame, b: DataFrame, valCol: String, width: Long): DataFrame = {
    val hist = histogramCompare(a, b, valCol, width)
    val totals = hist
      .agg(sum(col("n_a")).as("__ta"), sum(col("n_b")).as("__tb"),
        count(lit(1)).as("__nb"))
      .select(
        when(col("__ta").isNull || col("__ta") === 0 || col("__tb").isNull || col("__tb") === 0,
          raise_error(lit("Drift.psi: a side has no bucketable values — " +
            "PSI against an empty side is undefined")).cast("long"))
          .otherwise(col("__ta")).as("__ta"),
        col("__tb"), col("__nb"))
    // exact-integer numerators/denominators; the ONLY doubles are the
    // two correctly-rounded divisions, one subtraction, one ln, one
    // multiply — the identical expression shape the oracle replays
    val an = col("n_a") + lit(1L)
    val bn = col("n_b") + lit(1L)
    val ad = col("__ta") + col("__nb")
    val bd = col("__tb") + col("__nb")
    hist.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_a"), col("n_b"),
        round(
          (an.cast("double") / ad.cast("double") - bn.cast("double") / bd.cast("double")) *
            log((an.cast("double") * bd.cast("double")) / (ad.cast("double") * bn.cast("double"))) *
            lit(1.0e9)).cast("long").as("psi_e9"))
  }

  /** Jensen-Shannon divergence per bucket, in integer nano-units —
    * the SYMMETRIC, always-finite drift score that complements
    * [[psi]] (whose asymmetric log-ratio terms blow up on one-sided
    * buckets and need Laplace smoothing to stay finite; JSD is
    * bounded by ln 2 by construction). Same equi-width histogram
    * front ([[histogramCompare]]), same smoothing so the two scores
    * are computed over the identical share vectors:
    *
    *   jsd_e9 = round(1e9 · ½·(p·ln(2p/(p+q)) + q·ln(2q/(p+q))))
    *
    * p, q are the two correctly-rounded divisions of exact integer
    * counts; each bucket term is one mirrored IEEE tree, nano-rounded
    * then summed order-free (JSD(total) = SUM(jsd_e9)/1e9 against
    * the ln 2 ≈ 0.693 ceiling). Either side empty fails loud, the
    * psi contract. Output: (bucket, n_a, n_b, jsd_e9). */
  def jsd(a: DataFrame, b: DataFrame, valCol: String, width: Long): DataFrame = {
    val hist = histogramCompare(a, b, valCol, width)
    val totals = hist
      .agg(sum(col("n_a")).as("__ta"), sum(col("n_b")).as("__tb"),
        count(lit(1)).as("__nb"))
      .select(
        when(col("__ta").isNull || col("__ta") === 0 || col("__tb").isNull || col("__tb") === 0,
          raise_error(lit("Drift.jsd: a side has no bucketable values — " +
            "JSD against an empty side is undefined")).cast("long"))
          .otherwise(col("__ta")).as("__ta"),
        col("__tb"), col("__nb"))
    val p = (col("n_a") + lit(1L)).cast("double") / (col("__ta") + col("__nb")).cast("double")
    val q = (col("n_b") + lit(1L)).cast("double") / (col("__tb") + col("__nb")).cast("double")
    hist.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_a"), col("n_b"),
        round(lit(0.5e9) *
          (p * log(lit(2.0) * p / (p + q)) + q * log(lit(2.0) * q / (p + q))))
          .cast("long").as("jsd_e9"))
  }

  /** Benford first-digit audit — the fabricated-numbers detector:
    * naturally-grown magnitudes (prices, populations, file sizes)
    * put digit d first with probability log10(1 + 1/d), while
    * invented or uniformly-synthesized figures do not. The audit the
    * reference's recap tables never get but a 100 TB ingest should:
    * a source whose amounts suddenly stop being Benford changed its
    * generator, not its weather.
    *
    * Exactness: the first significant digit comes from the DECIMAL
    * STRING head — not from floor(log10(v)), whose float rounding
    * misassigns values near powers of ten. Counts are exact
    * integers; observed share and the Benford reference are each one
    * nano-rounded expression, and the deviation is an integer
    * difference of those two longs — fully order-free.
    *
    * Output per digit 1-9 (zero-filled — a MISSING digit is the
    * loudest deviation): n, share_nano, benford_nano, dev_nano.
    * Only values > 0 have a first significant digit; others are
    * excluded (count them upstream if zero-inflation matters).
    * Scale: one data-sized hash aggregate onto <= 9 rows.
    */
  def benford(df: DataFrame, valCol: String): DataFrame = {
    val v = col(valCol).cast("long")
    val digits = df.where(v > 0)
      .select(substring(v.cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val spine = df.sparkSession.range(1, 10).select(col("id").as("digit"))
    val filled = spine.join(digits, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"))
    val total = filled.agg(sum(col("n")).as("__nt"))
    filled.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        round(lit(1e9) * col("n").cast("double") / col("__nt").cast("double"))
          .cast("long").as("share_nano"),
        round(lit(1e9) * log10((col("digit").cast("double") + 1.0) / col("digit").cast("double")))
          .cast("long").as("benford_nano"))
      .withColumn("dev_nano", abs(col("share_nano") - col("benford_nano")))
  }
}
