package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sample autocorrelation function (ACF) over an ordered integer
  * series — the time-series diagnostic that tells a pipeline whether
  * a daily metric is mean-reverting noise, trending, or seasonal
  * (lag-7 spikes), and feeds window sizing for the EWMA/Holt/CUSUM
  * family in [[Smoothing]].
  *
  * Exactness: for the mean-centered ACF
  *
  *   r_l = Σ_{t≤n−l} (x_t−μ)(x_{t+l}−μ) / Σ_t (x_t−μ)²,   μ = S/n
  *
  * multiplying numerator by n² and denominator by n clears the
  * rational mean EXACTLY:
  *
  *   r_l = (n²·C_l − n·S·(Sh_l+St_l) + (n−l)·S²) / (n·(n·Q − S²))
  *
  * with C_l = Σ x_t·x_{t+l}, Sh/St the head/tail partial sums, S = Σx,
  * Q = Σx² — ALL exact integer aggregates, order-free. The only IEEE
  * step is the final division of two exact longs, nano-rounded — the
  * mirrored-single-tree contract every oracle in this repo uses.
  *
  * Overflow is guarded LOUDLY, inside a consumed column (the pruned-
  * guard lesson): every term is bounded by 2·n²·Q (|C_l| ≤ Q by
  * Cauchy-Schwarz, S² ≤ n·Q), so n²·Q ≤ Long.Max/4 is required —
  * rescale units (cents → dollars) when it trips.
  *
  * Scale: the series is expected PRE-AGGREGATED (daily/hourly rollups
  * — model-sized), which is the shape ACF is meaningful on; the lead
  * window is one task over that small frame and `maxN` fails loud
  * before a raw-event-sized series reaches it. The heavy lifting
  * (the rollup) happens upstream at full parallelism.
  */
object Autocorr {

  /** ACF at lags 1..maxLag. Output: (lag, n_pairs, acf_nano), one row
    * per lag. `orderCol` must totally order the series (duplicates
    * raise); NULL values raise (a NULL would silently shrink n and
    * shift every lag pairing). */
  def acf(df: DataFrame, orderCol: String, valCol: String, maxLag: Int,
          maxN: Long = 1000000L): DataFrame = {
    require(maxLag >= 1, s"acf: maxLag must be >= 1, got $maxLag")
    require(maxN > maxLag, s"acf: maxN must exceed maxLag, got $maxN")
    // guards ride inside the consumed x column
    val xGuard: Column =
      when(col(valCol).isNull, raise_error(concat(
        lit("acf: NULL value at "), col(orderCol).cast("string"),
        lit(" — a NULL shifts every lag pairing; aggregate or impute upstream"))))
      .when(count(lit(1)).over(Window.partitionBy(col(orderCol))) > 1,
        raise_error(concat(lit("acf: duplicate order key "),
          col(orderCol).cast("string"), lit(" — the series must be totally ordered"))))
      .otherwise(col(valCol)).cast("long")
    val s = df.select(col(orderCol).as("__o"), xGuard.as("x"))
      .withColumn("rn", row_number().over(Window.orderBy(col("__o"))).cast("long"))
    // totals as a 1-row broadcast (the ksStatistic scalar pattern);
    // the size and overflow guards live inside the consumed n column
    val totals = s.agg(count(lit(1)).as("__n"), sum(col("x")).as("S"),
        sum(col("x") * col("x")).as("Q"))
      .select(
        when(col("__n") > maxN, raise_error(concat(
          lit(s"acf: series has "), col("__n").cast("string"),
          lit(s" points > maxN=$maxN — ACF wants a pre-aggregated series; roll up first"))))
        .when(col("__n").cast("double") * col("__n").cast("double") *
            col("Q").cast("double") > lit(Long.MaxValue.toDouble / 4.0),
          raise_error(lit("acf: n²·Σx² would overflow the exact integer moments — " +
            "rescale the value units (e.g. cents → dollars)")))
        .otherwise(col("__n")).as("n"),
        col("S"), col("Q"))
    // each row fans out to its (row, lag) pairings — narrow explode,
    // no cross join; the self-join on rn+lag mirrors the SQL replica
    val heads = s.withColumn("lag", explode(sequence(lit(1), lit(maxLag))))
      .select(col("lag"), col("rn"), col("x").as("xh"))
    val tails = s.select(col("rn").as("rn2"), col("x").as("xt"))
    val perLag = heads.join(tails, heads("rn") + heads("lag") === tails("rn2"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("xh") * col("xt")).as("C"),
        sum(col("xh")).as("Sh"),
        sum(col("xt")).as("St"))
    perLag.crossJoin(broadcast(totals))
      .select(col("lag").cast("long").as("lag"), col("n_pairs"),
        // zero-variance series: ACF is UNDEFINED (0/0) — NULL, not a
        // NaN that would blow up the long cast under ANSI mode
        when(col("n") * col("Q") - col("S") * col("S") === 0, lit(null).cast("long"))
          .otherwise(round(lit(1.0e9) *
            (col("n") * col("n") * col("C") - col("n") * col("S") * (col("Sh") + col("St")) +
              (col("n") - col("lag")) * col("S") * col("S")).cast("double") /
            (col("n") * (col("n") * col("Q") - col("S") * col("S"))).cast("double"))
            .cast("long")).as("acf_nano"))
  }
}
