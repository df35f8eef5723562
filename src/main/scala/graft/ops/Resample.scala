package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling of irregular time series with linear
  * interpolation — the step past `Recap.hourly`'s null-filled grid:
  * instead of reporting a slot empty, estimate the value between its
  * neighboring observations (sensor/telemetry practice; the weather
  * pipeline's hourly grid is the constant-only special case).
  *
  * Semantics per key and grid instant t:
  *  - both neighbors exist (prev obs at tb ≤ t, next obs at ta ≥ t):
  *    value = vb + ((va − vb) · (t − tb)) / (ta − tb), the exact
  *    IEEE evaluation of that parse tree — every operand an
  *    integer-exact double, ONE rounding step (the division), so any
  *    engine reproduces it bit-for-bit;
  *  - an observation exactly at t: its value verbatim (also the
  *    tb = ta case, which the formula cannot divide through);
  *  - t before the key's first or after its last observation: NULL —
  *    extrapolation invents data, callers who want clamping can
  *    coalesce with the boundary value themselves.
  *
  * Plan shape: the observations and the exploded grid are unioned
  * and sorted ONCE per key (one shuffle); the prev/next neighbor for
  * every grid point comes from two running `last(_, ignoreNulls)`
  * window passes over that order (the asOfJoin trick, both
  * directions) — linear, no per-grid-point probe join, no range
  * join. At 100 TB the cost is the one key shuffle of |obs| +
  * |keys|·|grid| rows.
  *
  * Contract: (key, ts) must be unique in the observations (two
  * values at one instant make the neighbor value ambiguous) —
  * enforced with a loud raise inside the same window pass, the
  * asOfJoin duplicate-guard policy. NULL values/timestamps are
  * rejected the same way.
  */
object Resample {

  /** @param keys        series identity columns
    * @param tsCol       observation timestamp (second precision used)
    * @param valCol      numeric value (pass exact cents for the
    *                    bit-reproducibility contract)
    * @param startEpoch  first grid instant, unix seconds (inclusive)
    * @param endEpoch    last grid instant, unix seconds (inclusive)
    * @param stepSeconds grid spacing
    * @return one row per key × grid instant: keys, `grid_ts`
    *         (timestamp), `value` (double, NULL outside the key's
    *         observed range) */
  def interpolate(df: DataFrame, keys: Seq[String], tsCol: String, valCol: String,
                  startEpoch: Long, endEpoch: Long, stepSeconds: Int): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(stepSeconds > 0 && endEpoch >= startEpoch,
      s"need stepSeconds>0, endEpoch>=startEpoch; got step=$stepSeconds [$startEpoch, $endEpoch]")
    val kCols = keys.map(col)
    val obs = df.select(kCols :+ unix_timestamp(col(tsCol)).as("__t") :+
        col(valCol).cast("double").as("__v"): _*)
      .withColumn("__v", when(col("__v").isNull || col("__t").isNull,
        raise_error(lit(s"Resample: NULL $tsCol/$valCol observation — filter first"))
          .cast("double")).otherwise(col("__v")))
      .withColumn("__side", lit(0))
    val grid = df.select(kCols: _*).distinct()
      .withColumn("__t", explode(sequence(lit(startEpoch), lit(endEpoch),
        lit(stepSeconds.toLong))))
      .withColumn("__v", lit(null).cast("double"))
      .withColumn("__side", lit(1))
    val all = obs.unionByName(grid)
    // duplicate-observation guard rides the same partitioning
    val dupW = Window.partitionBy(kCols :+ col("__t"): _*)
    val guarded = all.withColumn("__nobs",
        sum(when(col("__side") === 0, 1).otherwise(0)).over(dupW))
      .withColumn("__v",
        when(col("__nobs") > 1, raise_error(concat(
          lit("Resample: duplicate observation at epoch "), col("__t").cast("string"),
          lit(" — (key, ts) must be unique"))).cast("double"))
          .otherwise(col("__v")))
    // prev: obs at-or-before t (obs sorts before the grid row at equal t)
    val fwd = Window.partitionBy(kCols: _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // next: obs at-or-after t (same-instant obs already seen in the
    // descending order because side asc puts it first)
    val bwd = Window.partitionBy(kCols: _*)
      .orderBy(col("__t").desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ob = when(col("__side") === 0, struct(col("__t").as("t"), col("__v").as("v")))
    val out = guarded
      .withColumn("__prev", last(ob, ignoreNulls = true).over(fwd))
      .withColumn("__next", last(ob, ignoreNulls = true).over(bwd))
      .where(col("__side") === 1)
    val tb = col("__prev.t"); val vb = col("__prev.v")
    val ta = col("__next.t"); val va = col("__next.v")
    val t = col("__t")
    val lerp = when(col("__prev").isNull || col("__next").isNull, lit(null).cast("double"))
      .when(tb === ta, vb)
      .otherwise(vb + ((va - vb) * (t - tb).cast("double")) / (ta - tb).cast("double"))
    out.select(kCols :+ timestamp_seconds(col("__t")).as("grid_ts") :+
      lerp.as("value"): _*)
  }

  /** Time-weighted average over a window [start, end): each
    * observation's value holds until the next one (step function /
    * last-observation-carried-forward — the market-data TWAP and the
    * sensor-uptime convention), weighted by how long it held inside
    * the window. The observation in force AT `start` is the last one
    * at-or-before it, so values carry INTO the window; time before
    * the key's first observation is UNCOVERED — excluded from both
    * numerator and denominator, with `covered_seconds` reported so
    * the caller can judge (a 10-second-covered "average" over an
    * hour window is a data-quality smell, not a statistic). A key
    * with no observation before the window's end has no coverage and
    * is ABSENT from the output (left-join a key dimension for NULL
    * rows).
    *
    * Exactness: weights are whole seconds, values integer (pass
    * cents); the numerator Σ vᵢ·lenᵢ and denominator Σ lenᵢ are
    * exact longs and the single IEEE division makes the result
    * bit-identical cross-engine. Plan: one shuffle on the key, one
    * window `lead` pass, one aggregate — linear, no grid explode at
    * all (contrast [[interpolate]], which pays |keys|·|grid|). */
  def timeWeightedAvg(df: DataFrame, keys: Seq[String], tsCol: String, valCol: String,
                      startEpoch: Long, endEpoch: Long): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(endEpoch > startEpoch, s"need endEpoch > startEpoch; got [$startEpoch, $endEpoch)")
    val kCols = keys.map(col)
    val obs = df.select(kCols :+ unix_timestamp(col(tsCol)).as("__t") :+
        col(valCol).cast("long").as("__v"): _*)
      .withColumn("__v", when(col("__v").isNull || col("__t").isNull,
        raise_error(lit(s"Resample: NULL $tsCol/$valCol observation — filter first"))
          .cast("long")).otherwise(col("__v")))
      // observations past the window can never hold time inside it;
      // dropping them early also caps the lead() state
      .where(col("__t") < endEpoch)
    val w = Window.partitionBy(kCols: _*).orderBy(col("__t").asc)
    // duplicate instants make "the value in force" ambiguous — same
    // loud contract as interpolate
    val dupGuard = when(count(lit(1)).over(
        Window.partitionBy(kCols :+ col("__t"): _*)) > 1,
      raise_error(concat(lit("Resample: duplicate observation at epoch "),
        col("__t").cast("string"), lit(" — (key, ts) must be unique"))).cast("long"))
    val seg = obs
      .withColumn("__v", coalesce(dupGuard, col("__v")))
      .withColumn("__next", coalesce(lead(col("__t"), 1).over(w), lit(endEpoch)))
      // clamp the held interval to the window; pre-window holds clamp
      // to zero-or-positive length via greatest
      .withColumn("__from", greatest(col("__t"), lit(startEpoch)))
      .withColumn("__to", least(col("__next"), lit(endEpoch)))
      .withColumn("__len", greatest(col("__to") - col("__from"), lit(0L)))
    seg.groupBy(kCols: _*)
      .agg(sum(col("__v") * col("__len")).as("__num"),
        sum(col("__len")).as("__den"))
      .select(kCols :+
        (when(col("__den") > 0, col("__num").cast("double") / col("__den").cast("double"))
          .otherwise(lit(null).cast("double"))).as("twap") :+
        coalesce(col("__den"), lit(0L)).as("covered_seconds"): _*)
  }

  /** OHLC (candlestick) downsampling — per (keys, bucket): the
    * opening value (earliest in the bucket), high, low, closing
    * value (latest), and observation count. The standard "resample
    * to bars" operation for any tick/sensor/metric series, and the
    * lossy-but-shape-preserving layout dashboards read instead of
    * raw ticks.
    *
    * Two hash aggregates, both map-side-combining: a per-instant
    * pass that is ALSO the duplicate guard (duplicate instants per
    * key make open/close ambiguous, so they raise rather than pick
    * one silently — the [[timeWeightedAvg]] contract), then the
    * bucket roll, whose open/close are `min_by`/`max_by` on the
    * instant. Values are exact integers (cents); no window, no
    * sort — the aggregate state is five longs per (key, bucket).
    *
    * Output: keys ++ (bucket_start TIMESTAMP, open, high, low,
    * close, n_obs). */
  def ohlc(df: DataFrame, keys: Seq[String], tsCol: String, valCol: String,
           bucketSeconds: Long): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    val kCols = keys.map(col)
    val obs = df.select(kCols :+ unix_timestamp(col(tsCol)).as("__t") :+
        col(valCol).cast("long").as("__v"): _*)
      .withColumn("__v", when(col("__v").isNull || col("__t").isNull,
        raise_error(lit(s"Resample: NULL $tsCol/$valCol observation — filter first"))
          .cast("long")).otherwise(col("__v")))
    obs
      .groupBy(kCols :+ col("__t"): _*)
      .agg(count(lit(1)).as("__n"), max(col("__v")).as("__v"))
      .withColumn("__v", when(col("__n") > 1,
        raise_error(concat(lit("Resample: duplicate observation at epoch "),
          col("__t").cast("string"), lit(" — (key, ts) must be unique"))).cast("long"))
        .otherwise(col("__v")))
      .withColumn("__bucket", (col("__t") - pmod(col("__t"), lit(bucketSeconds))))
      .groupBy(kCols :+ col("__bucket"): _*)
      .agg(
        min_by(col("__v"), col("__t")).as("open"),
        max(col("__v")).as("high"),
        min(col("__v")).as("low"),
        max_by(col("__v"), col("__t")).as("close"),
        count(lit(1)).as("n_obs"))
      .select(kCols ++ Seq(timestamp_seconds(col("__bucket")).as("bucket_start"),
        col("open"), col("high"), col("low"), col("close"), col("n_obs")): _*)
  }
}
