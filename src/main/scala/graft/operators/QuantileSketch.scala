package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch over non-negative integer domains —
  * the third leg of the stored-sketch trio (`PortableHll` distincts,
  * `CountMin` frequencies, this one distributions).
  *
  * q_quantiles materializes a per-group sorted array — exact, but
  * the artifact grows with the data and two frames cannot be
  * combined without re-sorting raw values. This sketch stores
  * per-(group, bin) COUNTS over logarithmic value bins: bins add
  * under union (sum — associative, commutative), so per-day sketch
  * rows roll up to any coarser grain, and any quantile is read off
  * the merged counts with bounded RELATIVE error 2^−subBits
  * (~3.1% at subBits=5, ~1.6% at 6) at a fixed size of at most
  * (64 − subBits + 1) · 2^subBits rows per group (~1.9k at 5) —
  * independent of data volume.
  *
  * Binning is the HdrHistogram / DDSketch idea (log-spaced bins →
  * relative-error guarantee; Tene's HdrHistogram, Masson et al.
  * VLDB'19) built from EXACT INTEGER arithmetic only: floor-log2
  * (no IEEE log — natively via `plans.FloorLog2`; any other engine
  * reproduces it as `length(bin(v)) - 1`, the q_surprisal trick),
  * then the top `subBits` mantissa bits below the leading 1:
  *
  *   v < 2^s          → bin = v                      (small values exact)
  *   v ≥ 2^s, b=⌊lg v⌋ → bin = (b−s+1)·2^s + (v≫(b−s) − 2^s)
  *
  * which is monotone in v and CONTINUOUS across the v = 2^s
  * boundary. Bin lower bounds invert exactly; estimates return the
  * lower bound of the bin containing the nearest-rank target
  * (⌈q·N⌉), so every reported value is an integer every engine
  * reproduces bit-for-bit — q_quantile_sketch carries a full exact
  * DuckDB oracle, where GK/t-digest/DDSketch implementations are
  * engine-private.
  *
  * Scale shape: build is one narrow projection + one (group, bin)
  * hash aggregate with map-side partials — the shuffle carries at
  * most the bounded bin set per group per map partition. Rollup
  * shuffles only stored sketch rows. Estimation sorts the BOUNDED
  * per-group bin set (a window over ≤1.9k rows per group), never
  * the data. NULLs are skipped; negatives are rejected loudly
  * (shift a signed domain to offsets at the call site — silently
  * mis-binning them would corrupt quantiles invisibly).
  */
object QuantileSketch {

  /** Per-group log-bin counts of `valueCol` (non-negative integral).
    * Output: groupCols + bin LONG + cnt LONG — the stored artifact;
    * write it at the finest rollup grain. */
  def build(df: DataFrame, groupCols: Seq[String], valueCol: String,
            subBits: Int = 5): DataFrame = {
    require(subBits >= 1 && subBits <= 16, s"subBits must be in [1,16], got $subBits")
    val s = subBits
    val small = 1L << s
    val v0 = col(valueCol).cast("long")
    val v = when(v0 < 0L,
      raise_error(concat(lit(s"QuantileSketch: negative value in $valueCol: "),
        v0.cast("string"))).cast("long"))
      .otherwise(v0)
    // floor-log2 as exact integers — native LZCNT expression; the
    // DuckDB oracle uses the equivalent length(bin(v)) - 1 string
    // form (identical values, q_surprisal's cross-engine trick)
    val b = graft.plans.FloorLog2.floorLog2(col("__v"))
    val binId = when(col("__v") < small, col("__v"))
      .otherwise((col("__b") - lit(s - 1)) * small +
        (expr(s"shiftright(__v, cast(__b as int) - $s)") - small))
    df.where(col(valueCol).isNotNull)
      .select((groupCols.map(col) :+ v.as("__v")): _*)
      .withColumn("__b", b)
      .withColumn("bin", binId)
      .groupBy((groupCols.map(col) :+ col("bin")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Sum-merge stored sketches to a coarser grain — touches only
    * sketch rows. rollup(build(daily)) ≡ build(union) exactly. */
  def rollup(sketch: DataFrame, groupCols: Seq[String]): DataFrame =
    sketch.groupBy((groupCols.map(col) :+ col("bin")): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Exact lower bound of a bin id — the reported estimate value. */
  private def lowerBound(bin: Column, subBits: Int): Column = {
    val small = 1L << subBits
    when(bin < small, bin)
      .otherwise(expr(s"shiftleft((bin % $small) + $small, cast(bin div $small as int) - 1)"))
  }

  /** Quantile estimates per group from (possibly rolled-up) sketch
    * rows: for each q, the lower bound of the bin holding the
    * nearest-rank target ⌈q·N⌉. Output: groupCols + q DOUBLE +
    * est LONG (within 2^−subBits relative of the exact nearest-rank
    * value, from below). */
  def estimate(sketch: DataFrame, groupCols: Seq[String], qs: Seq[Double],
               subBits: Int = 5): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got $qs")
    val parts = if (groupCols.nonEmpty) groupCols.map(col) else Seq(lit(0))
    val ord = Window.partitionBy(parts: _*).orderBy(col("bin"))
    val all = Window.partitionBy(parts: _*)
    val cum = sketch
      .withColumn("__cum", sum(col("cnt")).over(ord))
      .withColumn("__n", sum(col("cnt")).over(all))
    val target = greatest(ceil(col("q") * col("__n")).cast("long"), lit(1L))
    cum.withColumn("q", explode(typedLit(qs)))
      .where(col("__cum") >= target && (col("__cum") - col("cnt")) < target)
      .select((groupCols.map(col) :+ col("q") :+
        lowerBound(col("bin"), subBits).as("est")): _*)
  }
}
