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
  * side has never seen). Consumers compute PSI/χ² from the exact
  * counts; the divergence formulas themselves involve ln/division
  * whose cross-engine reproducibility is the caller's choice of
  * tolerance, so this operator hands over exact integers and stops.
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
}
