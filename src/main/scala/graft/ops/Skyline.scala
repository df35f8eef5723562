package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto frontier ("skyline") operator: the points not dominated by
  * any other point when maximizing two metrics at once — the classic
  * multi-criteria OLAP query (Börzsönyi, Kossmann & Stocker, "The
  * Skyline Operator", ICDE 2001). The reference's analytics surface
  * (`dags/spark/transform_raw_weather.py` min/max recaps) stops at
  * per-group extremes; the skyline is the cross-metric extension a
  * curation pipeline uses to pick, e.g., documents on the
  * quality-vs-length frontier instead of thresholding each axis
  * independently.
  *
  * Domination (maximize both): q dominates p iff q.x >= p.x and
  * q.y >= p.y with at least one strict. To minimize an axis, negate
  * the column at the call site.
  *
  * Scale shape — the textbook sort-scan made distributed without a
  * global single-task window:
  *  1. per-x max(y) hash aggregate (same-x dominated points die
  *     here; output is one row per distinct x);
  *  2. order-preserving range buckets on x from sampled cuts (the
  *     `Ids.globalRowNumber` construction: bucket = #cuts strictly
  *     below x, a pure function of the value, monotone in x — any
  *     point in a later bucket has STRICTLY greater x);
  *  3. per-bucket max(y) → an O(buckets)-row frame; the suffix max
  *     over later buckets is a window on THAT frame only (single
  *     partition of <= `buckets` rows — bounded by a parameter, not
  *     by data), broadcast-joined back;
  *  4. within each bucket, a running max(y) over larger-x rows — a
  *     window PARTITIONED by bucket, so every data-sized sort is
  *     per-bucket parallel.
  * A point survives iff its y strictly exceeds both the later-bucket
  * suffix max and the within-bucket running max. Comparisons only —
  * no arithmetic on the metric columns — so doubles and exact longs
  * are both bit-reproducible across engines and partitionings.
  */
object Skyline {

  /** Distinct frontier (x, y) pairs, maximizing both columns. NULL
    * in either metric never reaches the frontier (a point with an
    * unknown coordinate cannot be shown undominated; rows are
    * filtered, not errored, matching aggregate null-skipping).
    *
    * @param buckets parallelism of step 4 and the size bound of the
    *                step-3 frame; thousands at 100 TB.
    */
  def frontier2D(df: DataFrame, xCol: String, yCol: String,
                 buckets: Int = 64): DataFrame = {
    require(buckets > 0, "frontier2D: buckets must be positive")
    // persist the reduced frame: the quantile-cut sampling pass and
    // the main flow both consume it, and without a cache the per-x
    // aggregate (the expensive data-sized step) runs twice
    val m = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol)).agg(max(col(yCol)).as(yCol))
      .persist()

    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    val cuts =
      if (probes.isEmpty) Seq.empty[Double]
      else m.stat.approxQuantile(xCol, probes, 0.001).toSeq.distinct.sorted
    val bucket: Column =
      if (cuts.isEmpty) lit(0)
      else aggregate(
        array(cuts.map(lit): _*),
        lit(0),
        (acc, c) => acc + when(col(xCol).cast("double") > c, 1).otherwise(0))
    val withB = m.withColumn("__xb", bucket)

    // step 3: suffix max over STRICTLY-later buckets, computed on the
    // <= buckets-row per-bucket-max frame (the one single-partition
    // window, bounded by the parameter), broadcast back.
    val wSuffix = Window.orderBy(col("__xb").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val later = withB.groupBy(col("__xb"))
      .agg(max(col(yCol)).as("__bmax"))
      .withColumn("__later", max(col("__bmax")).over(wSuffix))
      .drop("__bmax")

    // step 4: per-bucket running max over larger-x rows (x is unique
    // after step 1, so the within-bucket order is total).
    val wRun = Window.partitionBy(col("__xb")).orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    withB.join(broadcast(later), Seq("__xb"))
      .withColumn("__run", max(col(yCol)).over(wRun))
      .where((col("__later").isNull || col(yCol) > col("__later")) &&
        (col("__run").isNull || col(yCol) > col("__run")))
      .select(col(xCol), col(yCol))
  }
}
