package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Categorical association profiling: pointwise mutual information
  * cells and their MI contributions between two columns — the
  * dependence measure a curation pipeline reads before trusting a
  * stratification ("is `source` just a proxy for `lang`?") or after
  * a mixture rebalance ("did sampling decouple domain from split?").
  * The reference's profiling stops at per-column distinct counts
  * (`dags/spark/transform_raw_weather.py` recap aggregates); this is
  * the two-column extension.
  *
  * MI(X;Y) = Σ_xy (c_xy/N)·ln(c_xy·N / (n_x·n_y)); each cell's
  * contribution is also its count-weighted PMI. Determinism follows
  * the `Drift.psi` contract exactly: one double expression over
  * EXACT integer counts, rounded to integer nano-units per cell —
  * a sum of pre-rounded longs is order-free, so the total is
  * bit-identical across partitionings, and ln() follows the
  * q_surprisal/q_bm25 cross-engine precedent. Products are computed
  * in doubles (c·N as integers would overflow at 100 TB row counts;
  * each double product is one correctly-rounded operation, mirrored
  * verbatim in the oracle's expression tree).
  *
  * Scale shape: ONE data-sized aggregate (the (x, y) cell counts);
  * marginals and the total fold from the CELL frame, which is
  * |X|·|Y|-bounded — categorical profiling's own contract. Two
  * cell-frame joins on x and y, one 1-row broadcast total.
  *
  * Output: xCol, yCol, n_xy BIGINT, mi_nano BIGINT (the cell's MI
  * contribution × 10⁹; Σ mi_nano / 10⁹ = MI in nats). NULL in
  * either column is excluded — NULL is missingness, not a category;
  * encode an explicit "unknown" level upstream to count it.
  */
object Association {

  /** Rolling Pearson correlation between two exact-integer daily
    * series over a trailing window of `windowRows` rows — the
    * co-movement monitor ("do clicks still predict purchases this
    * week?"). All six moment sums are window sums of exact integers
    * (order-free); r is ONE mirrored double tree per row, NULL when
    * either variance is zero in the window. The window runs over
    * the per-key frame (one row per key — the histogram contract:
    * bounded by distinct keys, never by events). Product sums bound
    * ≈ 2⁶² for cent-scale daily volumes; DECIMAL past that.
    *
    * Output per key: keyCol, n_rows (window population), r_nano. */
  def rollingCorrelation(df: DataFrame, keyCol: String, xCol: String,
                         yCol: String, windowRows: Int): DataFrame = {
    require(windowRows >= 2, s"rollingCorrelation: windowRows must be >= 2, got $windowRows")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(keyCol))
      .rowsBetween(-(windowRows - 1), 0)
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val base = df.select(col(keyCol), x.as("__x"), y.as("__y"))
      .withColumn("n_rows", count(lit(1)).over(w))
      .withColumn("__sx", sum(col("__x")).over(w))
      .withColumn("__sy", sum(col("__y")).over(w))
      .withColumn("__sxy", sum(col("__x") * col("__y")).over(w))
      .withColumn("__sxx", sum(col("__x") * col("__x")).over(w))
      .withColumn("__syy", sum(col("__y") * col("__y")).over(w))
    def d(c: String) = col(c).cast("double")
    val n = d("n_rows")
    val cov = n * d("__sxy") - d("__sx") * d("__sy")
    val vx = n * d("__sxx") - d("__sx") * d("__sx")
    val vy = n * d("__syy") - d("__sy") * d("__sy")
    base.select(col(keyCol), col("n_rows"),
      when(vx === 0.0 || vy === 0.0, lit(null).cast("long"))
        .otherwise(round(lit(1e9) * cov / sqrt(vx * vy)).cast("long"))
        .as("r_nano"))
  }

  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol), col(yCol))
      .agg(count(lit(1)).as("n_xy"))
    val nx = cells.groupBy(col(xCol)).agg(sum(col("n_xy")).as("__nx"))
    val ny = cells.groupBy(col(yCol)).agg(sum(col("n_xy")).as("__ny"))
    val total = cells.agg(sum(col("n_xy")).as("__n"))
    val c = col("n_xy").cast("double")
    val n = col("__n").cast("double")
    cells
      .join(nx, Seq(xCol))
      .join(ny, Seq(yCol))
      .crossJoin(broadcast(total))
      .select(col(xCol), col(yCol), col("n_xy"),
        round(lit(1e9) * (c / n) *
          log((c * n) / (col("__nx").cast("double") * col("__ny").cast("double"))))
          .cast("long").as("mi_nano"))
  }
}
