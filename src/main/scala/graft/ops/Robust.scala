package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust trend estimation — the Theil-Sen estimator (Theil 1950,
  * Sen 1968): the median of all pairwise slopes, with intercept the
  * median of the per-point residual offsets. Up to ~29% of points
  * can be arbitrary outliers before the estimate moves (breakdown
  * point 1 − 1/√2), which is what a daily ops metric with occasional
  * backfill garbage actually needs — OLS has breakdown 0.
  *
  * Exactness: each pairwise slope is ONE correctly-rounded IEEE
  * division of two exact integers (Δx/Δt). The median SELECTS values
  * (ties in double space are interchangeable for selection, so the
  * deterministic tiebreak key affects row identity, never the chosen
  * value); the even-count case is one add + one halving. The
  * intercept terms x_i − slope·t_i reuse the selected slope double —
  * every engine replays the identical tree. Outputs nano-rounded.
  *
  * Scale: O(n²) pairs IS the estimator (same as Adamic-Adar's wedge
  * volume or Baskets' pair volume — the cost is the math). The
  * series is expected pre-aggregated (daily rollups); `maxPoints`
  * fails loud before a raw-event series detonates the pair join.
  * Pair generation is an EXPLODE + equi-join (each point fans out to
  * its higher-indexed partners) — never an inequality nested-loop.
  */
object Robust {

  /** Theil-Sen line over (tCol, xCol) — both integral; `tCol` must be
    * distinct per row (duplicates raise: two observations at one t
    * make Δt = 0). Output 1 row: (n_points, n_pairs, slope_nano,
    * intercept_nano); fewer than 2 points yields n_pairs = 0 with
    * NULL slope/intercept. */
  def theilSen(df: DataFrame, tCol: String, xCol: String,
               maxPoints: Long = 2000L): DataFrame = {
    require(maxPoints >= 2, s"theilSen: maxPoints must be >= 2, got $maxPoints")
    val tGuard: Column =
      when(col(tCol).isNull || col(xCol).isNull, raise_error(lit(
        s"theilSen: NULL in ($tCol, $xCol) — aggregate or filter upstream")))
      .when(count(lit(1)).over(Window.partitionBy(col(tCol))) > 1,
        raise_error(concat(lit(s"theilSen: duplicate $tCol = "),
          col(tCol).cast("string"), lit(" — two observations at one t make a 0/0 slope"))))
      .otherwise(col(tCol)).cast("long")
    val s = df.select(tGuard.as("t"), col(xCol).cast("long").as("x"))
      .withColumn("rn", row_number().over(Window.orderBy(col("t"))).cast("long"))
    val total = s.agg(count(lit(1)).as("__n"))
      .select(when(col("__n") > maxPoints, raise_error(concat(
          lit("theilSen: "), col("__n").cast("string"),
          lit(s" points > maxPoints=$maxPoints — the pair volume is quadratic; " +
            "pre-aggregate the series or raise the cap deliberately"))))
        .otherwise(col("__n")).as("n"))
    // explode each point to its higher-indexed partners, then ONE
    // equi-join on the partner index — no inequality nested loop
    val lo = s.crossJoin(broadcast(total))
      .where(col("rn") < col("n"))
      .withColumn("j", explode(sequence(col("rn") + 1, col("n"))))
      .select(col("t").as("t1"), col("x").as("x1"), col("j"))
    val hi = s.select(col("rn").as("j"), col("t").as("t2"), col("x").as("x2"))
    val slopes = lo.join(hi, Seq("j"))
      .select(((col("x2") - col("x1")).cast("double") /
        (col("t2") - col("t1")).cast("double")).as("slope"))
    val wS = Window.orderBy(col("slope"))
    val ranked = slopes
      .withColumn("r", row_number().over(wS).cast("long"))
      .withColumn("np", count(lit(1)).over(Window.partitionBy(lit(1))).cast("long"))
    // exact median by order-statistic selection: odd → the middle
    // element, even → the mean of the two middles (one add, one halve)
    val medianSlope = ranked
      .where(col("r") === expr("(np + 1) div 2") || col("r") === expr("np div 2 + 1"))
      .agg(count(lit(1)).as("__k"), sum(col("slope")).as("__s"),
        max(col("np")).as("n_pairs"))
      .select(col("n_pairs"), (col("__s") / col("__k").cast("double")).as("slope"))
    val withSlope = s.crossJoin(broadcast(medianSlope))
      .select(col("n_pairs"), col("slope"),
        (col("x").cast("double") - col("slope") * col("t").cast("double")).as("resid"))
    val wR = Window.orderBy(col("resid"))
    val interc = withSlope
      .withColumn("r", row_number().over(wR).cast("long"))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy(lit(1))).cast("long"))
      .where(col("r") === expr("(nn + 1) div 2") || col("r") === expr("nn div 2 + 1"))
      .agg(max(col("nn")).as("n_points"), max(col("n_pairs")).as("n_pairs"),
        max(col("slope")).as("slope"),
        (sum(col("resid")) / count(lit(1)).cast("double")).as("intercept"))
    interc.select(coalesce(col("n_points"), lit(0L)).as("n_points"),
      coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
      round(col("slope") * 1e9).cast("long").as("slope_nano"),
      round(col("intercept") * 1e9).cast("long").as("intercept_nano"))
  }
}
