package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection via the median absolute
  * deviation (Hampel's rule: flag x where |x − median| > k·MAD) —
  * the standard replacement for z-scores when the data itself
  * contains the outliers you are hunting (mean and stddev are
  * dragged by the very points they are supposed to expose; the
  * median and MAD have a 50% breakdown point).
  *
  * Exactness: over integer values (pass cents) both medians are the
  * EXACT lower-median of the sorted array (index ⌊(n−1)/2⌋ — the
  * discrete convention `q_quantiles` pinned, no interpolation), so
  * the flag |x − med| > k·MAD compares exact integers scaled by an
  * integer k — deterministic in any engine, no floating point
  * anywhere.
  *
  * Plan shape: one `sort_array(collect_list)` aggregate per group
  * for the median, a broadcast-sized group-stats join back, and the
  * flag as a narrow projection. The collect_list bounds this to
  * groups that fit in executor memory — the same contract as
  * `q_quantiles` (per-group arrays, fine for the thousands-of-values
  * groups profiling targets; a 10⁹-row group needs the
  * QuantileSketch path instead, stated plainly).
  */
object Outliers {

  private def lowerMedian(sorted: Column, n: Column): Column =
    element_at(sorted, (floor((n - 1) / 2) + 1).cast("int"))

  /** Per-group robust stats: (keys…, n, median, mad) over exact
    * integer `valCol`. */
  def groupStats(df: DataFrame, keys: Seq[String], valCol: String): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val v = col(valCol).cast("long")
    val base = df.where(v.isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(v)).as("__sorted"), count(lit(1)).as("n"))
      .withColumn("median", lowerMedian(col("__sorted"), col("n")))
    base
      .withColumn("__devs", sort_array(transform(col("__sorted"),
        x => abs(x - col("median")))))
      .withColumn("mad", lowerMedian(col("__devs"), col("n")))
      .drop("__sorted", "__devs")
  }

  /** Median imputation: fill NULL values with the group's exact
    * lower median (the [[groupStats]] convention — a value that
    * actually occurs, robust to the outliers that make mean
    * imputation leak tail mass into the fill). Groups whose values
    * are ALL null (no median exists) keep their NULLs — inventing a
    * global fill silently couples unrelated groups; handle those
    * explicitly upstream. Output: input columns + `filled` (the
    * imputed value) + `was_imputed`.
    *
    * Same broadcast-stats plan as [[flag]]: one sorted-array
    * aggregate per group, a broadcast join back, narrow projection.
    */
  def imputeMedian(df: DataFrame, keys: Seq[String], valCol: String): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val v = col(valCol).cast("long")
    val stats = groupStats(df, keys, valCol).select(
      keys.map(col) :+ col("median").as("__med"): _*)
    df.join(broadcast(stats), keys, "left_outer")
      .withColumn("filled", coalesce(v, col("__med")))
      .withColumn("was_imputed", v.isNull && col("__med").isNotNull)
      .drop("__med")
  }

  /** Winsorization: clip each value to its group's exact discrete
    * [pLo, pHi] quantiles — the tail treatment that KEEPS outlier
    * rows (unlike a flag-and-drop) while bounding their leverage on
    * downstream means/regressions. Quantile index = ⌊p·(n−1)⌋ on the
    * sorted array, the `q_quantiles` discrete convention — no
    * interpolation, so the clip bounds are values that actually
    * occur and the whole operation is exact integer comparisons.
    *
    * Same plan/memory contract as [[groupStats]]: one sorted-array
    * aggregate per group, broadcast bounds joined back, clip as a
    * narrow projection. NULL values pass through NULL (missing, not
    * extreme). Output: input columns + `clipped` (the winsorized
    * value) + `was_clipped`.
    */
  def winsorize(df: DataFrame, keys: Seq[String], valCol: String,
                pLo: Double, pHi: Double): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"winsorize: need 0 <= pLo < pHi <= 1, got [$pLo, $pHi]")
    val v = col(valCol).cast("long")
    def q(p: Double): Column =
      element_at(col("__sorted"), (floor((col("__n") - 1) * p) + 1).cast("int"))
    val bounds = df.where(v.isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(v)).as("__sorted"), count(lit(1)).as("__n"))
      .select(keys.map(col) :+ q(pLo).as("__lo") :+ q(pHi).as("__hi"): _*)
    df.join(broadcast(bounds), keys, "left_outer")
      // greatest/least IGNORE nulls (SQL semantics), so a NULL value
      // must be passed through explicitly, not fed to the clamp
      .withColumn("clipped",
        when(v.isNull, lit(null).cast("long"))
          .otherwise(least(greatest(v, col("__lo")), col("__hi"))))
      .withColumn("was_clipped", v.isNotNull && (v < col("__lo") || v > col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Flag rows whose value deviates from its group's median by more
    * than `k`·MAD. Degenerate groups (MAD = 0 — at least half the
    * values identical) flag ANY deviation: with zero robust spread,
    * every departure from the median is anomalous (k·0 = 0 keeps
    * that semantic automatically). NULL values are never flagged
    * (nothing to judge). Output: the input columns + `is_outlier`. */
  def flag(df: DataFrame, keys: Seq[String], valCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val stats = groupStats(df, keys, valCol).select(
      keys.map(col) :+ col("median").as("__med") :+ col("mad").as("__mad"): _*)
    val v = col(valCol).cast("long")
    df.join(broadcast(stats), keys, "left_outer")
      .withColumn("is_outlier",
        when(v.isNull, lit(false))
          .otherwise(coalesce(abs(v - col("__med")) > lit(k.toLong) * col("__mad"),
            lit(false))))
      .drop("__med", "__mad")
  }
}
