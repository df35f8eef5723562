package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Concentration / inequality measures — the "is this corpus (or
  * market, or traffic mix) dominated by a few heavy keys" numbers:
  * Gini over a value distribution, Herfindahl-Hirschman per group.
  * A training-data pipeline reads these over per-domain token mass
  * before mixing (a Gini near 1 means a handful of domains ARE the
  * corpus, whatever the row counts say).
  *
  * Exactness ladder as everywhere: Gini's Σ(i·xᵢ) uses EXACT global
  * ranks from `Ids.globalRowNumber` (range-bucketed two-pass, no
  * single-task window) and exact integer sums, with ONE mirrored
  * double tree at the end; HHI folds from per-group integer sums
  * with one tree per (group, member) collapsed to a per-group sum of
  * pre-rounded nano shares — order-free.
  */
object Inequality {

  /** Gini coefficient of a non-negative value column (one row:
    * n, total, gini_nano):
    *
    *   G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx)
    *
    * over values sorted ascending (i = 1-based rank; ties ordered by
    * `tieCol` — any total order gives the same G because tied values
    * contribute symmetric rank mass). NULL/negative values raise
    * (Gini over negatives is undefined). Σ i·xᵢ bounds ≈ 2⁶² for
    * cent-scale values to ~10⁸ rows; DECIMAL past that. */
  def gini(df: DataFrame, valCol: String, tieCol: String,
           buckets: Int = 64): DataFrame = {
    val v = when(col(valCol).isNull || col(valCol) < 0,
        raise_error(concat(lit(s"gini: $valCol must be non-negative, got "),
          col(valCol).cast("string"))))
      .otherwise(col(valCol)).cast("long")
    val ranked = graft.ops.Ids.globalRowNumber(
      df.select(v.as("__v"), col(tieCol).as("__tb")),
      "__v", Seq("__tb"), buckets, out = "__r")
    val s = ranked.agg(count(lit(1)).as("n"), sum(col("__v")).as("total"),
      sum(col("__r") * col("__v")).as("__rx"))
    def d(c: String) = col(c).cast("double")
    s.select(col("n"), col("total"),
      when(col("total") === 0, lit(null).cast("long"))
        .otherwise(round(lit(1e9) *
          (lit(2.0) * d("__rx") - (d("n") + 1.0) * d("total")) /
          (d("n") * d("total"))).cast("long"))
        .as("gini_nano"))
  }

  /** Herfindahl-Hirschman index per group over member values: the
    * sum of squared member SHARES (×10⁹ nano; 10⁹ = monopoly,
    * 10⁹/k = k equal members). Shares are one mirrored tree per
    * member, nano-rounded BEFORE the per-group sum (order-free, the
    * PSI ladder — the rounding bias is ≤ members·0.5 nano, stated).
    * Output per group: groupCol, n_members, total, hhi_nano. */
  def hhi(df: DataFrame, groupCol: String, memberCol: String,
          valCol: String): DataFrame = {
    val v = when(col(valCol).isNull || col(valCol) < 0,
        raise_error(concat(lit(s"hhi: $valCol must be non-negative, got "),
          col(valCol).cast("string"))))
      .otherwise(col(valCol)).cast("long")
    val members = df
      .groupBy(col(groupCol), col(memberCol))
      .agg(sum(v).as("__mv"))
    val totals = members.groupBy(col(groupCol))
      .agg(sum(col("__mv")).as("total"), count(lit(1)).as("n_members"))
    members.join(totals, Seq(groupCol))
      .select(col(groupCol), col("n_members"), col("total"),
        round(lit(1e9) *
          (col("__mv").cast("double") / col("total").cast("double")) *
          (col("__mv").cast("double") / col("total").cast("double")))
          .cast("long").as("__sh2"))
      .groupBy(col(groupCol))
      .agg(first(col("n_members")).as("n_members"),
        first(col("total")).as("total"),
        sum(col("__sh2")).as("hhi_nano"))
  }
}
