package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality pass a pipeline runs before
  * trusting a new drop of data: row count, null count, exact distinct
  * count, min/max per column.
  *
  * Shape: ONE aggregation per profiled column over a single-column
  * projection, unioned. Deliberately not a single multi-distinct
  * aggregate: several `count(DISTINCT x)` in one agg plan through an
  * Expand that replicates every row once per distinct column, while
  * per-column runs each read ONE column from parquet (pruned scan)
  * with an ordinary two-level distinct aggregate — at 100 TB,
  * |cols| pruned column scans beat one ×|cols| row expansion, and
  * the runs are independent jobs a scheduler can overlap.
  *
  * min/max surface as DOUBLE (numeric columns are the contract —
  * string formatting of doubles/timestamps differs across engines
  * and would poison exact comparison; profile non-numerics with a
  * separate projection if needed).
  */
object DataProfile {

  /** One row per profiled numeric column:
    * (col_name, n_rows, n_null, n_distinct, min_val, max_val). */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileNumeric: no columns given")
    cols.map { c =>
      df.select(col(c))
        .agg(
          count(lit(1)).as("n_rows"),
          count(when(col(c).isNull, 1)).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("double").as("min_val"),
          max(col(c)).cast("double").as("max_val"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_ unionByName _)
  }
}
