package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining pipelines: lay documents out in a
  * deterministic order and cut the running token total at fixed-size
  * context-window boundaries. Every row gets the bin it starts in and
  * its offset within that bin — the physical layout of a packed
  * training shard (docs straddling a boundary are split downstream at
  * tokenization; the assignment here is the deterministic part two
  * engines must agree on).
  *
  * Scale shape: packing is sequential BY DEFINITION within a stream,
  * so the operator packs within explicit partitions (`partitionCols`,
  * e.g. a `Sampling.hashBucket` shard id) and each partition is one
  * window sort — embarrassingly parallel across partitions, one
  * shuffle total. An unpartitioned call funnels everything through
  * one task; that is only for small frames (the require below makes
  * the contract explicit rather than silently serializing a 100 TB
  * corpus).
  */
object Packing {

  /** Adds `bin` (floor(running-total-before / budget)) and
    * `bin_offset` (running-total-before mod budget), packing in
    * `orderCol` order within each combination of `partitionCols`.
    * Bin ids restart at 0 per partition — globally unique bins are
    * (partitionCols..., bin). Weights must be non-negative; a single
    * weight larger than `budget` occupies its starting bin and spills
    * into the next (split-at-tokenize semantics). */
  def packByBudget(df: DataFrame, orderCol: String, weightCol: String,
                   budget: Long, partitionCols: Seq[String]): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(partitionCols.nonEmpty,
      "pack within explicit partitions (e.g. a hashBucket shard id); " +
        "a global pack serializes the whole frame through one task")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cum_before",
        coalesce(sum(col(weightCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"__cum_before div $budget"))
      .withColumn("bin_offset", col("__cum_before") % budget)
      .drop("__cum_before")
  }
}
