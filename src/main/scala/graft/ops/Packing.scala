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
    * (partitionCols..., bin). A single weight larger than `budget`
    * occupies its starting bin and spills into the next
    * (split-at-tokenize semantics).
    *
    * Contract, ENFORCED at runtime (not just documented): weights
    * must be non-negative (a negative weight makes the truncating
    * `div`/`%` disagree with floor semantics and can walk bins
    * backwards), and `orderCol` must be a unique total order within
    * each partition (with duplicates, the row-level running sum
    * depends on partition merge order — the same class of
    * nondeterminism the as-of join's tie-break column exists to
    * kill). Both checks ride the window pass the pack already does:
    * no extra shuffle, no extra scan. */
  def packByBudget(df: DataFrame, orderCol: String, weightCol: String,
                   budget: Long, partitionCols: Seq[String]): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(partitionCols.nonEmpty,
      "pack within explicit partitions (e.g. a hashBucket shard id); " +
        "a global pack serializes the whole frame through one task")
    val wtType = df.schema(weightCol).dataType
    val guardedWeight = when(col(weightCol) < 0,
      raise_error(concat(lit(s"packByBudget: negative $weightCol: "),
        col(weightCol).cast("string"))).cast(wtType))
      .otherwise(col(weightCol))
    val part = Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    val w = part.rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cum_before",
        coalesce(sum(guardedWeight).over(w), lit(0L)))
      // duplicate-order probe shares the window sort (lag over the
      // same partitioning/ordering folds into the same Window exec)
      // null order keys have no position in a total order — reject
      // outright (and null === null is null, so without this a pair of
      // null keys would slip past a null-unsafe duplicate guard);
      // the duplicate probe itself uses null-safe <=>
      .withColumn("bin",
        when(col(orderCol).isNull,
          raise_error(lit(
            s"packByBudget: null $orderCol (packing order must be a unique total order)"))
            .cast("long"))
          .when(lag(col(orderCol), 1).over(part) <=> col(orderCol),
            raise_error(concat(
              lit(s"packByBudget: duplicate $orderCol within a partition "),
              lit("(packing order must be a unique total order): "),
              col(orderCol).cast("string"))).cast("long"))
          .otherwise(expr(s"__cum_before div $budget")))
      .withColumn("bin_offset", col("__cum_before") % budget)
      .drop("__cum_before")
  }
}
