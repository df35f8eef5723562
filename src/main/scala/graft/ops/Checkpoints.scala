package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative loops — the shared contract for
  * `Components`, `PageRank`, `KMeans`, and the PQ training loop.
  *
  * Every synchronous iteration must cut the logical plan back to
  * constant size or `iters` rounds build an exponentially deep
  * lineage (the `Components` lesson). HOW the cut persists is a
  * durability choice:
  *
  *  - **Executor-local** (`localCheckpoint`, the default): blocks
  *    live only in executor storage. Fast — no filesystem round-trip
  *    — but there is NO recompute path: at cluster scale, losing one
  *    executor mid-20-iteration run kills the job. The right trade
  *    in local mode and for short loops on stable clusters.
  *  - **Reliable** (`checkpoint`): blocks persist to the
  *    checkpoint filesystem (HDFS/object store) and survive executor
  *    loss — the job resumes from the last completed iteration's
  *    files. Costs one distributed write per iteration; at 100 TB
  *    that is the standard insurance for any loop whose expected
  *    runtime approaches the cluster's executor-failure horizon.
  *
  * The switch is the session's standard Spark setting, not an API
  * fork: call `spark.sparkContext.setCheckpointDir(dir)` before the
  * loop and every graft iterative operator checkpoints reliably;
  * leave it unset and they use executor-local truncation. One knob,
  * every loop, no signature churn.
  */
object Checkpoints {

  /** Eagerly materialize `df` and truncate its lineage — reliably if
    * the session has a checkpoint dir configured, executor-local
    * otherwise. */
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
    else df.localCheckpoint(true)
}
