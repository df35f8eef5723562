package graft

/** Pins the r14 half-cadence loop truncation: fixed-round loops cut
  * every 2nd round plus ALWAYS the last, so returned state is a
  * materialized constant-size scan while mid-loop rounds skip the
  * eager checkpoint job. */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  private def isCheckpointScan(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.logical.isInstanceOf[
      org.apache.spark.sql.execution.ExternalRDD[_]] ||
      df.queryExecution.logical.isInstanceOf[
        org.apache.spark.sql.execution.LogicalRDD]

  test("truncateEvery cuts only on the k-th round; truncateLoop always cuts last") {
    val df = Seq(1, 2, 3).toDF("x")
    assert(!isCheckpointScan(graft.ops.Checkpoints.truncateEvery(0)(df)))
    assert(isCheckpointScan(graft.ops.Checkpoints.truncateEvery(1)(df)))
    // last round cuts regardless of cadence position
    assert(isCheckpointScan(graft.ops.Checkpoints.truncateLoop(2, 3)(df)))
    assert(!isCheckpointScan(graft.ops.Checkpoints.truncateLoop(0, 3)(df)))
    assert(isCheckpointScan(graft.ops.Checkpoints.truncateLoop(1, 3)(df)))
  }

  test("truncateEvery under a checkpoint dir cuts every round (durability contract)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val df = Seq(1).toDF("x")
      assert(isCheckpointScan(graft.ops.Checkpoints.truncateEvery(0)(df)))
    } finally {
      // unset: a checkpoint dir leaking into other suites would switch
      // every loop to reliable mode
      org.apache.spark.GraftSparkShim.clearCheckpointDir(spark.sparkContext)
    }
  }
}
