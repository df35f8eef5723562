package graft

import graft.operators.{Components, PageRank}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The reliable-truncation contract (ops.Checkpoints): with a session
  * checkpoint dir configured, iterative loops persist their per-round
  * cuts to the checkpoint filesystem (the executor-loss-survivable
  * mode for long cluster runs) and produce identical results; with
  * none configured they stay executor-local. */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  /** SparkContext has no public unset for the checkpoint dir; clear
    * the private field so the shared test session reverts to
    * executor-local truncation for every other suite. */
  private def resetCheckpointDir(): Unit = {
    val f = classOf[org.apache.spark.SparkContext].getDeclaredField("checkpointDir")
    f.setAccessible(true)
    f.set(spark.sparkContext, None)
  }

  test("a configured checkpoint dir switches loops to reliable checkpoints, results unchanged") {
    val edges = (1L to 120L).map(i => (i, (i * 3) % 40)).toDF("src", "dst")
    val local = PageRank.ranks(edges, iters = 3).orderBy($"id").collect()
    assert(spark.sparkContext.getCheckpointDir.isEmpty, "precondition: no dir configured")
    val dir = Files.createTempDirectory("graft-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val reliable = PageRank.ranks(edges, iters = 3).orderBy($"id").collect()
      assert(local.nonEmpty && local.sameElements(reliable))
      // the per-round cuts really landed on the checkpoint filesystem
      val landed = Files.walk(dir).filter(p => p.toFile.isFile).count()
      assert(landed > 0, s"no checkpoint files under $dir")
    } finally resetCheckpointDir()
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
  }

  test("components under a reliable dir match the executor-local run") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L)).toDF("d1", "d2")
    val local = Components.connectedComponents(pairs).orderBy($"id").collect()
    val dir = Files.createTempDirectory("graft-ckpt2")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val reliable = Components.connectedComponents(pairs).orderBy($"id").collect()
      assert(local.nonEmpty && local.sameElements(reliable))
    } finally resetCheckpointDir()
  }
}
