package graft

import graft.sources.{MaterializedView => Mv, Snapshots}
import graft.streaming.StreamMv
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream → base snapshot table → incrementally-folded aggregate
  * view, exactly once end to end: the base's batch-tag ledger and
  * the view's reflected-version tag compose so every crash window
  * replays as either a no-op or a catch-up — never a double count. */
class StreamMvSpec extends SparkSpec {
  import spark.implicits._

  private def freshDirs(): (String, String, String) = {
    val root = Files.createTempDirectory("streammv").toString
    (s"$root/base", s"$root/view", s"$root/ckpt")
  }

  private def bootstrap(base: String, view: String): Unit = {
    // empty-base bootstrap: an empty typed frame commits as v1
    Snapshots.commit(spark.emptyDataset[(String, Long)].toDF("k", "v"), base)
    Mv.fullRefresh(spark, base, view, "k", Seq("v"))
  }

  private def viewMap(view: String): Map[String, (Long, Long)] =
    Snapshots.read(spark, view).as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("a streamed aggregate equals the batch recompute after several micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val (base, view, ckpt) = freshDirs()
    bootstrap(base, view)
    val input = MemoryStream[(String, Long)]
    val q = input.toDF().toDF("k", "v").writeStream
      .foreachBatch(StreamMv.sink(base, view, "k", Seq("v")))
      .option("checkpointLocation", ckpt).start()
    try {
      input.addData(("a", 10L), ("b", 1L)); q.processAllAvailable()
      input.addData(("a", 5L), ("c", 2L)); q.processAllAvailable()
      input.addData(("c", 3L)); q.processAllAvailable()
    } finally q.stop()
    assert(viewMap(view) == Map("a" -> (2L, 15L), "b" -> (1L, 1L), "c" -> (2L, 5L)))
    // matches a from-scratch rebuild over the landed base
    val (_, view2, _) = freshDirs()
    Mv.fullRefresh(spark, base, view2, "k", Seq("v"))
    assert(viewMap(view2) == viewMap(view))
  }

  test("replayed batch: both halves no-op (no new base version, no double fold)") {
    val (base, view, _) = freshDirs()
    bootstrap(base, view)
    val sink = StreamMv.sink(base, view, "k", Seq("v"))
    sink(Seq(("a", 10L)).toDF("k", "v"), 0L)
    val baseV = Snapshots.currentVersion(base)
    val viewV = Snapshots.currentVersion(view)
    sink(Seq(("a", 10L)).toDF("k", "v"), 0L) // crash-window replay
    assert(Snapshots.currentVersion(base) == baseV)
    assert(Snapshots.currentVersion(view) == viewV)
    assert(viewMap(view) == Map("a" -> (1L, 10L)))
  }

  test("crash between base commit and view refresh: the replay catches the view up") {
    val (base, view, _) = freshDirs()
    bootstrap(base, view)
    // batch 0 lands in the base but the process dies before the fold
    Snapshots.commit(Seq(("a", 10L)).toDF("k", "v"), base, tag = Some("batch=0"))
    assert(viewMap(view) == Map.empty) // view still reflects the empty bootstrap
    // the replayed batch: base commit skips (tag exists), fold catches up
    StreamMv.sink(base, view, "k", Seq("v"))(Seq(("a", 10L)).toDF("k", "v"), 0L)
    assert(viewMap(view) == Map("a" -> (1L, 10L)))
    // and a second replay is a full no-op
    val vv = Snapshots.currentVersion(view)
    StreamMv.sink(base, view, "k", Seq("v"))(Seq(("a", 10L)).toDF("k", "v"), 0L)
    assert(Snapshots.currentVersion(view) == vv)
  }
}
