package graft

import graft.ops.Cdc
import graft.streaming.StreamCdc
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamCdcSpec extends SparkSpec {
  import spark.implicits._
  import StreamCdcSpec.Entry

  private def snapshot = Seq(
    (1L, "alice", 10L), (2L, "bob", 20L), (3L, "carol", 30L), (7L, "grace", 70L)
  ).toDF("k", "name", "amt")

  // the full feed: upserts, a delete, a re-insert after delete, a new key
  private val feed = Seq(
    Entry(1L, "U", 2L, "alice2", 11L),
    Entry(2L, "D", 3L, "x", 0L),
    Entry(2L, "I", 5L, "bob-back", 22L), // re-insert AFTER the delete (higher seq)
    Entry(3L, "U", 1L, "carol1", 31L),
    Entry(3L, "U", 4L, "carol4", 33L),   // later seq wins
    Entry(9L, "I", 6L, "ivan", 90L),     // brand-new key
    Entry(7L, "D", 8L, "x", 0L)          // delete, never re-inserted
  )

  private def streamFeed(batches: Seq[Seq[Entry]]): String = {
    implicit val sqlCtx = spark.sqlContext
    val statePath = Files.createTempDirectory("graft-cdc").toString + "/state"
    StreamCdc.bootstrap(snapshot, statePath, "k", Seq("name", "amt"))
    val input = MemoryStream[Entry]
    val query = StreamCdc.maintain(input.toDF(), statePath, "k", Seq("name", "amt"))
      .start()
    try batches.foreach { b => input.addData(b); query.processAllAvailable() }
    finally query.stop()
    statePath
  }

  private def collected(df: org.apache.spark.sql.DataFrame) =
    df.select($"k", $"name", $"amt").as[(Long, String, Long)].collect().toSet

  test("streamed replay in seq-ordered batches equals the batch applyLog") {
    val expected = collected(Cdc.applyLog(snapshot, feed.toDF(), "k", Seq("name", "amt")))
    val statePath = streamFeed(Seq(
      feed.filter(_.seq <= 3), feed.filter(e => e.seq > 3 && e.seq <= 6), feed.filter(_.seq > 6)))
    assert(collected(StreamCdc.current(spark, statePath)) == expected)
    assert(expected.exists(_._1 == 9L) && !expected.exists(_._1 == 7L))
  }

  test("at-least-once: redelivered and duplicated entries are no-ops (batch ≡ shuffled+duped stream)") {
    val expected = collected(Cdc.applyLog(snapshot, feed.toDF(), "k", Seq("name", "amt")))
    // batch 1 delivered twice into DIFFERENT batch ids (the case a
    // replayed generation alone cannot absorb), an in-batch duplicate,
    // and a late lower-seq straggler arriving after later entries
    val b1 = feed.filter(_.seq <= 3)
    val statePath = streamFeed(Seq(
      b1,
      b1 ++ feed.filter(e => e.seq > 3 && e.seq <= 6),
      feed.filter(_.seq > 6) ++ Seq(feed.head, feed.head), // dup within one batch too
      Seq(Entry(3L, "U", 1L, "carol1", 31L))               // stale straggler: must not regress k=3
    ))
    assert(collected(StreamCdc.current(spark, statePath)) == expected)
  }

  test("a delete tombstone survives a late lower-seq upsert (no resurrection)") {
    val statePath = streamFeed(Seq(
      Seq(Entry(7L, "D", 8L, "x", 0L)),
      Seq(Entry(7L, "U", 2L, "ghost", 1L)) // older than the delete: stays dead
    ))
    val cur = collected(StreamCdc.current(spark, statePath))
    assert(!cur.exists(_._1 == 7L))
    // but the tombstone is still in the full state, carrying the delete's seq
    val st = StreamCdc.currentState(spark, statePath)
      .where($"k" === 7L).select($"__seq", $"__deleted").as[(Long, Boolean)].collect()
    assert(st.toSeq == Seq((8L, true)))
  }

  test("genuinely ambiguous entries still raise; bootstrap/prune behave") {
    val statePath = streamFeed(Seq(Seq(feed.head)))
    // two DIFFERENT entries at one key's max seq in one batch
    val bad = Seq(Entry(5L, "U", 9L, "a", 1L), Entry(5L, "U", 9L, "b", 2L)).toDF()
    val err = intercept[Exception] {
      StreamCdc.applyBatch(StreamCdc.currentState(spark, statePath), bad,
        "k", Seq("name", "amt"), "op", "seq").collect()
    }
    assert(err.getMessage.contains("ambiguous"))
    StreamCdc.prune(spark, statePath, keep = 1)
    val left = new java.io.File(statePath).listFiles().filter(_.getName.startsWith("gen="))
    assert(left.length == 1)
    intercept[IllegalArgumentException] {
      StreamCdc.current(spark, Files.createTempDirectory("graft-cdc-none").toString)
    }
  }
}

object StreamCdcSpec {
  case class Entry(k: Long, op: String, seq: Long, name: String, amt: Long)
}
