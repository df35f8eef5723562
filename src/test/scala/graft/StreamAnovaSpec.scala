package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streamed per-window ANOVA ≡ the batch decomposition per window —
  * the StreamCusum/StreamSessions contract, for the one round-8 stat
  * whose streaming form is nearly free (moments are order-free
  * monoid aggregates; no frontier state at all). */
class StreamAnovaSpec extends SparkSpec {
  import spark.implicits._

  case class Ev(ts: Timestamp, g: String, x: Long)
  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("streamed window decomposition ≡ batch Anova.decompose per window") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = graft.streaming.StreamAnova
      .windowed(in.toDF(), "ts", "g", "x", "1 hour", watermark = "0 seconds")
      .writeStream.format("memory").queryName("sanova1").outputMode("append").start()
    try {
      // window 10:00: the RoundEightOpsSpec hand case (a={1,3}, b={5,7})
      // — arrival deliberately INTERLEAVED and out of order: moments
      // are order-free, so the window must still decompose exactly
      in.addData(Ev(ts(10, 30), "b", 7L), Ev(ts(10, 5), "a", 1L))
      q.processAllAvailable()
      in.addData(Ev(ts(10, 40), "a", 3L), Ev(ts(10, 20), "b", 5L))
      q.processAllAvailable()
      // window 11:00: flat groups (SSW = 0 → η² = 1, F NULL)
      in.addData(Ev(ts(11, 1), "a", 2L), Ev(ts(11, 2), "a", 2L),
        Ev(ts(11, 3), "b", 9L), Ev(ts(11, 4), "b", 9L))
      q.processAllAvailable()
      // advance the watermark past both windows to flush them
      in.addData(Ev(ts(13, 0), "z", 0L))
      q.processAllAvailable()
      val got = spark.table("sanova1")
        .orderBy("w_start")
        .as[(Timestamp, Timestamp, Long, Long, Long, Long, Long, Option[Long], Option[Long])]
        .collect().toSeq
      assert(got.size == 2)
      // batch reference per window, via the oracle-gated operator
      val w10 = Seq(("a", 1L), ("a", 3L), ("b", 5L), ("b", 7L)).toDF("g", "x")
      val b10 = graft.ops.Anova.decompose(w10, "g", "x")
        .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long])].collect().head
      assert((got(0)._3, got(0)._4, got(0)._5, got(0)._6, got(0)._7, got(0)._8, got(0)._9) == b10)
      val w11 = Seq(("a", 2L), ("a", 2L), ("b", 9L), ("b", 9L)).toDF("g", "x")
      val b11 = graft.ops.Anova.decompose(w11, "g", "x")
        .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long])].collect().head
      assert((got(1)._3, got(1)._4, got(1)._5, got(1)._6, got(1)._7, got(1)._8, got(1)._9) == b11)
      assert(got(1)._8.contains(1000000000L) && got(1)._9.isEmpty) // flat: η²=1, F NULL
    } finally q.stop()
  }

  test("late-but-inside-watermark rows join their window exactly (order-free moments)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = graft.streaming.StreamAnova
      .windowed(in.toDF(), "ts", "g", "x", "1 hour", watermark = "2 hours")
      .writeStream.format("memory").queryName("sanova2").outputMode("append").start()
    try {
      in.addData(Ev(ts(10, 5), "a", 1L), Ev(ts(10, 20), "b", 5L), Ev(ts(11, 0), "c", 1L))
      q.processAllAvailable()
      // these arrive a micro-batch later but are within the watermark
      in.addData(Ev(ts(10, 40), "a", 3L), Ev(ts(10, 30), "b", 7L))
      q.processAllAvailable()
      in.addData(Ev(ts(14, 0), "z", 0L)) // flush
      q.processAllAvailable()
      val got = spark.table("sanova2").orderBy("w_start")
        .as[(Timestamp, Timestamp, Long, Long, Long, Long, Long, Option[Long], Option[Long])]
        .collect().toSeq
      val w10 = got.find(_._1 == ts(10, 0)).get
      assert((w10._3, w10._4) == ((4L, 2L)))
      assert(w10._5 == 20000000L && w10._6 == 4000000L) // the hand case, micro SS (r14)
    } finally q.stop()
  }
}
