package graft

import graft.streaming.StreamSessions
import graft.streaming.StreamSessions.{SessEvent, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streamed sessions ≡ the batch q_sessionize windows on in-order
  * feeds; watermark timeouts flush the final open session; late rows
  * ride the ledger, and replays never double-count. */
class StreamSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("gap break emits the closed session; the open one flushes on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessEvent]
    val q = StreamSessions.sessions(in.toDS(), gapMinutes = 30, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess1").outputMode("append").start()
    try {
      // session A: 10:00, 10:10, 10:25; then a >30min gap
      in.addData(SessEvent(1L, ts(10, 0), 1L), SessEvent(1L, ts(10, 10), 2L))
      q.processAllAvailable()
      in.addData(SessEvent(1L, ts(10, 25), 3L))
      q.processAllAvailable()
      // 11:30 breaks the gap → session A emits, session B opens
      in.addData(SessEvent(1L, ts(11, 30), 4L))
      q.processAllAvailable()
      val afterBreak = spark.table("sess1").as[Session].collect().toSeq
      assert(afterBreak == Seq(Session(1L, ts(10, 0), ts(10, 25), 3L, 0L)))
      // advance the watermark far past 11:30 + gap via another user's
      // event → the open session B times out and flushes
      in.addData(SessEvent(2L, ts(15, 0), 5L))
      q.processAllAvailable()
      in.addData(SessEvent(2L, ts(15, 1), 6L)) // one more batch so the timeout fires
      q.processAllAvailable()
      val all = spark.table("sess1").orderBy("sess_start").as[Session].collect().toSeq
      assert(all.contains(Session(1L, ts(11, 30), ts(11, 30), 1L, 0L)))
    } finally q.stop()
  }

  test("streamed ≡ batch session boundaries on an in-order multi-batch feed") {
    implicit val sqlCtx = spark.sqlContext
    // globally in event-time order: with watermark 0s, a cross-batch
    // out-of-order row would be dropped by the watermark itself (the
    // engine's late-data filter), which is the other contract's test
    val events = Seq(
      (1L, ts(9, 0), 1L), (2L, ts(9, 5), 5L),   // user 1 session 1 / user 2 session 1
      (1L, ts(9, 20), 2L), (1L, ts(9, 40), 3L), // session 1 continues (20m gaps)
      (1L, ts(10, 30), 4L),                     // user 1 session 2 (50m gap)
      (2L, ts(11, 0), 6L))                      // user 2 session 2
    val in = MemoryStream[SessEvent]
    val q = StreamSessions.sessions(in.toDS(), gapMinutes = 30, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess2").outputMode("append").start()
    try {
      events.grouped(2).foreach { g =>
        in.addData(g.map(e => SessEvent(e._1, e._2, e._3)): _*)
        q.processAllAvailable()
      }
      // flush everything: far-future watermark carrier + one more batch
      in.addData(SessEvent(99L, ts(23, 0), 99L)); q.processAllAvailable()
      in.addData(SessEvent(99L, ts(23, 1), 100L)); q.processAllAvailable()
      val streamed = spark.table("sess2").where($"user" <= 2L)
        .orderBy("user", "sess_start")
        .as[Session].collect().toSeq.map(s => (s.user, s.sess_start, s.sess_end, s.n_events))
      // batch reference: the q_sessionize window on the same rows
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val df = events.toDF("user_id", "ts", "event_id")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val batch = df
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_sess", when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("sess_no", sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess_no"))
        .agg(count(lit(1)).as("n"), min(col("ts")).as("s"), max(col("ts")).as("e"))
        .orderBy(col("user_id"), col("s"))
        .select(col("user_id"), col("s"), col("e"), col("n"))
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("late rows are counted, never re-woven; frontier replays never double-count") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessEvent]
    val q = StreamSessions.sessions(in.toDS(), gapMinutes = 30, watermark = "10 hours")
      .writeStream.format("memory").queryName("sess3").outputMode("append").start()
    try {
      in.addData(SessEvent(1L, ts(10, 0), 1L), SessEvent(1L, ts(10, 10), 2L))
      q.processAllAvailable()
      // one genuinely late row + one exact frontier replay
      in.addData(SessEvent(1L, ts(9, 55), 0L), SessEvent(1L, ts(10, 10), 2L))
      q.processAllAvailable()
      // gap break → the session emits with n_events 2 (not 4) and n_late 2
      in.addData(SessEvent(1L, ts(12, 0), 3L))
      q.processAllAvailable()
      val got = spark.table("sess3").as[Session].collect().toSeq
      assert(got == Seq(Session(1L, ts(10, 0), ts(10, 10), 2L, 2L)))
    } finally q.stop()
  }
}
