package graft

import graft.streaming.StreamingRecap
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Edge-semantics pins for `StreamingRecap.sessionWindowed`,
  * complementing StreamingSpec's split/merge/append-flush coverage:
  * the exact-gap boundary and late-bridge session merging — the two
  * places a consumer switching between the batch lag rule
  * (`q_sessionize`) and the streaming form needs guarantees. */
class StreamSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  case class Ev(user_id: Long, ts: Timestamp, value: Option[Double])

  test("late event inside the watermark merges two provisional sessions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = StreamingRecap.sessionWindowed(input.toDF(), gap = "10 minutes",
        watermark = "30 minutes")
      .writeStream.format("memory").queryName("sessions_merge").outputMode("append").start()
    try {
      // two events 16 min apart: provisionally two sessions
      input.addData(Ev(1, ts("2024-01-01 05:00:00"), Some(1.0)),
        Ev(1, ts("2024-01-01 05:16:00"), Some(2.0)))
      query.processAllAvailable()
      // the bridge arrives late but inside the watermark: one session
      input.addData(Ev(1, ts("2024-01-01 05:08:00"), Some(4.0)))
      query.processAllAvailable()
      input.addData(Ev(1, ts("2024-01-01 09:00:00"), Some(0.0))) // close it
      query.processAllAvailable()
      val got = spark.table("sessions_merge")
        .where($"sess_start" < ts("2024-01-01 06:00:00"))
        .select($"user_id", $"sess_start", $"sess_end", $"n_events", $"sum_value")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSeq
      assert(got == Seq(
        (1L, ts("2024-01-01 05:00:00"), ts("2024-01-01 05:26:00"), 3L, 7.0)))
    } finally query.stop()
  }

  test("exact-boundary semantics are pinned: an event exactly gap later MERGES") {
    // session_window treats touching windows as one session: a
    // successor at exactly +gap merges — the SAME boundary the batch
    // lag-based rule draws (only `> gap` starts a new session), so
    // the streaming and batch forms agree everywhere, boundary
    // included
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = StreamingRecap.sessionWindowed(input.toDF(), gap = "10 minutes",
        watermark = "5 minutes")
      .writeStream.format("memory").queryName("sessions_edge").outputMode("append").start()
    try {
      input.addData(Ev(1, ts("2024-01-01 05:00:00"), Some(1.0)),
        Ev(1, ts("2024-01-01 05:10:00"), Some(2.0)))
      query.processAllAvailable()
      input.addData(Ev(1, ts("2024-01-01 08:00:00"), Some(0.0)))
      query.processAllAvailable()
      val rows = spark.table("sessions_edge")
        .where($"sess_start" < ts("2024-01-01 06:00:00"))
        .select($"user_id", $"sess_start", $"sess_end", $"n_events")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSeq
      assert(rows == Seq(
        (1L, ts("2024-01-01 05:00:00"), ts("2024-01-01 05:20:00"), 2L)))
    } finally query.stop()
  }
}
