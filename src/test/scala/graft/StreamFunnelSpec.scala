package graft

import graft.streaming.StreamFunnel
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  case class Doc(doc_id: Long, ts: Timestamp, n_tok: Int, quality: Double)

  private def stages = Seq(
    "long_enough" -> (col("n_tok") >= 10),
    "quality" -> (col("quality") >= 0.5))

  test("per-window funnel counts finalize on watermark, append-once, cumulative") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val out = StreamFunnel.windowed(input.toDF(), "ts", "10 minutes", "5 minutes", stages)
    val query = out.writeStream.format("memory").queryName("funnel1")
      .outputMode("append").start()
    try {
      input.addData(
        Doc(1, ts("2024-01-01 05:01:00"), 20, 0.9), // passes both
        Doc(2, ts("2024-01-01 05:03:00"), 20, 0.1), // fails quality
        Doc(3, ts("2024-01-01 05:07:00"), 3, 0.9),  // fails length (quality never reached)
        Doc(4, ts("2024-01-01 05:12:00"), 15, 0.8)  // next window
      )
      query.processAllAvailable()
      // watermark moves past 05:00-05:10 only once later data arrives
      input.addData(Doc(5, ts("2024-01-01 05:30:00"), 15, 0.8))
      query.processAllAvailable()
      val rows = spark.table("funnel1")
        .select($"window_start", $"n_raw", $"n_long_enough", $"n_quality")
        .as[(Timestamp, Long, Long, Long)].collect()
        .map(r => (r._1.toString, (r._2, r._3, r._4))).toMap
      assert(rows("2024-01-01 05:00:00.0") == ((3L, 2L, 1L)), rows.toString)
      // watermark 05:25 also finalized the 05:10 window (ends 05:20)
      assert(rows("2024-01-01 05:10:00.0") == ((1L, 1L, 1L)), rows.toString)
      // the open 05:30 window is NOT emitted yet
      assert(!rows.contains("2024-01-01 05:30:00.0"), rows.toString)
    } finally query.stop()
  }

  test("a late row below the watermark is dropped from its (already emitted) window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val out = StreamFunnel.windowed(input.toDF(), "ts", "10 minutes", "5 minutes", stages)
    val query = out.writeStream.format("memory").queryName("funnel2")
      .outputMode("append").start()
    try {
      input.addData(Doc(1, ts("2024-01-01 05:01:00"), 20, 0.9))
      query.processAllAvailable()
      input.addData(Doc(2, ts("2024-01-01 06:00:00"), 20, 0.9)) // advances watermark
      query.processAllAvailable()
      input.addData(Doc(3, ts("2024-01-01 05:02:00"), 20, 0.9)) // below watermark
      query.processAllAvailable()
      val first = spark.table("funnel2")
        .where($"window_start" === ts("2024-01-01 05:00:00"))
        .select($"n_raw").as[Long].collect()
      assert(first.toSeq == Seq(1L), s"late row must not re-open the window: ${first.toSeq}")
    } finally query.stop()
  }
}
