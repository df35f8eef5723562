package graft

import graft.streaming.StreamSmooth
import graft.streaming.StreamSmooth.SmoothEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streamed EWMA/Holt ≡ the batch recurrences when arrival respects
  * event order across micro-batches; late rows are counted, never
  * applied; replays never double-apply — the StreamCusum contract
  * over the other two recurrences. */
class StreamSmoothSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("streamed EWMA across micro-batches is bit-identical to batch ewmaTrace") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      SmoothEvent(1L, ts(1), 1L, 100L), SmoothEvent(1L, ts(2), 2L, 30L),
      SmoothEvent(2L, ts(1), 3L, 7L),
      SmoothEvent(1L, ts(3), 4L, 7L), SmoothEvent(2L, ts(4), 5L, 99L))
    val in = MemoryStream[SmoothEvent]
    val q = StreamSmooth.ewmaTrace(in.toDS(), num = 1, log2Den = 1)
      .writeStream.format("memory").queryName("sm_ewma").outputMode("append").start()
    try {
      in.addData(rows.take(3): _*); q.processAllAvailable()
      in.addData(rows.drop(3): _*); q.processAllAvailable()
      val streamed = spark.table("sm_ewma")
        .orderBy("key", "tie").as[StreamSmooth.EwmaPoint].collect().toSeq
      val batch = graft.ops.Smoothing.ewmaTrace(
          rows.toDF("key", "ts", "tie", "v"), "key", "ts", "tie", "v", 1, 1)
        .orderBy("key", "rn").as[(Long, Long, Long, Long)].collect().toSeq
      assert(streamed.map(p => (p.key, p.v, p.ewma)) ==
        batch.map(r => (r._1, r._3, r._4)))
      assert(streamed.forall(_.n_late == 0L))
    } finally q.stop()
  }

  test("streamed Holt across micro-batches is bit-identical to batch holtTrace (incl. negative trend)") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      SmoothEvent(1L, ts(1), 1L, 100L), SmoothEvent(1L, ts(2), 2L, 60L),
      SmoothEvent(1L, ts(3), 3L, 20L))
    val in = MemoryStream[SmoothEvent]
    val q = StreamSmooth.holtTrace(in.toDS())
      .writeStream.format("memory").queryName("sm_holt").outputMode("append").start()
    try {
      in.addData(rows.head); q.processAllAvailable()
      in.addData(rows.tail: _*); q.processAllAvailable()
      val streamed = spark.table("sm_holt")
        .orderBy("tie").as[StreamSmooth.HoltPoint].collect().toSeq
      // the SmoothingSpec hand case: (100,0), (80,-10), (45,-23)
      assert(streamed.map(p => (p.level, p.trend)) ==
        Seq((100L, 0L), (80L, -10L), (45L, -23L)))
      val batch = graft.ops.Smoothing.holtTrace(
          rows.toDF("key", "ts", "tie", "v"), "key", "ts", "tie", "v")
        .orderBy("rn").as[(Long, Long, Long, Long, Long)].collect().toSeq
      assert(streamed.map(p => (p.level, p.trend)) == batch.map(r => (r._4, r._5)))
    } finally q.stop()
  }

  test("late rows counted and skipped; frontier replays never double-apply (both operators)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SmoothEvent]
    val q = StreamSmooth.ewmaTrace(in.toDS(), num = 1, log2Den = 1)
      .writeStream.format("memory").queryName("sm_late").outputMode("append").start()
    try {
      in.addData(SmoothEvent(1L, ts(5), 2L, 64L)); q.processAllAvailable()
      // a genuinely late row + an exact replay of the frontier row
      in.addData(SmoothEvent(1L, ts(1), 1L, 999L), SmoothEvent(1L, ts(5), 2L, 64L))
      q.processAllAvailable()
      in.addData(SmoothEvent(1L, ts(6), 3L, 0L)); q.processAllAvailable()
      val got = spark.table("sm_late")
        .orderBy("tie").as[StreamSmooth.EwmaPoint].collect().toSeq
      assert(got.map(_.ewma) == Seq(64L, 32L)) // 999 never applied, replay ignored
      assert(got.last.n_late == 2L)
    } finally q.stop()

    val in2 = MemoryStream[SmoothEvent]
    val q2 = StreamSmooth.holtTrace(in2.toDS())
      .writeStream.format("memory").queryName("sm_late2").outputMode("append").start()
    try {
      in2.addData(SmoothEvent(1L, ts(5), 2L, 10L)); q2.processAllAvailable()
      in2.addData(SmoothEvent(1L, ts(1), 1L, 999L), SmoothEvent(1L, ts(5), 2L, 10L))
      q2.processAllAvailable()
      val got = spark.table("sm_late2")
        .orderBy("tie").as[StreamSmooth.HoltPoint].collect().toSeq
      assert(got.map(p => (p.level, p.trend)) == Seq((10L, 0L)))
      assert(got.last.n_late == 0L) // n_late rides the NEXT emission
      in2.addData(SmoothEvent(1L, ts(6), 3L, 10L)); q2.processAllAvailable()
      val got2 = spark.table("sm_late2")
        .orderBy("tie").as[StreamSmooth.HoltPoint].collect().toSeq
      assert(got2.last.n_late == 2L)
    } finally q2.stop()
  }

  test("VERY late rows (days behind the frontier) are still counted — no watermark pre-drop") {
    // Regression for the r10 advice: a withWatermark("ts", "1 hour")
    // made Spark drop rows >1h behind BEFORE the state function, so
    // n_late undercounted exactly the latest (= most alarming) rows.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SmoothEvent]
    val q = StreamSmooth.ewmaTrace(in.toDS(), num = 1, log2Den = 1)
      .writeStream.format("memory").queryName("sm_vlate").outputMode("append").start()
    try {
      in.addData(SmoothEvent(1L, ts(5), 2L, 64L)); q.processAllAvailable()
      // three days behind the frontier — far outside any plausible horizon
      in.addData(SmoothEvent(1L, Timestamp.valueOf("2023-12-29 10:00:00"), 1L, 999L))
      q.processAllAvailable()
      in.addData(SmoothEvent(1L, ts(6), 3L, 0L)); q.processAllAvailable()
      val got = spark.table("sm_vlate")
        .orderBy("tie").as[StreamSmooth.EwmaPoint].collect().toSeq
      assert(got.map(_.ewma) == Seq(64L, 32L)) // 999 never applied
      assert(got.last.n_late == 1L)            // …but COUNTED
    } finally q.stop()
  }

  test("in-stream guards: negative and overflow-range values raise loudly") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SmoothEvent]
    val q = StreamSmooth.ewmaTrace(in.toDS(), num = 1, log2Den = 1)
      .writeStream.format("memory").queryName("sm_guard").outputMode("append").start()
    try {
      in.addData(SmoothEvent(1L, ts(1), 1L, -5L))
      val e = intercept[Exception](q.processAllAvailable())
      assert(e.getMessage.contains("negative") ||
        Option(e.getCause).exists(_.getMessage.contains("negative")) ||
        e.toString.contains("negative"))
    } finally q.stop()
  }
}
