package graft

import graft.streaming.StreamCusum
import graft.streaming.StreamCusum.CusumEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streamed CUSUM ≡ the batch trace when arrival respects event
  * order across micro-batches; late rows are counted, never applied. */
class StreamCusumSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("two in-order micro-batches reproduce the batch recurrence") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CusumEvent]
    val q = StreamCusum.trace(in.toDS(), target = 10L, threshold = 16L)
      .writeStream.format("memory").queryName("cusum1").outputMode("append").start()
    try {
      in.addData(CusumEvent(1L, ts(1), 1L, 15L), CusumEvent(1L, ts(2), 2L, 3L))
      q.processAllAvailable()
      in.addData(CusumEvent(1L, ts(3), 3L, 25L), CusumEvent(1L, ts(4), 4L, 12L))
      q.processAllAvailable()
      val got = spark.table("cusum1")
        .orderBy("tie").as[StreamCusum.CusumPoint].collect().toSeq
      // batch reference: s = 5, 0, 15, 17 (SmoothingSpec hand case)
      assert(got.map(_.cusum) == Seq(5L, 0L, 15L, 17L))
      assert(got.map(_.alarm) == Seq(false, false, false, true))
      assert(got.forall(_.n_late == 0L))
    } finally q.stop()
  }

  test("late rows are counted and skipped, replays never double-apply") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CusumEvent]
    val q = StreamCusum.trace(in.toDS(), target = 0L, threshold = 100L)
      .writeStream.format("memory").queryName("cusum2").outputMode("append").start()
    try {
      in.addData(CusumEvent(1L, ts(5), 2L, 7L))
      q.processAllAvailable()
      // one genuinely late row + one exact replay of the frontier row
      in.addData(CusumEvent(1L, ts(1), 1L, 100L), CusumEvent(1L, ts(5), 2L, 7L))
      q.processAllAvailable()
      in.addData(CusumEvent(1L, ts(6), 3L, 5L))
      q.processAllAvailable()
      val got = spark.table("cusum2")
        .orderBy("tie").as[StreamCusum.CusumPoint].collect().toSeq
      assert(got.map(_.cusum) == Seq(7L, 12L)) // 100 never applied, replay ignored
      assert(got.last.n_late == 2L)
    } finally q.stop()
  }
}
