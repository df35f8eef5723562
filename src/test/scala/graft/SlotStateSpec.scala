package graft

import graft.streaming.SlotState
import graft.streaming.SlotState.SlotObs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class SlotStateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("late smaller obs_id takes over as slot winner across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SlotObs]
    val query = SlotState.slotWinners(input.toDS())
      .writeStream.format("memory").queryName("slot_winners").outputMode("update").start()
    try {
      // batch 1: obs 20 arrives first in slot 05:00-05:10
      input.addData(SlotObs(20, 1, ts("2024-01-01 05:07:00"), 25.0, "sun"))
      query.processAllAvailable()
      val w1 = spark.table("slot_winners").orderBy($"n_seen".desc).head()
      assert(w1.getAs[Long]("obs_id") == 20L && w1.getAs[Double]("temp_c") == 25.0)

      // batch 2: LATE row with smaller obs_id in the same slot → must win
      input.addData(SlotObs(10, 1, ts("2024-01-01 05:02:00"), 20.0, "rain"))
      query.processAllAvailable()
      val rows = spark.table("slot_winners").collect()
      val last = rows.maxBy(_.getAs[Long]("n_seen"))
      assert(last.getAs[Long]("obs_id") == 10L, rows.mkString(";"))
      assert(last.getAs[Double]("temp_c") == 20.0)
      assert(last.getAs[Long]("n_seen") == 2L)
    } finally query.stop()
  }

  test("separate slots keep independent winners") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SlotObs]
    val query = SlotState.slotWinners(input.toDS())
      .writeStream.format("memory").queryName("slot_winners2").outputMode("update").start()
    try {
      input.addData(
        SlotObs(5, 1, ts("2024-01-01 05:02:00"), 20.0, "rain"),
        SlotObs(6, 1, ts("2024-01-01 05:12:00"), 30.0, "sun"),
        SlotObs(7, 2, ts("2024-01-01 05:04:00"), 40.0, "hail")
      )
      query.processAllAvailable()
      val m = spark.table("slot_winners2").collect()
        .map(r => (r.getAs[Long]("location_id"), r.getAs[Timestamp]("slot_start").toString) -> r.getAs[Long]("obs_id")).toMap
      assert(m == Map(
        (1L, "2024-01-01 05:00:00.0") -> 5L,
        (1L, "2024-01-01 05:10:00.0") -> 6L,
        (2L, "2024-01-01 05:00:00.0") -> 7L))
    } finally query.stop()
  }
}
