package graft

import graft.streaming.StreamSmooth
import graft.streaming.StreamSmooth.SmoothEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** The streaming skew RECEIPT (r10 verdict item #8): StreamSmooth /
  * StreamCusum claim the batch hot-key replay problem does not exist
  * in streaming form because arrival order IS the scan — state per
  * key is O(1) (recurrence value + frontier), so a 20%-hot key costs
  * its row share, never its history. This spec measures that claim
  * instead of asserting it:
  *
  *  - a 20%-hot key distribution (1 key owns 20% of events, 49 share
  *    the rest) streams through ewmaTrace and holtTrace in
  *    equal-size micro-batches;
  *  - STATE SIZE is asserted O(keys): the state store's numRowsTotal
  *    equals the key count after every batch — not the event count,
  *    which is 100x larger (the O(history) failure shape);
  *  - CORRECTNESS under skew: the streamed trace is bit-identical to
  *    the batch recurrence over the same events (the hot key's 20%
  *    share exercises the multi-row-per-batch group path);
  *  - WALL-CLOCK sanity: the hot run's total trigger time stays
  *    within 3x a same-size uniform run (generous — the two do
  *    identical total work; a per-key-history replay would be ~25x
  *    on the hot 20%). Timing is a sanity band, not the primary
  *    assertion — the state-size identity is the structural proof.
  */
class StreamSkewSpec extends SparkSpec {
  import spark.implicits._

  private val keys = 50
  private val events = 5000
  private val batches = 10

  /** events with a 20%-hot key 0: event i goes to key 0 if i%5==0,
    * else uniform over 1..49; event time strictly increases so
    * nothing is late and the streamed trace is replay-comparable. */
  private def hotEvents: Seq[SmoothEvent] =
    (0 until events).map { i =>
      val k = if (i % 5 == 0) 0L else 1L + (i % (keys - 1)).toLong
      SmoothEvent(k, new Timestamp(1700000000000L + i * 1000L), i.toLong, (i % 97).toLong)
    }

  private def uniformEvents: Seq[SmoothEvent] =
    (0 until events).map { i =>
      SmoothEvent((i % keys).toLong,
        new Timestamp(1700000000000L + i * 1000L), i.toLong, (i % 97).toLong)
    }

  /** Drive `rows` through streamed ewmaTrace in equal batches;
    * returns (state rows after each batch, total trigger ms). */
  private def drive(rows: Seq[SmoothEvent], name: String): (Seq[Long], Long) = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SmoothEvent]
    val q = StreamSmooth.ewmaTrace(in.toDS(), num = 1, log2Den = 1)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val stateRows = scala.collection.mutable.ArrayBuffer[Long]()
    try {
      rows.grouped(events / batches).foreach { b =>
        in.addData(b: _*); q.processAllAvailable()
        stateRows += q.lastProgress.stateOperators.head.numRowsTotal
      }
      val totalMs = q.recentProgress
        .map(p => Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L))
        .sum
      (stateRows.toSeq, totalMs)
    } finally q.stop()
  }

  test("20%-hot key: state is O(keys) after every batch, never O(events)") {
    val (stateRows, _) = drive(hotEvents, "skew_hot_state")
    // keys accumulate as they first appear; once all 50 have been
    // seen, the store must hold exactly 50 rows — the hot key's 1000
    // events never add state
    assert(stateRows.last == keys.toLong,
      s"state rows ${stateRows.last} != $keys keys — state is not O(keys)")
    assert(stateRows.forall(_ <= keys.toLong),
      s"state exceeded key count mid-stream: $stateRows")
    // and the streamed output under skew is bit-identical to batch
    val streamed = spark.table("skew_hot_state")
      .orderBy("key", "tie").as[StreamSmooth.EwmaPoint].collect().toSeq
    val batch = graft.ops.Smoothing.ewmaTrace(
        hotEvents.toDF("key", "ts", "tie", "v"), "key", "ts", "tie", "v", 1, 1)
      .orderBy("key", "rn").as[(Long, Long, Long, Long)].collect().toSeq
    assert(streamed.size == events)
    assert(streamed.map(p => (p.key, p.v, p.ewma)) ==
      batch.map(r => (r._1, r._3, r._4)))
    assert(streamed.forall(_.n_late == 0L))
  }

  test("20%-hot key: total trigger time within 3x of a uniform run of the same size") {
    val (_, uniformMs) = drive(uniformEvents, "skew_uniform_t")
    val (_, hotMs) = drive(hotEvents, "skew_hot_t")
    // identical total work by design; 3x absorbs host noise while
    // still catching a per-key-history replay (~25x on this shape)
    assert(hotMs <= math.max(3L * uniformMs, uniformMs + 3000L),
      s"hot-key run ${hotMs}ms vs uniform ${uniformMs}ms — exceeds the 3x skew band")
  }

  test("holtTrace under the same hot distribution: O(keys) state and batch parity") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SmoothEvent]
    val q = StreamSmooth.holtTrace(in.toDS())
      .writeStream.format("memory").queryName("skew_hot_holt").outputMode("append").start()
    try {
      hotEvents.grouped(events / batches).foreach { b =>
        in.addData(b: _*); q.processAllAvailable()
      }
      assert(q.lastProgress.stateOperators.head.numRowsTotal == keys.toLong)
      val streamed = spark.table("skew_hot_holt")
        .orderBy("key", "tie").as[StreamSmooth.HoltPoint].collect().toSeq
      val batch = graft.ops.Smoothing.holtTrace(
          hotEvents.toDF("key", "ts", "tie", "v"), "key", "ts", "tie", "v")
        .orderBy("key", "rn").as[(Long, Long, Long, Long, Long)].collect().toSeq
      assert(streamed.map(p => (p.key, p.level, p.trend)) ==
        batch.map(r => (r._1, r._4, r._5)))
    } finally q.stop()
  }
}
