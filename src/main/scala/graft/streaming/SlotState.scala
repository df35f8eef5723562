package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Custom keyed state for the keep-first-per-slot semantics under
  * late data (reference J6/ST3): the first observation per
  * (location, 10-minute slot) must win by obs_id order even when a
  * *smaller* obs_id arrives in a later micro-batch — something a
  * plain streaming aggregation can express (min_by) but whose state
  * lifecycle (timeout = watermark horizon) we control explicitly
  * here with mapGroupsWithState, per the engine's custom-state
  * surface (KeyValueGroupedDataset).
  *
  * Emits the current winner for every group touched in a batch
  * (update semantics); state for a slot is dropped once the event-time
  * watermark passes it.
  */
object SlotState {

  case class SlotObs(obs_id: Long, location_id: Long, ts: Timestamp, temp_c: Double, condition: String)
  case class SlotKey(location_id: Long, slot_start: Timestamp)
  case class FirstObs(obs_id: Long, temp_c: Double, condition: String)
  case class SlotWinner(location_id: Long, slot_start: Timestamp, obs_id: Long,
                        temp_c: Double, condition: String, n_seen: Long)

  // flat state: a nested case-class field here trips the state
  // encoder's generated-code method resolution (field named `first`)
  private[streaming] case class State(winnerId: Long, winnerTemp: Double, winnerCond: String, nSeen: Long)

  private def updateState(key: SlotKey, rows: Iterator[SlotObs],
                          state: GroupState[State]): Iterator[SlotWinner] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val batch = rows.toSeq
      val incoming = batch.minBy(_.obs_id)
      val merged = state.getOption match {
        case Some(s) if s.winnerId <= incoming.obs_id =>
          s.copy(nSeen = s.nSeen + batch.size)
        case Some(s) =>
          State(incoming.obs_id, incoming.temp_c, incoming.condition, s.nSeen + batch.size)
        case None =>
          State(incoming.obs_id, incoming.temp_c, incoming.condition, batch.size.toLong)
      }
      state.update(merged)
      // keep state until the watermark passes the slot end
      state.setTimeoutTimestamp(key.slot_start.getTime + 10 * 60 * 1000)
      Iterator.single(SlotWinner(key.location_id, key.slot_start,
        merged.winnerId, merged.winnerTemp, merged.winnerCond, merged.nSeen))
    }
  }

  /** Streaming transform: watermarked obs → per-slot winners with
    * explicit state lifecycle. Works on batch Datasets too (state is
    * per-invocation there). */
  def slotWinners(obs: Dataset[SlotObs], watermark: String = "30 minutes"): Dataset[SlotWinner] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs
      .withWatermark("ts", watermark)
      .groupByKey(o => SlotKey(o.location_id,
        new Timestamp(o.ts.getTime - Math.floorMod(o.ts.getTime, 10 * 60 * 1000))))
      .flatMapGroupsWithState[State, SlotWinner](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout())(updateState)
  }
}
