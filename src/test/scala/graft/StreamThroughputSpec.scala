package graft

import java.nio.file.Files

import graft.streaming.StreamPipelineBench

/** r13 verdict item #8's spec half: the end-to-end streaming chain
  * (paged source → dedup ingest → hourly windows → exactly-once
  * snapshot sink) holds BOUNDED state across ≥3 triggers at two
  * volumes — the property that makes the rows/s numbers in
  * SCALE_NOTES' streaming table meaningful at 100 TB: state is
  * O(windows in the watermark horizon × locations), never O(rows
  * ingested), so tripling the event volume must not move the state
  * ceiling. */
class StreamThroughputSpec extends SparkSpec {

  private val locations = 5
  private val spanHours = 48
  private val pages = 6 // 8-hour pages; watermark 2h → horizon ≪ span

  private def runVolume(volume: Int): StreamPipelineBench.Result = {
    val root = Files.createTempDirectory(s"graft-stp-$volume")
    StreamPipelineBench.run(spark, volume, pages, locations, spanHours,
      root.toString)
  }

  test("streaming state stays bounded across >=3 triggers at two volumes") {
    val r1 = runVolume(1200)
    val r2 = runVolume(3600)
    for (r <- Seq(r1, r2)) {
      assert(r.triggers.size >= 3)
      // every trigger processed its page and the chain kept up
      assert(r.triggers.forall(_.rows > 0))
      assert(r.cleanRows > 0 && r.cleanRows < r.volume,
        s"dedup gate did no work: clean=${r.cleanRows} of ${r.volume}")
      // snapshot versions are exactly-once micro-batch commits
      assert(r.snapshotVersions >= 1)
      // BOUNDED state: the watermark horizon holds at most ~(page
      // span + watermark + 1 boundary hour + one-trigger watermark
      // lag) open hourly windows per location — far below the run's
      // total window count (spanHours × locations). The factor-2
      // slack absorbs trigger alignment; the bound must NOT scale
      // with rows.
      val horizonWindows = (spanHours / pages + 2 + 1 + spanHours / pages) * 2
      val cap = horizonWindows.toLong * locations
      val maxState = r.triggers.map(_.stateRows).max
      assert(maxState <= cap,
        s"state ${maxState} exceeds horizon bound $cap at volume ${r.volume} " +
          s"(total windows would be ${spanHours * locations})")
      // ...and state is flat across late triggers, not accumulating:
      // the last trigger holds no more than twice the mid-run state
      val mid = r.triggers(r.triggers.size / 2).stateRows
      val last = r.triggers.last.stateRows
      assert(last <= math.max(mid, 1L) * 2,
        s"state grew across triggers: mid=$mid last=$last (volume ${r.volume})")
    }
    // volume-independence: 3× the rows must not move the state
    // ceiling (same windows, same locations — state measures TIME
    // structure, not data volume)
    val m1 = r1.triggers.map(_.stateRows).max
    val m2 = r2.triggers.map(_.stateRows).max
    assert(m2 <= m1 * 3 / 2 + 5,
      s"state ceiling scaled with volume: $m1 @1200 rows vs $m2 @3600 rows")
  }
}
