package graft.streaming

import graft.sources.Snapshots
import org.apache.spark.sql.DataFrame

/** Exactly-once streaming commits into a [[graft.sources.Snapshots]]
  * table — the `foreachBatch` sink that turns Structured Streaming's
  * at-least-once micro-batch replay into exactly-once table versions.
  *
  * Mechanism: each micro-batch commits as ONE snapshot version whose
  * manifest carries the tag `batch=<batchId>`. Before committing,
  * the sink consults the table's tag ledger (`committedTags` — an
  * O(retained versions) read of the small `_snapshots/` directory):
  * a replayed batch finds its own tag and SKIPS, so a crash between
  * "manifest published" and "checkpoint advanced" — the classic
  * double-write window every foreachBatch sink has — re-runs the
  * batch as a no-op instead of double-appending. The commit itself
  * is the atomic hard-link publish, so a crash BEFORE the manifest
  * lands leaves only invisible un-manifested data files (vacuum
  * fodder), never a torn version.
  *
  * This is the same idempotence contract `StreamScd2`/`StreamCdc`
  * get from generation-versioned state, expressed at the TABLE
  * layer: downstream readers time-travel micro-batch history for
  * free (version N = the table after batch N), and `vacuum` bounds
  * retention.
  *
  * Scale: one manifest per micro-batch is the real-world Delta/
  * Iceberg streaming-sink shape; the ledger read is metadata-sized.
  * Compact the accumulated small files periodically with
  * `ops.Compaction.plan` over `Snapshots.liveFiles` + an `overwrite`
  * commit — both halves already exist in this library.
  */
object StreamSnapshot {

  /** The foreachBatch function: append (or overwrite with) each
    * micro-batch as a tagged snapshot version, exactly once per
    * batchId. Usage:
    * {{{
    *   stream.writeStream
    *     .foreachBatch(StreamSnapshot.sink(tableDir))
    *     .option("checkpointLocation", ckpt).start()
    * }}} */
  def sink(tableDir: String, mode: String = "append"): (DataFrame, Long) => Unit = {
    require(mode == "append" || mode == "overwrite",
      s"mode must be append|overwrite, got '$mode'")
    (batch: DataFrame, batchId: Long) => {
      val tag = s"batch=$batchId"
      if (!Snapshots.committedTags(tableDir).contains(tag))
        Snapshots.commit(batch, tableDir, mode, Some(tag))
    }
  }
}
