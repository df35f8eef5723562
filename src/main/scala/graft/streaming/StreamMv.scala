package graft.streaming

import graft.sources.{MaterializedView, Snapshots}
import org.apache.spark.sql.DataFrame

/** Continuously-maintained materialized views: a streaming source
  * lands in a snapshot BASE table exactly once per micro-batch (the
  * [[StreamSnapshot]] tag ledger), and the aggregate VIEW folds each
  * batch in incrementally ([[graft.sources.MaterializedView]]'s
  * delta maintenance) — the two table-side ledgers compose into an
  * end-to-end exactly-once pipeline from stream to queryable
  * aggregate:
  *
  *  - replayed micro-batch → base commit is a no-op (its `batch=` tag
  *    exists) → `changesSince(reflected)` sees no new version → view
  *    refresh is a no-op;
  *  - crash between base commit and view refresh → on replay the base
  *    skips but the view's reflected version (its `mv.base=` tag)
  *    still trails HEAD, so the refresh folds exactly the missed
  *    files — the view CATCHES UP rather than double-counts;
  *  - crash between view commit and checkpoint advance → replay hits
  *    two no-ops.
  *
  * Per micro-batch cost: |batch| for the base append + |batch
  * aggregate| + |touched view files| for the fold — independent of
  * base history, which is what lets the pattern run indefinitely.
  * Readers query the view table directly (time-traveling its own
  * history if they want the aggregate as-of any batch).
  */
object StreamMv {

  /** The foreachBatch function: append the batch to `baseDir`
    * exactly once, then fold it into the `viewDir` aggregate. The
    * view must have been bootstrapped with
    * [[MaterializedView.fullRefresh]] (empty-base bootstrap works:
    * commit an empty frame first). */
  def sink(baseDir: String, viewDir: String, key: String,
           sumCols: Seq[String]): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val tag = s"batch=$batchId"
      if (!Snapshots.committedTags(baseDir).contains(tag))
        Snapshots.commit(batch, baseDir, "append", Some(tag))
      // always attempt the fold: it no-ops when the view is current,
      // and catches up after a crash that landed the base commit only
      MaterializedView.refresh(batch.sparkSession, baseDir, viewDir, key, sumCols)
    }
}
