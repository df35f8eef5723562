package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming curation-funnel audit: the per-window form of
  * `ops.Funnel` — survivor counts through the cumulative filter
  * stages, per event-time tumbling window, finalized by watermark.
  *
  * The audit a streaming ingest actually needs ("how much of the
  * last hour's crawl survived language ID / quality / sampling?")
  * is exactly the batch funnel's conditional aggregation grouped by
  * `window(ts)`: one stateful aggregate whose state is one row of
  * counters per open window — bounded by the watermark horizon,
  * independent of row volume. Append output mode means a window's
  * row is emitted once, complete, when the watermark passes its end
  * (the same finalize-then-emit contract as `StreamingRecap`).
  */
object StreamFunnel {

  /** (window_start, window_end, n_raw, n_<stage>…) per tumbling
    * window of `windowDuration`, finalized `watermarkDelay` after the
    * window closes. Write with `outputMode("append")`. */
  def windowed(df: DataFrame, tsCol: String, windowDuration: String,
               watermarkDelay: String, stages: Seq[(String, Column)]): DataFrame = {
    val aggs = graft.ops.Funnel.stageAggs(stages)
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration).as("w"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("w.start"))
      .withColumn("window_end", col("w.end"))
      .drop("w")
  }
}
