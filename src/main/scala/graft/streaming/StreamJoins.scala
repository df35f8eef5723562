package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream and stream-static joins (SURVEY §2.9 extension):
  * the streaming forms of the batch join operators, with the state
  * bounds Structured Streaming requires spelled out.
  */
object StreamJoins {

  /** Inner stream-stream join on `key` where the right event lands
    * within [leftTs - tolerance, leftTs + tolerance]. Both sides are
    * watermarked: the event-time range condition is what lets Spark
    * EVICT buffered rows — without it a stream-stream join buffers
    * both streams forever. State per side is bounded by
    * watermark + tolerance, so at scale this holds O(rate × window)
    * rows per key-partition, independent of stream length.
    *
    * Column contract: both sides keep their own column names; `key`
    * is the equi-join column, `leftTs`/`rightTs` the event-time
    * columns. The range condition binds through side-qualified
    * references, so a column on the opposite side sharing the
    * event-time name can neither make the condition ambiguous nor
    * silently bind to the wrong side.
    */
  def withinTolerance(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String,
                      tolerance: String, watermark: String = "1 hour"): DataFrame =
    toleranceJoin(left, right, key, leftTs, rightTs, tolerance, watermark, "inner")

  /** LEFT OUTER form of `withinTolerance`: left rows with no right
    * match within the tolerance window still emit, with the right
    * side NULL — but only once the WATERMARK has passed the point
    * where a match could still arrive (left ts + tolerance). That
    * delay is inherent to outer stream-stream joins: "no match" is
    * only decidable when the right stream is provably complete for
    * the window, so unmatched results trail the watermark rather
    * than the data. Matched rows emit immediately, like the inner
    * join. State bounds are identical to the inner form.
    */
  def withinToleranceOuter(left: DataFrame, right: DataFrame, key: String,
                           leftTs: String, rightTs: String,
                           tolerance: String, watermark: String = "1 hour"): DataFrame =
    toleranceJoin(left, right, key, leftTs, rightTs, tolerance, watermark, "left_outer")

  /** One definition of the watermark + key + interval condition, so
    * the inner and outer forms cannot drift apart. */
  private def toleranceJoin(left: DataFrame, right: DataFrame, key: String,
                            leftTs: String, rightTs: String, tolerance: String,
                            watermark: String, joinType: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $tolerance") &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $tolerance"),
      joinType)
      .drop(r(key))
  }

  /** Stream-static dimension enrichment: a broadcast-style join of a
    * stream against a batch dim table. Stateless — each micro-batch
    * joins against the CURRENT dim snapshot (re-read per batch for
    * file sources, so slowly-changing dims pick up updates). */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")
}
