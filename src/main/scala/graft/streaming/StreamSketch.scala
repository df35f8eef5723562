package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sketch builds — the incremental producer side of the
  * stored-sketch contract (`operators.PortableHll` / `CountMin` /
  * `QuantileSketch` are the batch builders and consumers).
  *
  * A 100 TB pipeline does not recompute last month's registers from
  * raw events; it STREAMS today's register rows out as micro-batches
  * close, and batch rollups merge them later. That works because
  * every sketch here merges by max (HLL registers) or sum (bin
  * counts): both are associative and commutative, and max is also
  * idempotent — an update-mode re-emission or an at-least-once sink
  * re-delivering a register frame can only repeat the same-or-higher
  * value, never corrupt it. (Sum-merged counters do NOT get that
  * last property for free; dedup re-deliveries by (window, group,
  * bin) version — e.g. `Sinks.upsertPartitions` keyed on the window
  * — exactly as StreamingRecap's gold sink does.)
  *
  * Scale shape: state per (window, group, reg) key is one small
  * integer — bounded by m × groups per window, independent of event
  * volume; the watermark expires closed windows so state cannot
  * accrete. This is a plain watermarked streaming aggregation
  * (incremental, update- or append-capable), not a custom stateful
  * operator.
  */
object StreamSketch {

  /** Tumbling-window portable-HLL registers over a stream: the
    * streaming form of `PortableHll.registers` with a `window`
    * struct prepended. Append mode emits each (window, group, reg,
    * r) once, when the watermark closes the window; update mode
    * emits refinements per micro-batch (safe — see class doc). */
  def windowedRegisters(events: DataFrame, tsCol: String, windowDur: String,
                        watermarkDelay: String, groupCols: Seq[String],
                        valueCol: String, lgK: Int = 10): DataFrame = {
    require(lgK >= 4 && lgK <= 16, s"lgK must be in [4,16], got $lgK")
    events.where(col(valueCol).isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy((window(col(tsCol), windowDur) +: groupCols.map(col) :+
        graft.operators.PortableHll.regCol(col(valueCol), lgK).as("reg")): _*)
      .agg(max(graft.operators.PortableHll.rhoCol(col(valueCol), lgK)).as("r"))
  }

  /** Tumbling-window count-min cell grids: the streaming form of
    * `CountMin.build`, one (window, group, r, c, cnt) row per
    * touched cell. Each (window, group) SLICE of the output is a
    * batch-shaped (r, c, cnt) grid: select one slice (or sum cnt by
    * (r, c) over the window range you want) and `CountMin.merge` /
    * `CountMin.estimate` apply unchanged — `merge` itself keys on
    * (r, c) only, so hand it per-slice frames, not the raw
    * multi-window output (StreamSketchSpec's grid leg shows the
    * slice-then-merge shape).
    *
    * Delivery contract — stricter than the register sketches: grid
    * cells merge by SUM, which is associative/commutative but NOT
    * idempotent, so a re-delivered frame double-counts where a
    * re-delivered max-merged register row is harmless. Safe modes:
    * append (emit-on-close) into an exactly-once sink, or update
    * mode into a KEYED upsert on (window, groupCols, r, c) —
    * refinements are cumulative per key, so the upsert overwrite is
    * correct and re-deliveries of a closed window rewrite identical
    * values (`Sinks.upsertPartitions` keyed on the window, the
    * StreamingRecap gold-sink pattern). A blind sum-merging sink in
    * update mode, or at-least-once append without dedup, corrupts
    * counts — generation-version the frames if the sink cannot key. */
  def windowedGrid(events: DataFrame, tsCol: String, windowDur: String,
                   watermarkDelay: String, groupCols: Seq[String],
                   keyCol: String, depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2, s"need depth>=1, width>=2; got $depth x $width")
    events.where(col(keyCol).isNotNull)
      .select((col(tsCol) +: groupCols.map(col) :+ col(keyCol).as("__k")): _*)
      .withColumn("r", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("c", graft.operators.CountMin.cell(col("r"), col("__k"), width))
      .withWatermark(tsCol, watermarkDelay)
      .groupBy((window(col(tsCol), windowDur) +: groupCols.map(col) :+
        col("r") :+ col("c")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Tumbling-window quantile-sketch bin counts: the streaming form
    * of `QuantileSketch.build`. Use APPEND mode (emit-on-close) when
    * the sink sum-merges blindly; update mode only with a keyed
    * upsert sink (counts re-emit cumulatively per refinement). */
  def windowedBins(events: DataFrame, tsCol: String, windowDur: String,
                   watermarkDelay: String, groupCols: Seq[String],
                   valueCol: String, subBits: Int = 5): DataFrame = {
    require(subBits >= 1 && subBits <= 16, s"subBits must be in [1,16], got $subBits")
    val s = subBits
    val small = 1L << s
    val v0 = col(valueCol).cast("long")
    val v = when(v0 < 0L,
      raise_error(concat(lit(s"StreamSketch: negative value in $valueCol: "),
        v0.cast("string"))).cast("long"))
      .otherwise(v0)
    val b = graft.plans.FloorLog2.floorLog2(col("__v"))
    val binId = when(col("__v") < small, col("__v"))
      .otherwise((col("__b") - lit(s - 1)) * small +
        (expr(s"shiftright(__v, cast(__b as int) - $s)") - small))
    events.where(col(valueCol).isNotNull)
      .withColumn("__v", v)
      .withColumn("__b", b)
      .withColumn("bin", binId)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy((window(col(tsCol), windowDur) +: groupCols.map(col) :+ col("bin")): _*)
      .agg(count(lit(1)).as("cnt"))
  }
}
