package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches — the re-aggregatable rollup
  * artifact a 100 TB pipeline stores INSTEAD of raw keys.
  *
  * `approx_count_distinct` (the engine-private fast path) answers one query;
  * what it cannot do is answer NEXT month's query without re-reading
  * this month's raw data. A stored sketch can: HLL sketches union
  * associatively and commutatively, so kilobyte-sized per-(day,
  * group) sketch rows roll up to weekly/monthly/all-time distincts
  * with a groupBy over sketch bytes — no raw-data rescan, no
  * partition-order dependence (register-wise max is order-free).
  * This is the standard lakehouse pre-aggregation contract
  * (Datasketches HLL, the library Spark 4 ships: `hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate`, all codegen-adjacent
  * native aggregates with map-side partials).
  *
  * Reference analogue: the reference recomputes per-city distinct
  * observation counts by re-scanning the full Mongo collection each
  * run (`dags/spark/load_to_mongo.py` truncate-and-reload); a sketch
  * column per (city, day) would make that an incremental merge.
  *
  * Scale shape: `sketch` is a binary column of ≤ 2^lgK registers
  * (lgK=12 → ~2.5 KB fixed, independent of cardinality). Building
  * shuffles one sketch per group per partition (map-side combined);
  * rolling up shuffles only stored sketch rows. Estimates carry the
  * standard HLL error: rsd ≈ 1.04/√2^lgK (~1.6% at lgK=12),
  * spec-bounded at 3σ against exact counts (SketchRollupSpec) since
  * sketch bytes are engine-private and cannot hash-match a DuckDB
  * oracle.
  */
object Sketches {

  /** Per-group mergeable sketch of `valueCol`'s distinct values.
    * Output: groupCols + `sketch` (binary). This is the stored
    * artifact — write it with any sink, partitioned by the finest
    * rollup grain (e.g. day). */
  def distinctSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Re-aggregate stored sketches to a coarser grain (day → month,
    * (source, day) → source, … ) — touches ONLY sketch rows, never
    * raw data. `groupCols` may be empty for a grand total. */
  def rollup(df: DataFrame, groupCols: Seq[String],
             sketchCol: String = "sketch"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col(sketchCol), lit(true)).as("sketch"))

  /** Materialize the distinct-count estimate for each sketch row. */
  def estimate(df: DataFrame, sketchCol: String = "sketch",
               out: String = "distinct_est"): DataFrame =
    df.withColumn(out, hll_sketch_estimate(col(sketchCol)))
}
