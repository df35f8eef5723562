package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch — the mergeable FREQUENCY summary, companion to
  * `Sketches` (distinct counts): a depth×width grid of counters where
  * key k increments cell (r, hash_r(k) mod width) for each row r, and
  * freq̂(k) = min_r cell(r, hash_r(k)) — an overestimate by at most
  * ε·N with probability 1−δ (ε = e/width, δ = e^−depth; Cormode &
  * Muthukrishnan 2005). The heavy-hitter / frequency-cap primitive a
  * pipeline stores per shard and merges later: cell grids add
  * element-wise, so per-day sketches roll up to any coarser grain
  * without raw rescans — same artifact contract as `Sketches`, but
  * for "how often", not "how many distinct".
  *
  * Unlike HLL registers, EVERYTHING here is deterministic integer
  * arithmetic on `Hash60(r ":" key)` — the sketch cells AND the
  * estimates are bit-identical across engines and partitionings, so
  * q_countmin is a full exact-hash oracle, not a bounded one: an
  * approximate data structure whose construction is exactly
  * reproducible.
  *
  * Scale shape: build explodes each row to `depth` (r, c) int pairs
  * that hash-aggregate with map-side partials — the shuffle carries
  * at most depth × width counter rows per map partition regardless of
  * input size (the grid, not the data). Estimates are one broadcast-
  * sized probe explode + an equi-join on (r, c). A hot key skews
  * nothing: it increments the same `depth` cells everywhere, and
  * partial aggregation collapses it map-side.
  */
object CountMin {

  private[graft] def cell(r: org.apache.spark.sql.Column, key: org.apache.spark.sql.Column,
                          width: Int): org.apache.spark.sql.Column =
    pmod(graft.plans.Hash60.hash60(
      concat_ws(":", r.cast("string"), key.cast("string"))), lit(width.toLong))

  /** Build the (r, c, cnt) cell grid over `keyCol`. Rows with NULL
    * keys are skipped (a NULL has no frequency identity). */
  def build(df: DataFrame, keyCol: String, depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2, s"need depth>=1, width>=2; got $depth x $width")
    df.where(col(keyCol).isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("r"), col(keyCol).as("__k"))
      .select(col("r"), cell(col("r"), col("__k"), width).as("c"))
      .groupBy(col("r"), col("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Element-wise merge of two cell grids built with the same
    * (depth, width) — the rollup step over stored sketch frames. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("r"), col("c"))
      .agg(sum(col("cnt")).as("cnt"))

  /** freq̂ for each distinct probe key: min over rows of its cells
    * (an absent cell is 0 — no key ever hashed there). Output:
    * keyCol, est (BIGINT, ≥ true frequency). */
  def estimate(cells: DataFrame, probes: DataFrame, keyCol: String,
               depth: Int = 4, width: Int = 1024): DataFrame = {
    val probeCells = probes.select(col(keyCol)).where(col(keyCol).isNotNull).distinct()
      .select(col(keyCol), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("c", cell(col("r"), col(keyCol), width))
    probeCells.join(cells, Seq("r", "c"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
