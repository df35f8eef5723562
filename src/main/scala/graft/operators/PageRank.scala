package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank in exact fixed-point arithmetic — the iterative graph
  * centrality complement to `Components` (which finds WHO is
  * connected; this ranks HOW central).
  *
  * Floating-point PageRank is shuffle-order-dependent (per-target
  * double sums), so two runs of the same data can differ in late
  * digits and no cross-engine oracle can exist. This implementation
  * keeps every rank as a scaled BIGINT: contributions are floor
  * divisions `rank div outdeg`, the damping step is
  * `base + (num · Σcontrib) div den` with d = num/den, and integer
  * sums are order-free — the result is bit-identical across runs,
  * partitionings, and engines (q_pagerank hash-matches an unrolled
  * DuckDB replica). The price is a deterministic floor-rounding
  * drift ≤ outdeg ulps per node per iteration — invisible at the
  * 1e9 scale and identical everywhere.
  *
  * Semantics: the simplified dangling-mass-dropping variant (a node
  * with no out-edges contributes nothing; total mass then decays
  * toward N·base/(1−d) instead of being redistributed) — standard
  * for ranking use, where only relative order matters, and the
  * variant an unrolled SQL oracle can replicate cheaply.
  *
  * Scale shape: one equi-join (edges ⋈ ranks on src, both sides
  * shuffle-partitioned by src — co-partitionable by pre-bucketing
  * edges) plus one hash aggregate by dst per iteration; the rank
  * frame is one long per node. `localCheckpoint` every iteration
  * truncates the plan to constant size (the `Components` loop
  * lesson), so 20 iterations cost 20 bounded shuffles, not an
  * exponentially deep lineage.
  */
object PageRank {

  /** Ranks after `iters` synchronous iterations over directed
    * `edges` (src, dst BIGINT; parallel edges count once per
    * occurrence — pre-`distinct` if multiplicity is noise). Output:
    * (id, rank) with rank in units of 1/`scale`, initial rank =
    * scale. Damping d = dampNum/dampDen (default 17/20 = 0.85). */
  def ranks(edges: DataFrame, iters: Int = 5, scale: Long = 1000000000L,
            dampNum: Long = 17L, dampDen: Long = 20L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters in [1,50], got $iters")
    require(dampNum > 0 && dampDen > dampNum, "need 0 < dampNum < dampDen")
    require(scale * (dampDen - dampNum) % dampDen == 0,
      s"base (1-d)*scale = $scale*(${dampDen - dampNum}/$dampDen) must be an exact integer")
    val base = scale * (dampDen - dampNum) / dampDen
    val e = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .distinct().localCheckpoint(true)
    // Overflow guard: total mass never exceeds N·scale (the damping
    // step contracts it), so a single node's incoming sum is bounded
    // by N·scale and the damping multiply by dampNum·N·scale — which
    // must fit a Long, or a mega-hub would silently wrap negative
    // under non-ANSI arithmetic. N is already materialized
    // (checkpointed), so the count is a cheap metadata-ish job.
    val n = nodes.count()
    require(java.math.BigInteger.valueOf(dampNum)
      .multiply(java.math.BigInteger.valueOf(n))
      .multiply(java.math.BigInteger.valueOf(scale))
      .bitLength() < 63,
      s"PageRank: dampNum*N*scale = $dampNum*$n*$scale can overflow Long - " +
        "lower `scale` (rank resolution) for graphs this large")
    val withDeg = e.join(
      e.groupBy(col("src")).agg(count(lit(1)).as("__deg")), "src")
      .localCheckpoint(true)
    var r = nodes.withColumn("rank", lit(scale))
    for (_ <- 0 until iters) {
      val sums = withDeg.join(r, withDeg("src") === r("id"))
        .select(col("dst").as("id"), expr("rank div __deg").as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__s"))
      r = nodes.join(sums, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(s"($dampNum * coalesce(__s, 0L)) div $dampDen")).as("rank"))
        .localCheckpoint(true)
    }
    r
  }
}
