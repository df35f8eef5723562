package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperBall (Boldi & Vigna, "In-core computation of geometric
  * centralities with HyperBall", 2013; HyperANF, WWW 2011) — the
  * neighborhood function at graph scale: for every node, an
  * HLL-sketched estimate of |ball(v, r)|, the number of nodes within
  * r hops. The algorithm behind "four degrees of separation":
  * exact per-node balls need O(|V|²) state, but an HLL counter per
  * node makes the whole computation r rounds of associative
  * register max-merges — pure joins and aggregates, no per-node
  * traversal.
  *
  * Built on [[PortableHll]]'s register rows (id, reg, r): round 0
  * seeds each node's counter with itself; each round, v's counter
  * max-merges the counters of its out-neighbors (ball_r(v) =
  * {v} ∪ ⋃_{v→u} ball_{r−1}(u)). Max-merge is associative,
  * commutative, idempotent — so the rounds are partitioning-
  * independent AND replayable in any engine: q_hyperball unrolls
  * two rounds in DuckDB and hash-matches the ESTIMATES, the same
  * cross-engine contract as q_hll_portable (no other distributed
  * HyperBall has an exact oracle; this one does because the
  * registers are deterministic integers).
  *
  * Complement to [[Bfs]]: BFS gives exact distances from ONE seed
  * set in O(reached) work; HyperBall gives approximate ball SIZES
  * for EVERY node simultaneously in O(r · |E| · m̄) register
  * traffic (m̄ = live registers per counter ≤ min(ball, 2^lgK)) —
  * the only feasible shape for all-pairs reachability statistics at
  * 100 TB. Per round: one equi-join on dst + one (id, reg) hash
  * aggregate with map-side partials; lineage truncated per round
  * ([[graft.ops.Checkpoints]] durability contract).
  *
  * NULL edge endpoints fail loud (the Bfs policy — a dropped edge
  * silently shrinks downstream balls).
  */
object HyperBall {

  /** Per-node register rows after `rounds` merges — the mergeable
    * artifact (write it once, estimate many radii downstream). */
  def ballRegisters(edges: DataFrame, rounds: Int, lgK: Int = 7): DataFrame = {
    require(rounds >= 1 && rounds <= 30, s"rounds in [1,30], got $rounds")
    val e0 = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val bad = e0.where(col("src").isNull || col("dst").isNull).limit(1).collect()
    require(bad.isEmpty,
      "HyperBall: NULL edge endpoint - a silently dropped edge would " +
        "shrink every downstream ball; clean the edge list explicitly")
    val e = e0.transform(graft.ops.Checkpoints.truncate)
    val nodes = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .distinct()
    var c = PortableHll.registers(nodes, Seq("id"), "id", lgK)
      .transform(graft.ops.Checkpoints.truncate)
    for (_ <- 1 to rounds) {
      val absorbed = c.join(e, c("id") === e("dst"))
        .select(e("src").as("id"), col("reg"), col("r"))
      c = c.unionByName(absorbed)
        .groupBy(col("id"), col("reg")).agg(max(col("r")).as("r"))
        .transform(graft.ops.Checkpoints.truncate)
    }
    c
  }

  /** (id, ball_est): estimated |ball(id, rounds)| for every node —
    * ball_est ≥ 1 (a node always sees itself). */
  def ballSizes(edges: DataFrame, rounds: Int, lgK: Int = 7): DataFrame =
    PortableHll.estimate(ballRegisters(edges, rounds, lgK), Seq("id"), lgK,
      out = "ball_est")
}
