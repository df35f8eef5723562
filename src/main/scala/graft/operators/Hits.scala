package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs-and-authorities (Kleinberg 1999) in exact integer
  * arithmetic — the directed-graph companion to `PageRank.ranks`:
  * a good HUB points at good authorities, a good AUTHORITY is
  * pointed at by good hubs. On a bipartite reference graph
  * (part → supplier) the split is natural: parts score as hubs,
  * suppliers as authorities.
  *
  * Exactness: the float formulation L2-normalizes each half-step —
  * partition-order-dependent in IEEE arithmetic and unreplayable
  * across engines. Here scores are BIGINTs seeded at 1; each
  * half-step is an integer sum over in/out-neighbors followed by an
  * integer rescale `x div ceil(max/SCALE)` that caps scores at
  * ~SCALE=10^9 (pure floor divisions — no multiplication, so no
  * overflow for in-degrees up to 2^33). Truncation is part of the
  * contract, the `PageRank` integer-damping precedent: every engine
  * and every partitioning reproduces the same bits, and the oracle
  * replays the run as an unrolled SQL replica with scalar-subquery
  * rescale divisors.
  *
  * Scale shape per half-step — the PageRank loop body: one equi-join
  * of the edge list (partitioned by the gathering side, cached both
  * ways) with the O(nodes) score frame, one hash aggregate, plus one
  * O(1)-row driver max() for the rescale divisor (same driver-scalar
  * budget as PageRank's convergence count). Eager checkpoint per
  * iteration keeps plans constant-size; pass a reliable checkpoint
  * dir on real clusters (`Checkpoints.truncate` contract).
  */
object Hits {

  private val Scale = 1000000000L

  /** (id, hub, auth) after `iters` full iterations over the directed
    * edge list. Every node appearing as src or dst is scored; a node
    * with no out-edges has hub = rescaled 0, likewise auth for no
    * in-edges.
    */
  def scores(edges: DataFrame, iters: Int, partitions: Int = -1): DataFrame = {
    require(iters >= 1, s"scores: iters must be >= 1, got $iters")
    // partition count defaults to the SESSION's shuffle parallelism
    // (r15): the loop's aggregates and score checkpoints land on
    // numShufflePartitions, so an edge cache at any other count can
    // never prove co-partitioning and the static planner inside the
    // fused loop would re-exchange it every half-step
    val p = if (partitions > 0) partitions
      else edges.sparkSession.sessionState.conf.numShufflePartitions
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .repartition(p, col("src"))
      .persist()
    // the hub half-step gathers by dst — keep a dst-partitioned copy
    // cached too, so neither half-step re-exchanges the edge list
    val eByDst = e.repartition(p, col("dst")).persist()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .transform(graft.ops.Checkpoints.truncate)
      .persist()

    def rescaled(scored: DataFrame, c: String): DataFrame = {
      // checkpoint FIRST: the divisor's max() is a driver action, and
      // on the raw frame it would run the half-step pipeline once for
      // the max and AGAIN when the next round consumes the frame —
      // truncating up front materializes the gather-sum exactly once,
      // and the rescale stays a narrow projection over the
      // materialized scan (constant-size plans, no second job).
      // Measured r15: neither the fused lazy cut nor an AQE-off loop
      // helps here — each half-step ends in the max() action anyway,
      // and the AQE-off variant lost the runtime broadcasts of the
      // O(|V|) score frames into the cached edge join (1.37×); this
      // operator keeps the r14 shape.
      val t = graft.ops.Checkpoints.truncate(scored)
      val mx = t.agg(max(col(c))).first() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
      val d = math.max(1L, (mx + Scale - 1L) / Scale)
      t.withColumn(c, expr(s"$c div ${d}L"))
    }

    var hub = nodes.select(col("id"), lit(1L).as("hub"))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      // authority pull: sum of hub scores over in-edges
      val aRaw = nodes
        .join(e.join(hub.select(col("id").as("src"), col("hub")), Seq("src"))
            .groupBy(col("dst").as("id")).agg(sum(col("hub")).as("auth")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("auth"), lit(0L)).as("auth"))
      auth = rescaled(aRaw, "auth")
      // hub pull: sum of authority scores over out-edges
      val hRaw = nodes
        .join(eByDst.join(auth.select(col("id").as("dst"), col("auth")), Seq("dst"))
            .groupBy(col("src").as("id")).agg(sum(col("auth")).as("hub")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("hub"), lit(0L)).as("hub"))
      hub = rescaled(hRaw, "hub")
    }
    val out = hub.join(auth, Seq("id"))
    e.unpersist(blocking = false)
    eByDst.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out.select(col("id"), col("hub"), col("auth"))
  }
}
