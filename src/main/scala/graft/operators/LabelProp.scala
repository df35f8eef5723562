package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan,
  * Albert & Kumara 2007, made deterministic): every node starts
  * labeled with its own id; each round, every node simultaneously
  * adopts the most frequent label among ITSELF and its in-neighbors,
  * ties broken by the SMALLEST label. Communities emerge as label
  * plateaus after a few rounds.
  *
  * Determinism contract: the original LPA breaks ties randomly and
  * updates asynchronously in a random node order — neither replays
  * across engines or partitionings. This variant is synchronous
  * (all nodes update from the round-t labels) with a total
  * (count DESC, label ASC) vote order, so round t+1 is a pure
  * function of round t and the whole run replays verbatim as an
  * unrolled SQL replica. The SELF-vote is the standard damping for
  * synchrony's textbook failure mode: neighbor-only synchronous
  * votes flip a connected pair's labels forever (period-2
  * oscillation on bipartite regions); counting the node's own
  * current label anchors plateaus once formed. Oscillation is
  * damped, not impossible, so the operator still runs a FIXED
  * iteration count (the caller picks the analysis horizon) instead
  * of pretending a fixpoint test terminates.
  *
  * Scale shape per round — exactly the PageRank loop body: one
  * equi-join of the edge list (hash-partitioned by src once, cached)
  * against the O(nodes) label frame, then two hash aggregates
  * ((dst, label) vote counts, then the arg-min pick as a struct
  * min — partial-aggregable, no window). Eager checkpoint per round
  * keeps the plan constant-size (`Checkpoints.truncate`; pass a
  * reliable checkpoint dir on real clusters, same contract as
  * `PageRank.ranks`).
  */
object LabelProp {

  /** (id, lab) after `iters` synchronous rounds over the directed
    * edge list (src votes into dst; every node also votes for
    * itself). Feed a symmetrized edge list for undirected semantics.
    * A node with no in-edges keeps its current label (its self-vote
    * is unopposed).
    */
  def labels(edges: DataFrame, iters: Int, partitions: Int = 32): DataFrame = {
    require(iters >= 1, s"labels: iters must be >= 1, got $iters")
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .repartition(partitions, col("src"))
      .persist()
    var lab = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .select(col("id"), col("id").as("lab"))
      .transform(graft.ops.Checkpoints.truncate)
    for (_ <- 1 to iters) {
      val votes = e
        .join(lab.select(col("id").as("src"), col("lab")), Seq("src"))
        .select(col("dst").as("id"), col("lab"))
        .unionByName(lab) // the self-vote
        .groupBy(col("id"), col("lab"))
        .agg(count(lit(1)).as("c"))
      // arg-min over (-count, label): most votes, then smallest label
      lab = votes
        .groupBy(col("id"))
        .agg(min(struct((-col("c")).as("nc"), col("lab").as("lab"))).as("m"))
        .select(col("id"), col("m.lab").as("lab"))
        .transform(graft.ops.Checkpoints.truncate)
    }
    e.unpersist(blocking = false)
    lab
  }

  /** Community roll-up: per final label, member count — the usual
    * summary read of an LPA run. */
  def communities(edges: DataFrame, iters: Int): DataFrame =
    labels(edges, iters)
      .groupBy(col("lab").as("community"))
      .agg(count(lit(1)).as("n_members"))
}
