package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph quality statistics: Newman modularity of a node
  * partition and the degree assortativity coefficient — the two
  * numbers that tell you whether a community structure is real
  * (modularity of the `LabelProp` labels vs. a random graph's ~0)
  * and whether hubs attach to hubs or to leaves (assortativity sign).
  *
  * Both follow the repo's exactness ladder: every SUM is over exact
  * integers (order-free, partition-independent); IEEE arithmetic
  * appears only in the final per-row formula, mirrored token for
  * token in the oracle, with nano-rounding where a result is summed
  * further. Integer sums bound: degree products up to ~2^62 — fine
  * for graphs to ~10^9 edges; past that move the three sums to
  * DECIMAL(38,0) (still exact and order-free), stated here rather
  * than silently overflowing.
  *
  * Scale shape: one degree aggregate over the edge list, one or two
  * edge-side equi-joins against the O(nodes) degree/label frames,
  * then per-community (modularity) or global (assortativity)
  * integer-sum aggregates. Nothing iterative, no windows.
  */
object GraphStats {

  /** Per-community Newman modularity contributions over a SYMMETRIC
    * edge list and a (id, lab) partition frame. With m2 = |directed
    * edges| = 2·|undirected|, intra_c = directed edges with both
    * endpoints labeled c, and D_c = total degree of c's nodes:
    *
    *   Q_c = intra_c/m2 − (D_c/m2)²,  Q = Σ_c Q_c
    *
    * Output: lab, intra_edges, degree_mass (exact BIGINTs), q_nano
    * (Q_c × 10⁹, nano-rounded — summable order-free). Every node in
    * the edge list must be labeled (inner joins drop unlabeled
    * nodes' edges — label with `LabelProp.labels`, which covers all
    * endpoint ids, to satisfy this by construction). */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val lab = labels.select(col("id").cast("long").as("id"),
      col("lab").cast("long").as("lab"))
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val labeled = e
      .join(lab.select(col("id").as("src"), col("lab").as("__ls")), Seq("src"))
      .join(lab.select(col("id").as("dst"), col("lab").as("__ld")), Seq("dst"))
    val intra = labeled.where(col("__ls") === col("__ld"))
      .groupBy(col("__ls").as("lab"))
      .agg(count(lit(1)).as("intra_edges"))
    val mass = deg.join(lab, Seq("id"))
      .groupBy(col("lab"))
      .agg(sum(col("deg")).as("degree_mass"))
    val total = e.agg(count(lit(1)).as("__m2"))
    // a community can have degree mass but zero intra edges (all its
    // nodes' edges leave it) — keep it via the outer side of mass
    mass.join(intra, Seq("lab"), "left")
      .select(col("lab"), coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        col("degree_mass"))
      .crossJoin(broadcast(total))
      .select(col("lab"), col("intra_edges"), col("degree_mass"),
        round(lit(1e9) *
          (col("intra_edges").cast("double") / col("__m2").cast("double") -
            (col("degree_mass").cast("double") / col("__m2").cast("double")) *
            (col("degree_mass").cast("double") / col("__m2").cast("double"))))
          .cast("long").as("q_nano"))
  }

  /** Degree assortativity (Newman 2002): the Pearson correlation of
    * (deg(src), deg(dst)) over the directed-symmetric edge list.
    * Positive = hubs link hubs; negative = hub-and-spoke. One row:
    * m2 (edge count), r_nano (r × 10⁹; NULL when a variance is zero
    * — a degree-regular graph has no defined correlation). */
  def assortativity(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val xy = e
      .join(deg.select(col("id").as("src"), col("deg").as("__x")), Seq("src"))
      .join(deg.select(col("id").as("dst"), col("deg").as("__y")), Seq("dst"))
    val sums = xy.agg(
      count(lit(1)).as("m2"),
      sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
      sum(col("__x") * col("__y")).as("sxy"),
      sum(col("__x") * col("__x")).as("sxx"),
      sum(col("__y") * col("__y")).as("syy"))
    val m = col("m2").cast("double")
    val cov = m * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")
    val vx = m * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")
    val vy = m * col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double")
    sums.select(col("m2"),
      when(vx === 0.0 || vy === 0.0, lit(null).cast("long"))
        .otherwise(round(lit(1e9) * cov / sqrt(vx * vy)).cast("long"))
        .as("r_nano"))
  }
}
