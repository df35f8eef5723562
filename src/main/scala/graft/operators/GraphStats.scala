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

  /** Per-community CONDUCTANCE φ(C) = cut(C) / min(vol(C), vol(V∖C))
    * — the boundary-quality score modularity misses (modularity
    * rewards dense-vs-random; conductance measures how LEAKY the
    * boundary is, the quantity spectral partitioning bounds via
    * Cheeger's inequality). Over the symmetric directed edge list:
    * vol(C) = #edges with src ∈ C (= Σ degrees), cut(C) = those
    * whose endpoints disagree on the label. Exact integers; one
    * IEEE division per community; whole-graph communities
    * (min volume 0) yield NULL — φ is undefined, not zero.
    * Output: (lab, vol, cut, phi_nano). */
  def conductance(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val lab = labels.select(col("id").cast("long").as("id"),
      col("lab").cast("long").as("lab"))
    val labeled = e
      .join(lab.select(col("id").as("src"), col("lab").as("__ls")), Seq("src"))
      .join(lab.select(col("id").as("dst"), col("lab").as("__ld")), Seq("dst"))
    val per = labeled.groupBy(col("__ls").as("lab"))
      .agg(count(lit(1)).as("vol"),
        sum(when(col("__ls") =!= col("__ld"), 1L).otherwise(0L)).as("cut"))
    val total = e.agg(count(lit(1)).as("__m2"))
    per.crossJoin(broadcast(total))
      .select(col("lab"), col("vol"), col("cut"),
        when(least(col("vol"), col("__m2") - col("vol")) === 0, lit(null).cast("long"))
          .otherwise(round(lit(1e9) * col("cut").cast("double") /
            least(col("vol"), col("__m2") - col("vol")).cast("double")).cast("long"))
          .as("phi_nano"))
  }

  /** Adamic-Adar link prediction over a SYMMETRIC edge list: score
    * every non-adjacent wedge pair (u, v) by Σ over common neighbors
    * z of 1/ln(deg z) — shared obscure neighbors predict a future
    * link far more than shared hubs (Adamic & Adar 2003). The
    * recommendation/ER primitive next to [[Triangles]]: the same
    * wedge join, scored instead of closed.
    *
    * Determinism: each wedge contributes round(10⁹/ln(deg z)) — an
    * integer — and the pair score is an exact integer SUM of those
    * (order-free; the per-wedge rounding is the contract, mirrored
    * in the oracle). deg z ≥ 2 for any wedge center, so ln > 0.
    *
    * Scale: wedge volume is Σ_z deg(z)² — intrinsic to exact AA
    * (unlike triangle counting there is no orientation trick: every
    * wedge carries score mass). The operator computes that volume
    * from the degree frame FIRST (one tiny aggregate) and fails loud
    * above `maxWedgeVolume` instead of letting a hub quadratically
    * explode a task three hours in; cap hub degrees upstream or
    * score against a sampled neighbor set to proceed.
    *
    * Output: top `k` rows (u, v, common_neighbors, aa_nano), u < v,
    * pairs already adjacent excluded, ordered by (aa_nano DESC, u,
    * v) — a TakeOrderedAndProject, no full sort. */
  def adamicAdar(edges: DataFrame, k: Int,
                 maxWedgeVolume: Long = 100000000L): DataFrame = {
    require(k >= 1, s"adamicAdar: k must be >= 1, got $k")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      .transform(graft.ops.Checkpoints.truncate)
    val vol = deg.agg(sum(col("deg") * col("deg"))).first().getLong(0)
    require(vol <= maxWedgeVolume,
      s"adamicAdar: wedge volume $vol exceeds maxWedgeVolume=$maxWedgeVolume " +
        "— a hub makes exact AA quadratic; cap hub degrees or sample neighbors")
    val wedges = e.select(col("src").as("z"), col("dst").as("u"))
      .join(e.select(col("src").as("z"), col("dst").as("v")), Seq("z"))
      .where(col("u") < col("v"))
      .join(deg.select(col("id").as("z"), col("deg")), Seq("z"))
      .select(col("u"), col("v"),
        round(lit(1e9) / log(col("deg").cast("double"))).cast("long").as("__c"))
    val existing = e.where(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
    wedges
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common_neighbors"), sum(col("__c")).as("aa_nano"))
      .join(existing, Seq("u", "v"), "left_anti")
      .orderBy(col("aa_nano").desc, col("u"), col("v"))
      .limit(k)
  }

  /** Hub-capped Adamic-Adar — the PRODUCTION twin of [[adamicAdar]]
    * (r12 verdict item #4: the exact form guard-refused at sf10 with
    * 781M wedges — part degrees grow linearly with orders, wedges
    * quadratically with degree; this is the path the refusal message
    * names). Each node keeps only its `hubCap` SMALLEST neighbors
    * (rank by neighbor id — deterministic, SQL-replicable), and the
    * score is EXACT Adamic-Adar over that capped graph: capped
    * degrees in the 1/ln weight, wedges from capped adjacency. The
    * cap is part of the operator's DEFINITION, not an approximation
    * of the exact form — so the DuckDB oracle replays it exactly and
    * the correctness contract stays hash-equality, while wedge
    * volume drops from Σ deg² (quadratic in hub degree) to
    * ≤ |V|·hubCap² (LINEAR in nodes — the 100 TB path).
    *
    * Adjacent-pair exclusion uses the FULL edge list: link
    * prediction must never propose an edge that already exists,
    * capped adjacency or not.
    *
    * Dropped-wedge accounting is explicit and cheap —
    * [[adamicAdarCapStats]] reports exactly how much score mass the
    * cap discarded (wedges_exact / wedges_kept / wedges_dropped /
    * nodes_capped from one degree aggregate), so a caller can judge
    * the cap instead of trusting it. */
  def adamicAdarCapped(edges: DataFrame, k: Int, hubCap: Int,
                       maxWedgeVolume: Long = 100000000L): DataFrame = {
    require(k >= 1, s"adamicAdarCapped: k must be >= 1, got $k")
    require(hubCap >= 2, s"adamicAdarCapped: hubCap must be >= 2 (a wedge needs " +
      s"two neighbors), got $hubCap")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("dst"))
    val eCap = e.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= hubCap).drop("__rn")
      .transform(graft.ops.Checkpoints.truncate) // read 3× below
    val deg = eCap.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    // ≤ |V|·hubCap² by construction; the guard stays as belt +
    // suspenders (same loud contract as the exact form)
    val vol = deg.agg(sum(col("deg") * col("deg"))).first().getLong(0)
    require(vol <= maxWedgeVolume,
      s"adamicAdarCapped: capped wedge volume $vol exceeds maxWedgeVolume=" +
        s"$maxWedgeVolume — lower hubCap (volume ≤ |V|·hubCap²)")
    val wedges = eCap.select(col("src").as("z"), col("dst").as("u"))
      .join(eCap.select(col("src").as("z"), col("dst").as("v")), Seq("z"))
      .where(col("u") < col("v"))
      .join(deg.select(col("id").as("z"), col("deg")), Seq("z"))
      .select(col("u"), col("v"),
        round(lit(1e9) / log(col("deg").cast("double"))).cast("long").as("__c"))
    val existing = e.where(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
    wedges
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common_neighbors"), sum(col("__c")).as("aa_nano"))
      .join(existing, Seq("u", "v"), "left_anti")
      .orderBy(col("aa_nano").desc, col("u"), col("v"))
      .limit(k)
  }

  /** The cap's explicit cost (one row): how many wedges — score
    * mass — [[adamicAdarCapped]]'s hubCap discards, from ONE degree
    * aggregate over the UNCAPPED edge list. wedges_exact = Σ C(d,2),
    * wedges_kept = Σ C(min(d,cap),2) — the d·(d−1) products are
    * always even, so shiftright keeps the arithmetic in exact longs. */
  def adamicAdarCapStats(edges: DataFrame, hubCap: Int): DataFrame = {
    require(hubCap >= 2, s"adamicAdarCapStats: hubCap must be >= 2, got $hubCap")
    val deg = edges.select(col("src").cast("long").as("src"))
      .groupBy(col("src")).agg(count(lit(1)).as("d"))
    val dc = least(col("d"), lit(hubCap.toLong))
    deg.agg(
        count(lit(1)).as("n_nodes"),
        sum(when(col("d") > hubCap, 1L).otherwise(0L)).as("nodes_capped"),
        sum(shiftright(col("d") * (col("d") - 1), 1)).as("wedges_exact"),
        sum(shiftright(dc * (dc - 1), 1)).as("wedges_kept"))
      .select(col("n_nodes"), col("nodes_capped"), col("wedges_exact"),
        col("wedges_kept"),
        (col("wedges_exact") - col("wedges_kept")).as("wedges_dropped"))
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
