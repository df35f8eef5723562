package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DBSCAN (Ester et al., KDD 1996) as a composition of two operators
  * this engine already scales: the grid-bucketed radius self-join
  * ([[graft.ops.Geo.radiusPairs]] — each point meets only its 3×3
  * neighbor cells, with the loud hot-cell cap) and min-label
  * connected components ([[Components.connectedComponents]]). No new
  * distributed machinery — density clustering falls out of the
  * neighbor graph:
  *
  *  - CORE: |N_eps(p)| ≥ minPts (neighborhood includes p itself).
  *  - clusters: connected components over core–core edges; an
  *    isolated core (all its neighbors border) is its own singleton
  *    cluster.
  *  - BORDER: non-core within eps of ≥1 core, assigned the MINIMUM
  *    cluster id among its core neighbors. Textbook DBSCAN leaves
  *    border assignment scan-order-dependent; a distributed engine
  *    cannot have order, so the min rule makes it deterministic
  *    (and oracle-exact) — a documented strengthening, not a
  *    deviation.
  *  - NOISE: everything else (cluster NULL).
  *
  * Everything is exact integer arithmetic (squared distances on the
  * integer plane), so the full labeling replays in SQL.
  */
object Dbscan {

  /** Output: (id, role core|border|noise, cluster_id — NULL for
    * noise; cluster id = min member id, the components convention). */
  def cluster(points: DataFrame, idCol: String, xCol: String, yCol: String,
              eps: Long, minPts: Int, maxCellPoints: Int = 10000): DataFrame = {
    require(minPts >= 2, s"Dbscan: minPts must be >= 2, got $minPts")
    // duplicate-id guard (the theilSen contract: loud, inside the
    // CONSUMED id column so Catalyst cannot prune it away): a repeated
    // id would silently merge two points' neighborhoods, inflating
    // core counts and mislabeling roles. One hash-window count over
    // the points frame — points-sized, dwarfed by the radius join.
    val idGuard = when(count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))) > 1,
      raise_error(concat(lit(s"Dbscan: duplicate $idCol = "), col(idCol).cast("string"),
        lit(" — two points under one id merge their neighborhoods"))))
      .otherwise(col(idCol))
    val pts = points.select(idGuard.as(idCol), col(xCol), col(yCol))
    val pairs = graft.ops.Geo.radiusPairs(pts, idCol, xCol, yCol, eps, maxCellPoints)
      .select(col("id_a"), col("id_b"))
      .transform(graft.ops.Checkpoints.truncate) // feeds degree + edges + border
    val ids = pts.select(col(idCol).cast("long").as("id"))
    val sym = pairs.select(col("id_a").as("id"), col("id_b").as("nb"))
      .unionByName(pairs.select(col("id_b").as("id"), col("id_a").as("nb")))
    val core = sym.groupBy(col("id")).agg(count(lit(1)).as("n_nb"))
      .where(col("n_nb") >= minPts - 1).select(col("id"))
    val coreEdges = pairs
      .join(core.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
      .join(core.select(col("id").as("id_b")), Seq("id_b"), "left_semi")
      .select(col("id_a").as("d1"), col("id_b").as("d2"))
    // star-contraction components, NOT min-label propagation: a dense
    // point cloud percolates into one giant component whose regional
    // minima stall the propagation wave (measured — see
    // connectedComponentsStars' scaladoc); star rounds are O(log² n)
    // on any topology
    val comp = Components.connectedComponentsStars(coreEdges)
    val coreClusters = core.join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("cluster_id"))
      .transform(graft.ops.Checkpoints.truncate) // consumed by border + final
    val borders = sym.join(core, Seq("id"), "left_anti")
      .join(coreClusters.select(col("id").as("nb"), col("cluster_id")), Seq("nb"))
      .groupBy(col("id")).agg(min(col("cluster_id")).as("cluster_id"))
    ids
      .join(coreClusters.select(col("id"), col("cluster_id").as("__cc")), Seq("id"), "left")
      .join(borders.select(col("id"), col("cluster_id").as("__bc")), Seq("id"), "left")
      .select(col("id"),
        when(col("__cc").isNotNull, lit("core"))
          .when(col("__bc").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("__cc"), col("__bc")).as("cluster_id"))
  }
}
