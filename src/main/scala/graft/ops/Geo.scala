package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial radius self-join on integer planar coordinates — "all
  * pairs of points within distance r" without the cartesian product,
  * via the classic fixed-grid spatial hash (the bucketing trick
  * every distributed spatial engine builds on). Coordinates are the
  * CALLER'S integer planar units (micro-degrees on a locally-flat
  * patch, meters in a projected CRS, pixels…): keeping them integer
  * makes the squared-euclidean predicate dx² + dy² ≤ r² exact — no
  * floating point, no haversine libm drift — so the whole join
  * replays bit-for-bit in any engine (q_geo_radius).
  *
  * Grid: cell = (x div r, y div r) — cells are r×r, so two points
  * within distance r differ by AT MOST 1 in each cell coordinate
  * (pigeonhole). The left side sits at its home cell; the right side
  * replicates to its 3×3 cell neighborhood; pairs meet on an
  * EQUI-join on the cell key. Because the left point's home cell is
  * unique, a qualifying pair meets in exactly ONE cell — no
  * post-distinct. Replication factor is a constant 9; the join is a
  * plain shuffled equi-join on (cx, cy).
  *
  * The failure mode is a HOT CELL (a dense cluster at the chosen r
  * makes its cell quadratic). The guard is loud, not silent — the
  * [[Baskets]]/FuzzyJoin cap policy: the offending cell and its
  * population are named, and the caller picks a smaller r or
  * pre-thins the cluster. At 100 TB this is the difference between
  * a skewed-task OOM three hours in and an immediate, actionable
  * error.
  *
  * Output: (id_a, id_b, dist2) with id_a < id_b, dist2 = exact
  * squared distance. NULL ids/coordinates raise (a dropped point
  * silently shrinks every neighborhood).
  */
object Geo {

  def radiusPairs(points: DataFrame, idCol: String, xCol: String, yCol: String,
                  radius: Long, maxCellPoints: Int = 10000): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    require(maxCellPoints >= 2, s"maxCellPoints must be >= 2, got $maxCellPoints")
    val p0 = points.select(col(idCol).cast("long").as("__id"),
      col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    val bad = p0.where(col("__id").isNull || col("__x").isNull || col("__y").isNull)
      .limit(1).collect()
    require(bad.isEmpty,
      "Geo: NULL id/coordinate - a silently dropped point would shrink " +
        "every neighborhood; clean the input explicitly")
    val p = p0
      .withColumn("__cx", expr(s"__x div $radius"))
      .withColumn("__cy", expr(s"__y div $radius"))
    val hot = p.groupBy(col("__cx"), col("__cy")).agg(count(lit(1)).as("__n"))
      .where(col("__n") > maxCellPoints)
      .orderBy(col("__n").desc).limit(1).collect()
    require(hot.isEmpty, {
      val r = hot.head
      s"Geo: grid cell (${r.get(0)}, ${r.get(1)}) holds ${r.get(2)} points " +
        s"(cap $maxCellPoints) - its pair expansion is quadratic; shrink the " +
        "radius, pre-thin the cluster, or raise maxCellPoints deliberately"
    })
    val left = p.select(col("__id").as("id_a"), col("__x").as("__xa"),
      col("__y").as("__ya"), col("__cx"), col("__cy"))
    // replicate the right side to its 3x3 neighborhood: any pair
    // within r meets at the LEFT point's unique home cell
    val offs = Seq(-1, 0, 1)
    val nbr = explode(array(
      (for (dx <- offs; dy <- offs) yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*))
    val right = p.select(col("__id").as("id_b"), col("__x").as("__xb"),
        col("__y").as("__yb"), col("__cx"), col("__cy"))
      .withColumn("__o", nbr)
      .select(col("id_b"), col("__xb"), col("__yb"),
        (col("__cx") + col("__o.dx")).as("__cx"),
        (col("__cy") + col("__o.dy")).as("__cy"))
    left.join(right, Seq("__cx", "__cy"))
      .where(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("__xa") - col("__xb")) * (col("__xa") - col("__xb")) +
          (col("__ya") - col("__yb")) * (col("__ya") - col("__yb")))
      .where(col("dist2") <= lit(radius * radius))
      .select(col("id_a"), col("id_b"), col("dist2"))
  }

  /** Point-in-convex-polygon membership as a pure column predicate:
    * for a counter-clockwise convex polygon, a point is inside
    * (boundary inclusive) iff every edge's cross product
    * (v₂−v₁) × (p−v₁) is ≥ 0. Integer cross products — exact, no
    * epsilon, replayable verbatim in SQL — and the whole test is one
    * codegen'd conjunction per row: no join, no shuffle, the
    * geofence filter a 100 TB scan pushes down next to its other
    * predicates. Polygon size is the constant factor (one cross
    * product per edge); for many-vertex fences pre-simplify, or cut
    * the plane into cells with [[radiusPairs]]' grid first.
    *
    * The polygon is validated ONCE at the driver: at least 3
    * vertices, all consecutive-edge cross products ≥ 0 with at least
    * one > 0 (convex, CCW, not degenerate) — a clockwise or concave
    * ring would silently invert/garble the test, so it raises
    * instead. Coordinate magnitude must keep |dx·dy| < 2⁶² (true for
    * any sub-planetary integer grid).
    */
  def inConvexPolygon(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
                      poly: Seq[(Long, Long)]): org.apache.spark.sql.Column = {
    require(poly.size >= 3, s"inConvexPolygon: need >= 3 vertices, got ${poly.size}")
    val edges = poly.zip(poly.tail :+ poly.head)
    val turns = edges.zip(edges.tail :+ edges.head).map {
      case (((x1, y1), (x2, y2)), (_, (x3, y3))) =>
        (x2 - x1) * (y3 - y2) - (y2 - y1) * (x3 - x2)
    }
    require(turns.forall(_ >= 0) && turns.exists(_ > 0),
      "inConvexPolygon: polygon must be convex and counter-clockwise " +
        s"(consecutive-edge cross products: $turns)")
    edges.map { case ((x1, y1), (x2, y2)) =>
      (lit(x2 - x1) * (y - lit(y1)) - lit(y2 - y1) * (x - lit(x1))) >= 0L
    }.reduce(_ && _)
  }
}
