package graft

import graft.ops.Geo
import org.apache.spark.sql.functions._

class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def pts(rows: (Long, Long, Long)*) = rows.toDF("id", "x", "y")

  test("hand-checked neighborhoods: inside, boundary, outside, across cells") {
    val p = pts(
      (1L, 0L, 0L), (2L, 3L, 4L),     // dist 5 exactly (boundary, kept at r=5)
      (3L, 0L, 6L),                   // dist 6 from 1 (dropped at r=5)
      (4L, 99L, 99L), (5L, 101L, 101L) // dist^2=8, straddles cell border at r=5
    )
    val got = Geo.radiusPairs(p, "id", "x", "y", radius = 5L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 25L), (2L, 3L, 13L), (4L, 5L, 8L)))
  }

  test("grid join equals the brute-force quadratic answer") {
    val p = (1L to 400L).map(i =>
      (i, (i * 7919) % 1000, (i * 104729) % 1000)).toDF("id", "x", "y")
    val r = 60L
    val grid = Geo.radiusPairs(p, "id", "x", "y", r)
      .as[(Long, Long, Long)].collect().toSet
    val a = p.select($"id".as("id_a"), $"x".as("xa"), $"y".as("ya"))
    val brute = a.crossJoin(p.select($"id".as("id_b"), $"x".as("xb"), $"y".as("yb")))
      .where($"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        (($"xa" - $"xb") * ($"xa" - $"xb") + ($"ya" - $"yb") * ($"ya" - $"yb")).as("d2"))
      .where($"d2" <= r * r)
      .as[(Long, Long, Long)].collect().toSet
    assert(grid == brute && grid.nonEmpty)
  }

  test("each qualifying pair is emitted exactly once (no cell double-count)") {
    val p = (1L to 300L).map(i => (i, (i * 31) % 200, (i * 17) % 200)).toDF("id", "x", "y")
    val out = Geo.radiusPairs(p, "id", "x", "y", 25L, maxCellPoints = 100000)
    assert(out.count() == out.distinct().count())
  }

  test("partitioning-independent; guards fail loud") {
    val p = (1L to 200L).map(i => (i, (i * 13) % 500, (i * 29) % 500)).toDF("id", "x", "y")
    val a = Geo.radiusPairs(p.repartition(11), "id", "x", "y", 40L)
      .orderBy($"id_a", $"id_b").collect()
    val b = Geo.radiusPairs(p, "id", "x", "y", 40L).orderBy($"id_a", $"id_b").collect()
    assert(a.nonEmpty && a.sameElements(b))
    assert(intercept[IllegalArgumentException](
        Geo.radiusPairs(Seq((Some(1L), Some(2L), Option.empty[Long])).toDF("id", "x", "y"),
          "id", "x", "y", 5L))
      .getMessage.contains("NULL id/coordinate"))
    // a dense cluster trips the loud cell cap, naming the cell
    val dense = (1L to 50L).map(i => (i, 10L + i % 3, 10L + i % 3)).toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException](
      Geo.radiusPairs(dense, "id", "x", "y", 100L, maxCellPoints = 10))
    assert(e.getMessage.contains("quadratic"), e.getMessage)
  }

  test("negative coordinates: div-grid still catches cross-cell neighbors") {
    // Spark's `div` truncates toward zero, so cells around the origin
    // are wider in coordinate space — correctness is preserved because
    // neighbors still differ by <= 1 cell; pin it.
    val p = pts((1L, -3L, -3L), (2L, 2L, 2L), (3L, -40L, -40L))
    val got = Geo.radiusPairs(p, "id", "x", "y", 8L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 50L)))
  }

  test("inConvexPolygon: inside, boundary, outside, and vertex cases") {
    import spark.implicits._
    val square = Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L))
    val pts = Seq((1L, 5L, 5L), (2L, 0L, 5L), (3L, 10L, 10L), (4L, 11L, 5L),
      (5L, 5L, -1L)).toDF("id", "x", "y")
    val got = pts.select($"id",
        graft.ops.Geo.inConvexPolygon($"x", $"y", square).as("in"))
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> true, 4L -> false, 5L -> false))
  }

  test("inConvexPolygon rejects clockwise and concave rings loudly") {
    import org.apache.spark.sql.functions.col
    val cw = Seq((0L, 0L), (0L, 10L), (10L, 10L), (10L, 0L))
    intercept[IllegalArgumentException] {
      graft.ops.Geo.inConvexPolygon(col("x"), col("y"), cw)
    }
    val concave = Seq((0L, 0L), (10L, 0L), (5L, 2L), (5L, 10L))
    intercept[IllegalArgumentException] {
      graft.ops.Geo.inConvexPolygon(col("x"), col("y"), concave)
    }
    intercept[IllegalArgumentException] {
      graft.ops.Geo.inConvexPolygon(col("x"), col("y"), Seq((0L, 0L), (1L, 1L)))
    }
  }
}
