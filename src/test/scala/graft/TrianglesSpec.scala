package graft

import graft.operators.Triangles
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  test("K4 has exactly 4 triangles, every node in 3 of them") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    assert(Triangles.triangles(edges).count() == 4)
    val per = Triangles.perNodeCounts(edges).orderBy($"id").as[(Long, Long)].collect()
    assert(per.toSeq == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("square with one diagonal: 2 triangles, diagonal endpoints in both") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)).toDF("src", "dst")
    val tri = Triangles.triangles(edges).as[(Long, Long, Long)].collect().toSet
    assert(tri.size == 2)
    val per = Triangles.perNodeCounts(edges).orderBy($"id").as[(Long, Long)].collect()
    assert(per.toSeq == Seq((1L, 2L), (2L, 1L), (3L, 2L), (4L, 1L)))
  }

  test("triangle-free graphs (trees, bipartite) yield zero rows") {
    val tree = Seq((1L, 2L), (1L, 3L), (3L, 4L), (3L, 5L)).toDF("src", "dst")
    assert(Triangles.triangles(tree).count() == 0)
    val bip = (for (a <- 1L to 5L; b <- 10L to 14L) yield (a, b)).toDF("src", "dst")
    assert(Triangles.triangles(bip).count() == 0)
  }

  test("each triangle is emitted exactly once, at its lowest-(deg,id) corner") {
    // duplicate edges in both orientations + self loops must not inflate counts
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (1L, 1L), (2L, 2L)).toDF("src", "dst")
    val tri = Triangles.triangles(edges).as[(Long, Long, Long)].collect()
    assert(tri.length == 1)
    val Array((a, b, c)) = tri
    assert(Set(a, b, c) == Set(1L, 2L, 3L))
  }

  test("matches brute-force enumeration on a random graph, any partitioning") {
    val rnd = new scala.util.Random(7)
    val raw = Seq.fill(160)((rnd.nextInt(24).toLong, rnd.nextInt(24).toLong))
    val edges = raw.toDF("src", "dst")
    // brute force: all unordered node triples with all three edges present
    val es = raw.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .filter { case (x, y) => x != y }.toSet
    var expected = 0L
    for (a <- 0L until 24L; b <- a + 1 until 24L; c <- b + 1 until 24L)
      if (es((a, b)) && es((a, c)) && es((b, c))) expected += 1
    assert(Triangles.triangles(edges).count() == expected)
    assert(Triangles.triangles(edges.repartition(13)).count() == expected)
  }

  test("clustering coefficients: K4 is all 1.0; diagonal square hand-computed; leaves NULL") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val ccK4 = Triangles.clusteringCoefficients(k4)
      .orderBy($"id").as[(Long, Long, Long, Option[Double])].collect()
    assert(ccK4.forall { case (_, deg, t, cc) => deg == 3 && t == 3 && cc.contains(1.0) })

    // square 1-2-3-4 with diagonal 1-3, plus a pendant leaf 5 on 1
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (1L, 5L)).toDF("src", "dst")
    val cc = Triangles.clusteringCoefficients(g)
      .orderBy($"id").as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(cc == Seq(
      (1L, 4L, 2L, Some(4.0 / 12)),  // deg 4, 2 triangles
      (2L, 2L, 1L, Some(1.0)),
      (3L, 3L, 2L, Some(4.0 / 6)),
      (4L, 2L, 1L, Some(1.0)),
      (5L, 1L, 0L, None)))           // degree-1: undefined, not zero
  }

  test("orientation caps out-degree: a hub's edges point INTO it") {
    // star: hub 0 with 30 leaves — hub out-degree must be 0 after orientation
    val edges = (1L to 30L).map(i => (0L, i)).toDF("src", "dst")
    val o = Triangles.oriented(Triangles.canonicalEdges(edges))
    val hubOut = o.where($"src" === 0L).count()
    assert(hubOut == 0L)
    assert(o.count() == 30L)
  }
}
