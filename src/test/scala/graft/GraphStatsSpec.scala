package graft

import graft.operators.GraphStats
import org.apache.spark.sql.functions._

class GraphStatsSpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst")

  test("modularity of two disjoint triangles under the perfect partition") {
    // two triangles, perfect 2-community labels: m2 = 12,
    // each community: intra = 6, mass = 6 -> Q_c = 6/12 - (6/12)^2 = 0.25
    val edges = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (11L, 12L), (12L, 13L), (11L, 13L)))
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (11L, 2L), (12L, 2L), (13L, 2L)).toDF("id", "lab")
    val got = GraphStats.modularity(edges, labels)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(1L -> ((6L, 6L, 250000000L)), 2L -> ((6L, 6L, 250000000L))))
  }

  test("one-community partition of a connected graph has Q = 0") {
    // Q = m2/m2 - (m2/m2)^2 = 0 whatever the graph
    val edges = sym(Seq((1L, 2L), (2L, 3L)))
    val labels = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("id", "lab")
    val got = GraphStats.modularity(edges, labels)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((9L, 4L, 4L, 0L)))
  }

  test("a community whose edges all leave it keeps a row with intra 0") {
    // path 1-2 with labels {1 -> a, 2 -> b}: both communities intra 0
    val edges = sym(Seq((1L, 2L)))
    val labels = Seq((1L, 1L), (2L, 2L)).toDF("id", "lab")
    val got = GraphStats.modularity(edges, labels)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L))
  }

  test("assortativity: star graph is perfectly disassortative (-1)") {
    val edges = sym((2L to 6L).map(i => (1L, i)))
    val got = GraphStats.assortativity(edges)
      .as[(Long, Option[Long])].head()
    assert(got._1 == 10L)
    assert(got._2 == Some(-1000000000L))
  }

  test("assortativity is NULL on a degree-regular graph (zero variance)") {
    val edges = sym(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    val got = GraphStats.assortativity(edges).as[(Long, Option[Long])].head()
    assert(got._2.isEmpty)
  }

  test("both are partitioning-invariant (exact integer sums)") {
    val pairs = (1L to 200L).map(i => (i, i % 13 + 1000L))
    val e1 = sym(pairs).repartition(1)
    val e13 = sym(pairs).repartition(13)
    val lab = (pairs.flatMap(p => Seq(p._1, p._2)).distinct.map(id => (id, id % 3)))
      .toDF("id", "lab")
    val a = GraphStats.modularity(e1, lab).as[(Long, Long, Long, Long)].collect().toSet
    val b = GraphStats.modularity(e13, lab).as[(Long, Long, Long, Long)].collect().toSet
    assert(a == b)
    val ra = GraphStats.assortativity(e1).as[(Long, Option[Long])].head()
    val rb = GraphStats.assortativity(e13).as[(Long, Option[Long])].head()
    assert(ra == rb)
  }

  test("adamicAdar scores wedge pairs, excludes existing edges, weights obscure neighbors more") {
    // z1 (deg 2) common to {1,2}; hub z2 (deg 4) common to {1,2} and {3,4};
    // 3-4 are ALSO adjacent -> excluded
    val edges = sym(Seq((1L, 101L), (2L, 101L),
      (1L, 102L), (2L, 102L), (3L, 102L), (4L, 102L), (3L, 4L)))
    val got = GraphStats.adamicAdar(edges, k = 50)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(!got.contains((3L, 4L))) // adjacent pair excluded
    val c12 = math.round(1e9 / math.log(2)) + math.round(1e9 / math.log(4))
    assert(got((1L, 2L)) == ((2L, c12)))
    assert(got((1L, 2L))._2 > got((1L, 3L))._2) // shared obscure z1 outweighs hub-only
  }

  test("adamicAdar enforces the wedge-volume cap loudly") {
    val hub = sym((1L to 60L).map(i => (i, 1000L)))
    intercept[IllegalArgumentException] {
      GraphStats.adamicAdar(hub, k = 10, maxWedgeVolume = 100L)
    }
  }

  test("adamicAdarCapped equals exact AA when no node exceeds the cap") {
    val edges = sym(Seq((1L, 101L), (2L, 101L),
      (1L, 102L), (2L, 102L), (3L, 102L), (4L, 102L), (3L, 4L)))
    val exact = GraphStats.adamicAdar(edges, k = 50)
      .as[(Long, Long, Long, Long)].collect().toSet
    val capped = GraphStats.adamicAdarCapped(edges, k = 50, hubCap = 16)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(capped == exact)
  }

  test("adamicAdarCapped: hub keeps its smallest neighbors; capped degree in the weight") {
    // hub 1000 has neighbors 1..60; cap 3 keeps {1,2,3} with capped
    // degree 3 — so wedge pairs are exactly the C(3,2) pairs among
    // {1,2,3}, each scored 1e9/ln(3), and the graph runs where the
    // exact form's guard refuses (the production-twin point)
    val hub = sym((1L to 60L).map(i => (i, 1000L)))
    intercept[IllegalArgumentException] {
      GraphStats.adamicAdar(hub, k = 10, maxWedgeVolume = 100L)
    }
    val got = GraphStats.adamicAdarCapped(hub, k = 10, hubCap = 3,
        maxWedgeVolume = 100L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val w = math.round(1e9 / math.log(3))
    assert(got == Map((1L, 2L) -> ((1L, w)), (1L, 3L) -> ((1L, w)),
      (2L, 3L) -> ((1L, w))))
  }

  test("adamicAdarCapped excludes pairs adjacent in the FULL graph, not just the capped one") {
    // hub 1000 connects 1..5; 4-5 are adjacent but the cap-3 adjacency
    // of 1000 drops them — the (4,5) pair never forms a wedge, and the
    // adjacent (1,2)? no: 1-2 NOT adjacent. Make 1-2 adjacent: even
    // though both are kept under the cap, the pair must be excluded
    // because the FULL edge list has it.
    val edges = sym((1L to 5L).map(i => (i, 1000L)) :+ (1L, 2L))
    val got = GraphStats.adamicAdarCapped(edges, k = 10, hubCap = 3)
      .as[(Long, Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(!got.contains((1L, 2L)))
    assert(got.contains((1L, 3L)) && got.contains((2L, 3L)))
  }

  test("adamicAdarCapStats accounts dropped wedges exactly") {
    // degrees: node 1000 has 60 (sym both directions: each of 1..60
    // also has degree 1). cap 3: wedges_exact = C(60,2) = 1770,
    // kept = C(3,2) = 3, dropped = 1767, one node capped
    val hub = sym((1L to 60L).map(i => (i, 1000L)))
    val got = GraphStats.adamicAdarCapStats(hub, hubCap = 3)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got == ((61L, 1L, 1770L, 3L, 1767L)))
  }
}
