package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("a cycle is the exact fixed point: every rank stays at scale") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = PageRank.ranks(edges, iters = 7).orderBy($"id").as[(Long, Long)].collect()
    // base + d*scale = 150e6 + 850e6 = scale, every iteration
    assert(r.toSeq == Seq((1L, 1000000000L), (2L, 1000000000L), (3L, 1000000000L)))
  }

  test("star graph: hand-computed integer ranks, dangling mass dropped") {
    val edges = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val i1 = PageRank.ranks(edges, iters = 1).orderBy($"id").as[(Long, Long)].collect()
    // leaves get base only; hub gets base + d*(1e9 + 1e9) = 1.85e9
    assert(i1.toSeq == Seq((1L, 150000000L), (2L, 150000000L), (3L, 1850000000L)))
    val i2 = PageRank.ranks(edges, iters = 2).orderBy($"id").as[(Long, Long)].collect()
    // node 3 is dangling: its mass vanishes; hub now fed by base-ranked leaves
    assert(i2.toSeq == Seq((1L, 150000000L), (2L, 150000000L), (3L, 405000000L)))
  }

  test("ranks are independent of edge partitioning (exact integers, order-free sums)") {
    val edges = (1L to 200L).map(i => (i, i % 50)).toDF("src", "dst")
    val a = PageRank.ranks(edges.repartition(3), iters = 4).orderBy($"id").collect()
    val b = PageRank.ranks(edges.repartition(17), iters = 4).orderBy($"id").collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("guards: iteration bounds and exact-base divisibility") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](PageRank.ranks(e, iters = 0))
    intercept[IllegalArgumentException](
      PageRank.ranks(e, scale = 1000L, dampNum = 2L, dampDen = 3L)) // 1000/3 not exact
    // null endpoints are dropped, not propagated
    val withNull = Seq((Some(1L), Some(2L)), (None, Some(9L))).toDF("src", "dst")
    val r = PageRank.ranks(withNull, iters = 1).as[(Long, Long)].collect().toMap
    assert(!r.contains(9L) || r(9L) == 150000000L + 850000000L)
    assert(r.contains(1L) && r.contains(2L))
  }
}
