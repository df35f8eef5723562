package graft

import graft.operators.Hits
import org.apache.spark.sql.functions._

class HitsSpec extends SparkSpec {
  import spark.implicits._

  test("one iteration matches the hand-computed gather sums") {
    // 1->3, 2->3, 2->4: auth(3)=2, auth(4)=1; hub(1)=2, hub(2)=3
    val edges = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val got = Hits.scores(edges, iters = 1)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      1L -> ((2L, 0L)), 2L -> ((3L, 0L)),
      3L -> ((0L, 2L)), 4L -> ((0L, 1L))))
  }

  test("the strongest authority is the most-pointed-at node after 2 iterations") {
    // star: many hubs point at 10; one stray edge 1->20
    val edges = ((1L to 6L).map(i => (i, 10L)) :+ (1L, 20L)).toDF("src", "dst")
    val got = Hits.scores(edges, iters = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got(10L) > got(20L))
    // round 1: hub(1)=7 (two out-edges), hub(2..6)=6;
    // round 2: auth(10) = 7 + 5*6 = 37
    assert(got(10L) == 37L)
  }

  test("scores are partitioning-invariant") {
    val edges = (1L to 300L).map(i => (i % 17, i % 23 + 100L)).distinct.toDF("src", "dst")
    val a = Hits.scores(edges, iters = 2, partitions = 1)
      .as[(Long, Long, Long)].collect().toSet
    val b = Hits.scores(edges, iters = 2, partitions = 13)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("rescale caps scores at ~1e9 without overflow") {
    // hub seeds 1, in-degree 3 -> auth 3; second round magnifies but
    // stays bounded by the div; just assert bounds + determinism
    val edges = (1L to 50L).flatMap(i => Seq((i, 1000L), (i, 2000L))).toDF("src", "dst")
    val got = Hits.scores(edges, iters = 3)
      .as[(Long, Long, Long)].collect()
    assert(got.forall { case (_, h, a) => h >= 0 && a >= 0 && h <= 2000000000L && a <= 2000000000L })
  }
}
