// (precisionRecallAtK tests live at the bottom of this suite)
package graft

import graft.ops.RankEval
import org.apache.spark.sql.functions._

class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  // qid 1: retrieved A(1), B(2), C(3); judged B=2, C=1, D=2 (D never
  // retrieved — it still shapes the ideal). qid 2: nothing relevant.
  private def results = Seq((1L, "A", 1L), (1L, "B", 2L), (1L, "C", 3L),
    (2L, "X", 1L)).toDF("qid", "item", "rank")
  private def judged = Seq((1L, "B", 2L), (1L, "C", 1L), (1L, "D", 2L))
    .toDF("qid", "item", "rel")

  test("ndcg: hand values — per-term nano gains, unretrieved ideal, no-rel NULL") {
    val got = RankEval.ndcg(results, judged, k = 3)
      .as[(Long, Long, Long, Option[Long])].collect().map(r => r._1 -> r).toMap
    // dcg = 0 + round(1e9*3/log2(3)) + round(1e9*1/log2(4))
    assert(got(1L) == ((1L, 2392789261L, 5392789261L, Some(443701607L))))
    assert(got(2L) == ((2L, 0L, 0L, None)))
  }

  test("ndcg: perfect ranking scores exactly 1e9") {
    val perfect = Seq((1L, "D", 1L), (1L, "B", 2L), (1L, "C", 3L))
      .toDF("qid", "item", "rank")
    // D and B tie at rel 2; ideal breaks ties item asc (B before D),
    // but both orders produce the same per-position gains.
    val got = RankEval.ndcg(perfect, judged, k = 3)
      .as[(Long, Long, Long, Option[Long])].head()
    assert(got._4 == Some(1000000000L))
  }

  test("ndcg: k truncates both the retrieved and the ideal list") {
    val got = RankEval.ndcg(results, judged, k = 1)
      .as[(Long, Long, Long, Option[Long])].collect().map(r => r._1 -> r).toMap
    // @1: retrieved A rel 0 -> dcg 0; ideal B(2) -> 3e9.
    assert(got(1L) == ((1L, 0L, 3000000000L, Some(0L))))
  }

  test("reciprocalRank: first hit at 2 -> 500000000; none -> 0/NULL") {
    val got = RankEval.reciprocalRank(results, judged)
      .as[(Long, Option[Long], Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, Some(2L), 500000000L)))
    assert(got(2L) == ((2L, None, 0L)))
  }

  test("partitioning invariance") {
    val a = RankEval.ndcg(results.repartition(5), judged.repartition(3), 3)
      .as[(Long, Long, Long, Option[Long])].collect().sortBy(_._1).toSeq
    val b = RankEval.ndcg(results, judged, 3)
      .as[(Long, Long, Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("loud guards: dup judgment, rel out of range, dup rank, bad k") {
    intercept[Exception] {
      RankEval.ndcg(results, judged.union(Seq((1L, "B", 1L)).toDF("qid", "item", "rel")), 3).collect()
    }
    intercept[Exception] {
      RankEval.ndcg(results, Seq((1L, "B", -1L)).toDF("qid", "item", "rel"), 3).collect()
    }
    intercept[Exception] {
      RankEval.ndcg(results, Seq((1L, "B", 17L)).toDF("qid", "item", "rel"), 3).collect()
    }
    intercept[Exception] {
      RankEval.ndcg(results.union(Seq((1L, "Z", 1L)).toDF("qid", "item", "rank")),
        judged, 3).collect()
    }
    intercept[IllegalArgumentException] { RankEval.ndcg(results, judged, 0) }
  }

  test("precisionRecallAtK: hand counts; P divides by k, R by the full pool, empty pool NULL") {
    // q1: top-3 = A(rel 2), B(0), C(1) of a pool {A, C, D} → hits 2,
    // P@3 = 2/3, R = 2/3; q2 has no relevant judgments at all
    val results = Seq((1L, "A", 1L), (1L, "B", 2L), (1L, "C", 3L), (1L, "D", 4L),
      (2L, "X", 1L)).toDF("qid", "item", "rank")
    val judged = Seq((1L, "A", 2L), (1L, "C", 1L), (1L, "D", 1L),
      (2L, "X", 0L)).toDF("qid", "item", "rel")
    val got = RankEval.precisionRecallAtK(results, judged, 3)
      .orderBy($"qid").as[(Long, Long, Long, Long, Option[Long])].collect().toSeq
    val twoThirds = math.round(1e9 * 2.0 / 3.0)
    assert(got == Seq(
      (1L, 2L, 3L, twoThirds, Some(twoThirds)),
      (2L, 0L, 0L, 0L, None)))
    // retrieving the whole pool inside k ⇒ recall exactly 1
    val full = RankEval.precisionRecallAtK(results, judged, 4)
      .where($"qid" === 1L).as[(Long, Long, Long, Long, Option[Long])].collect().head
    assert(full._2 == 3L && full._5.contains(1000000000L))
    // the shared dup guard fires here too
    intercept[Exception] {
      RankEval.precisionRecallAtK(
        results.union(Seq((1L, "A", 9L)).toDF("qid", "item", "rank")), judged, 3).collect()
    }
  }
}
