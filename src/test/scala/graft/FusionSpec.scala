package graft

import graft.ops.Fusion
import org.apache.spark.sql.functions._

class FusionSpec extends SparkSpec {
  import spark.implicits._

  // (list, qid, item, score)
  private def lists = Seq(
    ("lex", 1L, "A", 9.0), ("lex", 1L, "B", 7.0), ("lex", 1L, "C", 5.0),
    ("sem", 1L, "B", 0.9), ("sem", 1L, "A", 0.8), ("sem", 1L, "D", 0.1))
    .toDF("lst", "qid", "item", "score")

  test("rrf: exact nano contributions — 10^9 div (k + rank), summed") {
    val got = Fusion.rrf(lists, "lst", "qid", "item", "score", k = 60)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._2 -> r).toMap
    val c1 = 1000000000L / 61; val c2 = 1000000000L / 62; val c3 = 1000000000L / 63
    // A: rank 1 in lex, rank 2 in sem; B: rank 2 in lex, rank 1 in sem
    assert(got("A") == ((1L, "A", 2L, 1L, c1 + c2)))
    assert(got("B") == ((1L, "B", 2L, 1L, c1 + c2)))
    assert(got("C") == ((1L, "C", 1L, 3L, c3)))
    assert(got("D") == ((1L, "D", 1L, 3L, c3)))
  }

  test("rrf: consensus beats a single top rank (the RRF property)") {
    // X is rank 2 in BOTH lists; Y tops one list, absent from the other.
    val df = Seq(("l1", 1L, "Y", 9.0), ("l1", 1L, "X", 8.0),
      ("l2", 1L, "Z", 9.0), ("l2", 1L, "X", 8.0))
      .toDF("lst", "qid", "item", "score")
    val got = Fusion.rrf(df, "lst", "qid", "item", "score", k = 60)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._2 -> r._5).toMap
    assert(got("X") > got("Y") && got("Y") == got("Z"))
  }

  test("topFused: deterministic under rrf ties (item asc), n cap") {
    val fused = Fusion.rrf(lists, "lst", "qid", "item", "score")
    val top2 = Fusion.topFused(fused, 2).as[(Long, String, Long, Long, Long)]
      .collect().map(_._2).sorted
    // A and B tie exactly; both fit in top-2. Top-3 must pick C over D
    // (equal rrf_nano, item asc breaks the tie).
    assert(top2.toSeq == Seq("A", "B"))
    val top3 = Fusion.topFused(fused, 3).as[(Long, String, Long, Long, Long)]
      .collect().map(_._2).sorted
    assert(top3.toSeq == Seq("A", "B", "C"))
  }

  test("rrf: partitioning invariance") {
    val base = Fusion.rrf(lists, "lst", "qid", "item", "score")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._2).toSeq
    val shuffled = Fusion.rrf(lists.repartition(7), "lst", "qid", "item", "score")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(base == shuffled)
  }

  test("rrf: loud guards — NULL score, duplicate vote, bad k") {
    intercept[Exception] {
      Fusion.rrf(Seq(("l1", 1L, "A", null.asInstanceOf[java.lang.Double]))
        .toDF("lst", "qid", "item", "score"),
        "lst", "qid", "item", "score").collect()
    }
    intercept[Exception] {
      Fusion.rrf(Seq(("l1", 1L, "A", 1.0), ("l1", 1L, "A", 2.0))
        .toDF("lst", "qid", "item", "score"),
        "lst", "qid", "item", "score").collect()
    }
    intercept[IllegalArgumentException] {
      Fusion.rrf(lists, "lst", "qid", "item", "score", k = 0)
    }
    intercept[IllegalArgumentException] { Fusion.topFused(lists, 0) }
  }
}
