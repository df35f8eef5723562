package graft

import graft.ops.Entropy
import org.apache.spark.sql.functions._

class EntropySpec extends SparkSpec {
  import spark.implicits._

  test("hand values: uniform two-symbol text has H = ln 2; constant text has H = 0") {
    val docs = Seq((1L, "aabb"), (2L, "zzzz"), (3L, "abcd")).toDF("id", "text")
    val got = Entropy.charEntropy(docs, "id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((4L, 2L, 2L * math.round(1e9 * 0.5 * math.log(2)))))
    assert(got(2L) == ((4L, 1L, 0L)))
    assert(got(3L)._3 == 4L * math.round(1e9 * 0.25 * math.log(4)))
  }

  test("NULL and empty texts are dropped, not scored zero") {
    val docs = Seq((1L, Some("ab")), (2L, None), (3L, Some("")))
      .toDF("id", "text")
    val got = Entropy.charEntropy(docs, "id", "text").select("id").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("partitioning-invariant (pre-rounded contributions sum order-free)") {
    val docs = (1L to 40L).map(i => (i, ("abcdefg" * (i.toInt % 5 + 1)).take(20))).toDF("id", "text")
    val a = Entropy.charEntropy(docs.repartition(1), "id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = Entropy.charEntropy(docs.repartition(7), "id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a == b)
  }
}
