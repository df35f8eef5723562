package graft

import graft.ops.CorpusStats
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("zipfSlope reproduces a constructed exact power law") {
    // frequencies f(r) = 1024 >> (r-1) for ranks 1..6: ln f = ln 1024 - (r-1) ln 2
    // vs x = ln r -> NOT linear in ln r; instead construct f = C / r (slope -1):
    // use f(r) = 720/r exactly for r in 1..6: 720,360,240,180,144,120
    val words = Seq("w1" -> 720, "w2" -> 360, "w3" -> 240, "w4" -> 180, "w5" -> 144, "w6" -> 120)
    val text = words.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = CorpusStats.zipfSlope(docs, "text", k = 6)
      .as[(Long, Option[Long])].head()
    assert(got._1 == 6L)
    // exact -1 power law -> slope_nano within rounding noise of -1e9
    // (micro-rounded points introduce ~1e-6 relative error)
    assert(math.abs(got._2.get + 1000000000L) < 10000L, got)
  }

  test("zipfSlope: uniform frequencies give slope 0; single token NULL") {
    val uni = Seq((1L, "a b c d a b c d")).toDF("doc_id", "text")
    val s = CorpusStats.zipfSlope(uni, "text", k = 4).as[(Long, Option[Long])].head()
    assert(s._2 == Some(0L))
    val one = Seq((1L, "solo solo solo")).toDF("doc_id", "text")
    val s1 = CorpusStats.zipfSlope(one, "text", k = 5).as[(Long, Option[Long])].head()
    assert(s1._1 == 1L && s1._2.isEmpty) // one point: zero variance in x
  }

  test("sourceOverlap: hand Jaccard between overlapping sources") {
    // srcA: shingles {a_b_c, b_c_d}; srcB: {b_c_d, c_d_e}; srcC disjoint
    val docs = Seq(
      ("A", "a b c d"),      // shingles a_b_c, b_c_d
      ("B", "b c d e"),      // shingles b_c_d, c_d_e
      ("C", "x y z w")       // shingles x_y_z, y_z_w
    ).toDF("source", "text")
    val got = CorpusStats.sourceOverlap(docs, "source", "text", n = 3)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got.keySet == Set(("A", "B"))) // C shares nothing -> no row
    val ab = got(("A", "B"))
    assert((ab._3, ab._4, ab._5) == ((2L, 2L, 1L)))
    assert(ab._6 == math.round(1e9 * 1.0 / 3.0))
  }

  test("sourceOverlap is partitioning-invariant") {
    val docs = (1L to 60L).map(i =>
      (s"s${i % 3}", s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 11} tok${i % 2}"))
      .toDF("source", "text")
    val a = CorpusStats.sourceOverlap(docs.repartition(1), "source", "text", 3)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    val b = CorpusStats.sourceOverlap(docs.repartition(7), "source", "text", 3)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(a == b)
  }
}
