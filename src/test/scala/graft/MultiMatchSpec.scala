package graft

import graft.plans.{AcAutomaton, MultiMatch}
import org.apache.spark.sql.functions._

class MultiMatchSpec extends SparkSpec {
  import spark.implicits._

  private def brute(text: String, p: String): Long =
    (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length)).toLong

  test("automaton counts equal brute-force position probes, overlaps included") {
    val pats = Seq("aa", "ab", "aba", "b", "abab")
    val texts = Seq("ababab", "aaaa", "", "b", "xyz", "abababa", "aabbaabb")
    val ac = AcAutomaton(pats)
    texts.foreach { t =>
      val got = ac.count(t).toSeq
      val want = pats.map(brute(t, _))
      assert(got == want, s"text='$t' got=$got want=$want")
    }
  }

  test("nested and prefix patterns all fire ('tig' inside 'tiger')") {
    val ac = AcAutomaton(Seq("tig", "tiger", "er"))
    assert(ac.count("tigers like tigs").toSeq == Seq(2L, 1L, 1L))
  }

  test("column form matches the JVM automaton and stays in codegen") {
    val pats = Seq("an", "ana", "na")
    val df = Seq("banana", "bandana", "").toDF("s").repartition(2)
    val q = df.select(col("s"), MultiMatch.multiMatchCounts(col("s"), pats).as("c"))
    val got = q.as[(String, Seq[Long])].collect().toMap
    assert(got("banana") == Seq(brute("banana", "an"), brute("banana", "ana"), brute("banana", "na")))
    assert(got("bandana") == Seq(2L, 1L, 1L))
    assert(got("") == Seq(0L, 0L, 0L))
    q.collect()
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project"))
  }

  test("randomized parity against brute force") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    val pats = Seq("a", "ab", "ba", "abc", "cc", "bca")
    val ac = AcAutomaton(pats)
    (1 to 200).foreach { _ =>
      val t = (1 to rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(3))).mkString
      assert(ac.count(t).toSeq == pats.map(brute(t, _)), s"text='$t'")
    }
  }

  test("degenerate dictionaries are rejected loudly") {
    intercept[IllegalArgumentException] { AcMk(Seq.empty) }
    intercept[IllegalArgumentException] { AcMk(Seq("a", "")) }
    intercept[IllegalArgumentException] { AcMk(Seq("x", "x")) }
  }

  private def AcMk(pats: Seq[String]) =
    graft.plans.MultiMatchCount(
      org.apache.spark.sql.GraftSqlShim.expression(lit("t")), pats)
}
