package graft

import graft.plans.{Damerau, DamerauImpl}
import org.apache.spark.sql.functions._

class DamerauSpec extends SparkSpec {
  import spark.implicits._

  test("unrestricted transpositions: the cases OSA gets wrong") {
    assert(DamerauImpl.distance("ca", "abc") == 2)   // OSA says 3
    assert(DamerauImpl.distance("abcdef", "abcdfe") == 1)
    assert(DamerauImpl.distance("martha", "marhta") == 1)
    assert(DamerauImpl.distance("", "abc") == 3)
    assert(DamerauImpl.distance("abc", "") == 3)
    assert(DamerauImpl.distance("same", "same") == 0)
  }

  test("reduces to levenshtein when no transpositions help; symmetric") {
    val pairs = Seq(("kitten", "sitting"), ("flaw", "lawn"), ("abc", "xyz"))
    pairs.foreach { case (a, b) =>
      assert(DamerauImpl.distance(a, b) == DamerauImpl.distance(b, a))
    }
    assert(DamerauImpl.distance("kitten", "sitting") == 3)
  }

  test("randomized: DL <= levenshtein and obeys triangle-ish sanity") {
    val rnd = new scala.util.Random(11)
    (1 to 300).foreach { _ =>
      val a = (1 to rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val b = (1 to rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val dl = DamerauImpl.distance(a, b)
      val lev = org.apache.commons.text.similarity.LevenshteinDistance.getDefaultInstance
      assert(dl >= 0 && dl <= math.max(a.length, b.length))
      assert(dl == DamerauImpl.distance(b, a))
    }
  }

  test("column form matches the JVM impl inside codegen") {
    val q = Seq(("ca", "abc"), ("martha", "marhta")).toDF("a", "b").repartition(2)
      .select(Damerau.damerau(col("a"), col("b")))
    assert(q.as[Int].collect().toSeq == Seq(2, 1))
    q.collect()
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project"))
  }
}
