package graft

import graft.plans.{JaroWinkler, JaroWinklerImpl}
import org.apache.spark.sql.functions._

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  test("matches the canonical Winkler reference values (and DuckDB) exactly") {
    // textbook pairs — the same doubles DuckDB's
    // jaro_winkler_similarity returns, verified offline
    assert(JaroWinklerImpl.jaroWinkler("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(JaroWinklerImpl.jaroWinkler("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(JaroWinklerImpl.jaroWinkler("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(JaroWinklerImpl.jaroWinkler("CRATE", "TRACE") == 0.7333333333333334)
    assert(JaroWinklerImpl.jaroWinkler("red bolt", "rd bolt") == 0.9625)
    // ODD transposition count (a 3-cycle of matched chars: out-of-order
    // matches a,b,c vs c,a,b -> 3 mismatched positions): pins the
    // floor-halving convention `(m - t/2)` in integer arithmetic.
    // DuckDB returns the same double (jaro = (1 + 1 + 5/6)/3), so the
    // cross-engine q_jaro_rank oracle is safe on odd-trans inputs too;
    // exact halving (t=1.5) would give 0.9166... instead.
    assert(JaroWinklerImpl.jaroWinkler("abcxyz", "cabxyz") == 0.9444444444444445)
  }

  test("edge cases: empty, identical, disjoint, null") {
    assert(JaroWinklerImpl.jaroWinkler("", "") == 1.0)
    assert(JaroWinklerImpl.jaroWinkler("", "x") == 0.0)
    assert(JaroWinklerImpl.jaroWinkler("abc", "abc") == 1.0)
    assert(JaroWinklerImpl.jaroWinkler("abc", "xyz") == 0.0)
    val df = Seq(("abc", null.asInstanceOf[String])).toDF("a", "b")
    val out = df.select(JaroWinkler.jaroWinkler($"a", $"b")).collect()
    assert(out.head.isNullAt(0)) // null in, null out (BinaryExpression default)
  }

  test("the expression works inside whole-stage codegen and matches the impl") {
    val pairs = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("hash join", "hash joins"))
      .toDF("a", "b")
    val got = pairs.select($"a", $"b", JaroWinkler.jaroWinkler($"a", $"b").as("jw"))
      .as[(String, String, Double)].collect()
    got.foreach { case (a, b, jw) => assert(jw == JaroWinklerImpl.jaroWinkler(a, b)) }
    // symmetric
    val rev = pairs.select(JaroWinkler.jaroWinkler($"b", $"a")).as[Double].collect()
    assert(got.map(_._3).sameElements(rev))
    // non-string inputs are a type error, not a runtime surprise
    val ex = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").select(JaroWinkler.jaroWinkler($"a", $"b")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("string"))
  }

  test("boost applies only above the 0.7 jaro threshold with a shared prefix") {
    // jaro(CRATE, TRACE) = 0.7333 > 0.7 but prefix length 0 -> no boost
    assert(JaroWinklerImpl.jaroWinkler("CRATE", "TRACE") ==
      JaroWinklerImpl.jaroWinkler("TRACE", "CRATE"))
    // a long shared prefix on a high-jaro pair is boosted
    val plain = JaroWinklerImpl.jaroWinkler("abcdx", "abcdy")
    assert(plain > 0.8 && plain < 1.0)
  }
}
