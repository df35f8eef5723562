package graft

import graft.ops.{Experiment, Survival}
import org.apache.spark.sql.functions._

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier: hand curve with censoring and ties") {
    // t=1: 5 at risk, 1 event; t=2: 4 at risk, 1 event 1 censored
    // (censored at t counts at risk at t); t=3: 2 at risk, 1 event
    val df = Seq((1L, 1L), (2L, 1L), (2L, 0L), (3L, 1L), (4L, 0L))
      .toDF("dur", "e")
    val got = Survival.kaplanMeier(df, "dur", "e")
      .orderBy("t").as[(Long, Long, Long, Long, Option[Long])].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4)) ==
      Seq((1L, 5L, 1L, 0L), (2L, 4L, 1L, 1L), (3L, 2L, 1L, 0L), (4L, 1L, 0L, 1L)))
    def l(d: Long, n: Long) = math.round(1e9 * math.log(1.0 - d.toDouble / n))
    assert(got(0)._5 == Some(l(1, 5)))
    assert(got(1)._5 == Some(l(1, 5) + l(1, 4)))
    assert(got(2)._5 == Some(l(1, 5) + l(1, 4) + l(1, 2)))
    assert(got(3)._5 == got(2)._5) // pure censoring step: survival unchanged
  }

  test("kaplanMeier: extinction nulls the curve from that step on") {
    val df = Seq((1L, 1L), (2L, 1L)).toDF("dur", "e") // everyone dies by t=2
    val got = Survival.kaplanMeier(df, "dur", "e")
      .orderBy("t").as[(Long, Long, Long, Long, Option[Long])].collect().toSeq
    assert(got(0)._5.isDefined)
    assert(got(1)._5.isEmpty) // d = n at t=2
  }

  test("abTest: hand 2x2 with the closed-form chi-square") {
    // control: 30 users 10 conv; treatment: 30 users 20 conv
    val rows = Seq.fill(20)((0L, 0L)) ++ Seq.fill(10)((0L, 1L)) ++
      Seq.fill(10)((1L, 0L)) ++ Seq.fill(20)((1L, 1L))
    val got = Experiment.abTest(rows.toDF("v", "y"), "v", "y")
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])].head()
    assert((got._1, got._2, got._3, got._4) == ((30L, 30L, 10L, 20L)))
    assert(got._5 == Some(math.round(1e9 * (20.0 / 30 - 10.0 / 30))))
    val (a, b, c, d) = (20.0, 10.0, 10.0, 20.0)
    val chi2 = 60.0 * math.pow(a * d - b * c, 2) / ((a + b) * (c + d) * (a + c) * (b + d))
    assert(math.abs(got._6.get - math.round(1e9 * chi2)) <= 1)
  }

  test("abTest: empty variant yields NULLs; bad labels loud") {
    val oneSide = Seq((0L, 1L), (0L, 0L)).toDF("v", "y")
    val got = Experiment.abTest(oneSide, "v", "y")
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])].head()
    assert(got._5.isEmpty && got._6.isEmpty)
    intercept[Exception] {
      Experiment.abTest(Seq((2L, 1L)).toDF("v", "y"), "v", "y").collect()
    }
  }

  test("cuped: a perfectly pre-explained difference adjusts to zero") {
    // post = 2 * pre exactly; treatment got bigger PRE draws, so raw
    // lift is non-zero but cuped lift must vanish (theta = 2)
    val rows = Seq((0L, 10L, 20L), (0L, 20L, 40L), (1L, 30L, 60L), (1L, 40L, 80L))
    val got = Experiment.cuped(rows.toDF("v", "x", "y"), "v", "x", "y")
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])].head()
    assert(got._3.get > 0)             // raw lift 40
    assert(got._4 == Some(2000000000L)) // theta exactly 2
    assert(got._5 == Some(0L))          // adjusted lift exactly 0
  }

  test("cuped: zero pre-variance yields NULL theta and adjusted lift") {
    val rows = Seq((0L, 5L, 1L), (1L, 5L, 9L))
    val got = Experiment.cuped(rows.toDF("v", "x", "y"), "v", "x", "y")
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])].head()
    assert(got._3 == Some(8000000000L))
    assert(got._4.isEmpty && got._5.isEmpty)
  }
}
