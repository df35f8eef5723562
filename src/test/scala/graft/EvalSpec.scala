package graft

import graft.ops.Eval
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("hand AUC with a tie: midranks give 0.875") {
    // scores [1,2,2,3], labels [0,1,0,1]:
    // pairs (pos>neg): (2,1) win, (2,2) half, (3,1) win, (3,2) win -> 3.5/4
    val df = Seq((1L, 0L), (2L, 1L), (2L, 0L), (3L, 1L)).toDF("score", "y")
    val got = Eval.aucFromScores(df, "score", "y")
      .as[(Long, Long, Option[Long])].head()
    assert(got == ((2L, 2L, Some(875000000L))))
  }

  test("perfect separation is 1.0, reversed is 0.0, tied-everything is 0.5") {
    val perfect = Seq((10L, 1L), (9L, 1L), (2L, 0L), (1L, 0L)).toDF("score", "y")
    assert(Eval.aucFromScores(perfect, "score", "y")
      .as[(Long, Long, Option[Long])].head()._3 == Some(1000000000L))
    val reversed = Seq((1L, 1L), (2L, 0L)).toDF("score", "y")
    assert(Eval.aucFromScores(reversed, "score", "y")
      .as[(Long, Long, Option[Long])].head()._3 == Some(0L))
    val tied = Seq((5L, 1L), (5L, 0L), (5L, 1L), (5L, 0L)).toDF("score", "y")
    assert(Eval.aucFromScores(tied, "score", "y")
      .as[(Long, Long, Option[Long])].head()._3 == Some(500000000L))
  }

  test("single-class inputs yield NULL, not a division error") {
    val onlyPos = Seq((1L, 1L), (2L, 1L)).toDF("score", "y")
    assert(Eval.aucFromScores(onlyPos, "score", "y")
      .as[(Long, Long, Option[Long])].head()._3.isEmpty)
  }

  test("NULLs and non-binary labels are rejected loudly") {
    val badLabel = Seq((1L, 2L)).toDF("score", "y")
    intercept[Exception] { Eval.aucFromScores(badLabel, "score", "y").collect() }
    val nullScore = Seq((Option.empty[Long], Some(1L))).toDF("score", "y")
    intercept[Exception] { Eval.aucFromScores(nullScore, "score", "y").collect() }
  }

  test("partitioning-invariant (rank aggregates see only order statistics)") {
    val rows = (1L to 500L).map(i => ((i * 37) % 97, (i % 3) / 2))
    val a = Eval.aucFromScores(rows.toDF("score", "y").repartition(1), "score", "y")
      .as[(Long, Long, Option[Long])].head()
    val b = Eval.aucFromScores(rows.toDF("score", "y").repartition(13), "score", "y")
      .as[(Long, Long, Option[Long])].head()
    assert(a == b)
  }

  test("calibrationBins: hand ECE on a 2-bin split") {
    // bins=2: pct<50 -> bin 0, >=50 -> bin 1 (50*2 div 100 = 1)
    // bin0: pcts {10,30}, labels {0,1}: |100*1-40|/(100*4) = 0.15
    // bin1: pcts {80,90}, labels {1,1}: |200-170|/400 = 0.075
    val df = Seq((10L, 0L), (30L, 1L), (80L, 1L), (90L, 1L)).toDF("p", "y")
    val got = graft.ops.Eval.calibrationBins(df, "p", "y", bins = 2)
      .orderBy("bin").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L, 1L, 40L, 150000000L), (1L, 2L, 2L, 170L, 75000000L)))
  }

  test("calibrationBins: pct 100 lands in the top bin; out-of-range rejected") {
    val df = Seq((100L, 1L)).toDF("p", "y")
    val got = graft.ops.Eval.calibrationBins(df, "p", "y", bins = 10)
      .select("bin").as[Long].head()
    assert(got == 9L)
    intercept[Exception] {
      graft.ops.Eval.calibrationBins(Seq((101L, 1L)).toDF("p", "y"), "p", "y").collect()
    }
  }
}
