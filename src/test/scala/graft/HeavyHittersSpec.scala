package graft

import graft.operators.{CountMin, HeavyHitters}
import org.apache.spark.sql.functions._

/** HeavyHitters: (1) on a SKEWED corpus the gated result equals the
  * plain groupBy + HAVING — exactness despite the approximate gate;
  * (2) the no-false-negative invariant the gate rests on: count-min
  * estimates never undershoot exact counts, for every key, even at
  * a deliberately collision-heavy width; (3) partition-independence;
  * (4) threshold edge — a key exactly AT ceil(θ·N) is kept. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish skew: key k appears ~1000/k times (k = 1..50)
  private lazy val skewed = spark.range(1, 51)
    .select(explode(expr("sequence(1, cast(1000 / id as int))")).as("rep"),
      concat(lit("key_"), format_string("%02d", $"id")).as("k"))
    .select($"k").persist()

  test("gated result equals exact groupBy + HAVING on skewed data") {
    for (share <- Seq(0.01, 0.05, 0.2)) {
      val n = skewed.count()
      val threshold = math.max(1L, math.ceil(share * n).toLong)
      val exact = skewed.groupBy($"k").agg(count(lit(1)).as("cnt"))
        .where($"cnt" >= threshold)
        .orderBy($"cnt".desc, $"k").as[(String, Long)].collect()
      val gated = HeavyHitters.exactAtLeast(skewed, "k", share)
        .orderBy($"cnt".desc, $"k").as[(String, Long)].collect()
      assert(gated.nonEmpty || exact.isEmpty)
      assert(gated.sameElements(exact), s"share=$share")
    }
  }

  test("count-min never underestimates, even at collision-heavy width") {
    val cells = CountMin.build(skewed, "k", depth = 4, width = 8)
    val est = CountMin.estimate(cells, skewed.distinct(), "k", depth = 4, width = 8)
    val exact = skewed.groupBy($"k").agg(count(lit(1)).as("exact"))
    val bad = est.join(exact, "k").where($"est" < $"exact").count()
    assert(bad == 0L)
  }

  test("result independent of input partitioning") {
    val a = HeavyHitters.exactAtLeast(skewed.repartition(3), "k", 0.05)
      .orderBy($"cnt".desc, $"k").as[(String, Long)].collect()
    val b = HeavyHitters.exactAtLeast(skewed.repartition(17), "k", 0.05)
      .orderBy($"cnt".desc, $"k").as[(String, Long)].collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("undersized width is rejected loudly with the minimum compliant width") {
    // minShare 0.001 needs width >= ceil(e/0.001) = 2719; the 1024
    // default silently admitted ~unbounded false positives before
    val ex = intercept[IllegalArgumentException] {
      HeavyHitters.exactAtLeast(skewed, "k", minShare = 0.001)
    }
    assert(ex.getMessage.contains("2719"))
    // a compliant explicit width works
    val ok = HeavyHitters.exactAtLeast(skewed, "k", minShare = 0.001, width = 4096)
    assert(ok.count() > 0)
  }

  test("a key exactly at the ceil(share*N) threshold is kept") {
    // 10 rows total: a x4, b x4, c x2 -> share 0.4 -> threshold 4
    val df = (Seq.fill(4)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c")).toDF("k")
    val out = HeavyHitters.exactAtLeast(df, "k", 0.4)
      .orderBy($"k").as[(String, Long)].collect()
    assert(out.toSeq == Seq(("a", 4L), ("b", 4L)))
  }
}
