package graft

import graft.ops.Mixture
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  // uneven sources: a is huge, c is the binding (scarcest per weight)
  private def corpus = (
    (1L to 8000L).map(i => (i, "a")) ++
      (8001L to 10000L).map(i => (i, "b")) ++
      (10001L to 10500L).map(i => (i, "c"))
    ).toDF("id", "src")

  test("realized proportions track the weights; the binding source is used whole") {
    // weights 50/25/25; c has 500 rows at weight .25 → scale 2000:
    // target 1000 a, 500 b, 500 c (c kept whole)
    val out = Mixture.byWeights(corpus, "id", "src", Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
    val got = out.groupBy($"src").count().as[(String, Long)].collect().toMap
    assert(got("c") == 500L, s"binding source must be kept whole: $got")
    // md5-threshold realization: within ~5% of the 1000/500 targets
    assert(math.abs(got("a") - 1000L) < 50, got.toString)
    assert(math.abs(got("b") - 500L) < 35, got.toString)
  }

  test("membership is deterministic and a subset of the corpus, preserving columns") {
    val w = Map("a" -> 1.0, "b" -> 1.0)
    val x = Mixture.byWeights(corpus, "id", "src", w)
    val y = Mixture.byWeights(corpus, "id", "src", w)
    assert(x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty)
    assert(x.columns.toSeq == Seq("id", "src"))
    // equal weights over unequal sources: b binds, both draw ~2000
    val got = x.groupBy($"src").count().as[(String, Long)].collect().toMap
    assert(got("b") == 2000L && math.abs(got("a") - 2000L) < 120, got.toString)
  }

  test("unweighted sources are dropped; bad weights are rejected") {
    val out = Mixture.byWeights(corpus, "id", "src", Map("a" -> 1.0))
    assert(out.where($"src" =!= "a").isEmpty)
    intercept[IllegalArgumentException] {
      Mixture.byWeights(corpus, "id", "src", Map.empty)
    }
    intercept[IllegalArgumentException] {
      Mixture.byWeights(corpus, "id", "src", Map("a" -> 0.0))
    }
  }

  test("binding source keeps its TOP hash bucket (floor-underflow regression)") {
    // weights (a=0.2, b=1.0) with |a|=50, |b|=1000 make a the binding
    // source AND make floor(B·scale·share/n) land on B-1 in double
    // arithmetic; id 1706733 hashes into bucket B-1 = 1048575, so
    // without the binding-source pin it would be silently dropped
    val df = ((1L to 49L).map((_, "a")) ++ Seq((1706733L, "a")) ++
      (10001L to 11000L).map((_, "b"))).toDF("id", "src")
    val out = Mixture.byWeights(df, "id", "src", Map("a" -> 0.2, "b" -> 1.0))
    assert(out.where($"src" === "a").count() == 50L, "binding source must be whole")
    assert(out.where($"id" === 1706733L).count() == 1L, "top-bucket row was dropped")
  }

  test("weights are scale-free: normalization doesn't change the draw") {
    val x = Mixture.byWeights(corpus, "id", "src", Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
    val y = Mixture.byWeights(corpus, "id", "src", Map("a" -> 2.0, "b" -> 1.0, "c" -> 1.0))
    assert(x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty)
  }

  test("byTemperatureSqrt keeps the smallest group whole, flattens the rest") {
    val got = Mixture.byTemperatureSqrt(corpus, "id", "src")
    val counts = got.groupBy($"src").count().as[(String, Long)].collect().toMap
    // c (500) kept whole; a kept ~ 8000*sqrt(500/8000)=2000; b ~ 2000*sqrt(0.25)=1000
    assert(counts("c") == 500L)
    assert(math.abs(counts("a") - 2000L) < 150, counts.toString)
    assert(math.abs(counts("b") - 1000L) < 100, counts.toString)
    // flattening, not inversion: bigger groups still >= smaller ones
    assert(counts("a") >= counts("b") && counts("b") >= counts("c"))
  }

  test("byTemperatureSqrt is deterministic and a subset per group") {
    val a = Mixture.byTemperatureSqrt(corpus, "id", "src")
    val b = Mixture.byTemperatureSqrt(corpus, "id", "src")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.join(corpus, Seq("id", "src"), "left_anti").count() == 0)
  }

  test("equal-size groups pass through whole under temperature sampling") {
    val eq = ((1L to 100L).map(i => (i, "x")) ++ (101L to 200L).map(i => (i, "y")))
      .toDF("id", "src")
    assert(Mixture.byTemperatureSqrt(eq, "id", "src").count() == 200L)
  }

  private def alloc(counts: Seq[(String, Long)], budget: Long): Map[String, Long] =
    Mixture.waterFill(counts.toDF("g", "n"), "g", "n", budget)
      .select($"g", $"alloc").as[(String, Long)].collect().toMap

  test("waterFill: hand-checked level — tail kept whole, the heavy group capped") {
    // sizes 10, 20, 70; budget 60 -> tau=15: S=10+15+15=40? no:
    // segment walk: [0,10): tau=20 invalid; [10,20): S=10+2tau, tau=25 invalid;
    // [20,70): S=30+tau, tau=30 ok. S=60, r=0.
    assert(alloc(Seq("a" -> 10L, "b" -> 20L, "c" -> 70L), 60L) ==
      Map("a" -> 10L, "b" -> 20L, "c" -> 30L))
  }

  test("waterFill: remainder goes +1 to the first capped groups in group order") {
    // sizes 10,10,10,10; budget 7 -> tau=1, S=4, r=3: groups a,b,c get 2, d gets 1
    assert(alloc(Seq("a" -> 10L, "b" -> 10L, "c" -> 10L, "d" -> 10L), 7L) ==
      Map("a" -> 2L, "b" -> 2L, "c" -> 2L, "d" -> 1L))
  }

  test("waterFill: the allocation always sums exactly to min(budget, corpus)") {
    val sizes = Seq("w" -> 13L, "x" -> 999L, "y" -> 7L, "z" -> 250L, "v" -> 0L)
    for (b <- Seq(1L, 5L, 20L, 270L, 1268L, 1269L, 5000L)) {
      val a = alloc(sizes, b)
      assert(a.values.sum == math.min(b, 1269L), s"budget $b")
      assert(a.forall { case (g, v) => v <= sizes.toMap.apply(g) }, s"budget $b: over-alloc")
    }
    // over-budget: everything whole
    assert(alloc(sizes, 5000L) == sizes.toMap)
  }

  test("waterFill is partitioning-independent and guards bad input loudly") {
    val df = (1L to 500L).map(i => (s"g${i % 37}", i % 91)).toDF("g", "n")
      .groupBy($"g").agg(sum($"n").as("n"))
    val a = Mixture.waterFill(df.repartition(11), "g", "n", 4000L)
      .orderBy($"g").collect()
    val b = Mixture.waterFill(df, "g", "n", 4000L).orderBy($"g").collect()
    assert(a.nonEmpty && a.sameElements(b))
    intercept[IllegalArgumentException](
      Mixture.waterFill(df, "g", "n", 0L))
    assert(intercept[IllegalArgumentException](
        Mixture.waterFill(Seq(("a", Option.empty[Long])).toDF("g", "n"), "g", "n", 5L))
      .getMessage.contains("negative size") ||
      intercept[IllegalArgumentException](
        Mixture.waterFill(Seq(("a", Option.empty[Long])).toDF("g", "n"), "g", "n", 5L))
        .getMessage.contains("NULL"))
    assert(intercept[IllegalArgumentException](
        Mixture.waterFill(Seq(("a", -1L)).toDF("g", "n"), "g", "n", 5L))
      .getMessage.contains("negative"))
  }
}
