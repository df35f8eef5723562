package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = (1L to 5000L).toDF("id")

  test("assignSplit is disjoint, exhaustive, and deterministic") {
    val a = Sampling.assignSplit(ids, "id", 80, 10)
    val counts = a.groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 5000L)
    // uniform md5 buckets: each cut lands within a loose tolerance
    assert(counts("train") > 3700 && counts("train") < 4300)
    assert(counts("valid") > 300 && counts("valid") < 700)
    assert(counts("test") > 300 && counts("test") < 700)
    // re-evaluation assigns identically (pure function of the key)
    val b = Sampling.assignSplit(ids, "id", 80, 10)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("sampleByHash(pct) is the pct-prefix of the same bucket space") {
    val s10 = Sampling.sampleByHash(ids, "id", 10).as[Long].collect().toSet
    val s20 = Sampling.sampleByHash(ids, "id", 20).as[Long].collect().toSet
    assert(s10.subsetOf(s20), "growing pct must only ADD rows (stable membership)")
    assert(s10.nonEmpty && s20.size < 5000)
  }

  test("membership is stable under corpus growth") {
    val small = Sampling.sampleByHash(ids.where($"id" <= 1000), "id", 50).as[Long].collect().toSet
    val large = Sampling.sampleByHash(ids, "id", 50).as[Long].collect().toSet
    assert(small == large.filter(_ <= 1000L), "adding rows must not reshuffle old assignments")
  }

  test("stratifiedSampleByHash applies each stratum's pct over the same bucket space") {
    val df = ids.withColumn("stratum",
      when($"id" % 3 === 0, "a").when($"id" % 3 === 1, "b").otherwise("c"))
    val out = Sampling.stratifiedSampleByHash(df, "id", "stratum",
      Map("a" -> 100, "b" -> 0), defaultPct = 20)
    val kept = out.select($"id", $"stratum").as[(Long, String)].collect()
    val byStratum = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byStratum("a").size == 5000 / 3 + 1 || byStratum("a").size == 5000 / 3)
    assert(!byStratum.contains("b"))
    // stratum c at 20% = exactly the global 20% sample restricted to c
    val global20 = Sampling.sampleByHash(df, "id", 20)
      .where($"stratum" === "c").select($"id").as[Long].collect().toSet
    assert(byStratum.getOrElse("c", Set.empty) == global20)
  }

  test("hashBucket matches the documented DuckDB formula on a spot value") {
    // graft_hash60('42') = first 15 hex chars of md5('42') as a long
    val h = ids.where($"id" === 42L)
      .select(Sampling.hashBucket($"id", 100).as("b")).as[Long].head()
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("42".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = java.lang.Long.parseLong(md.take(15), 16) % 100
    assert(h == expected)
  }
}
