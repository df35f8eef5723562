package graft

import org.apache.spark.sql.functions._

/** Accuracy bound for the engine-private approximate-distinct fast
  * path (deliberately unregistered — see SparkEntry's sketch
  * section): the HLL++ sketch cannot hash-match a DuckDB oracle
  * (sketches are engine-private), so its correctness story is a
  * measured error bound instead — |approx − exact| / exact within 3×
  * the configured relative standard deviation, per group, on the
  * real data at both spec SFs; the portable twin q_hll_portable
  * carries the exact cross-engine oracle for the same query shape.
  * 3σ makes the bound tight enough to catch a mis-wired sketch
  * (wrong column, wrong rsd) while loose enough to never flake on
  * the deterministic estimate. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct is within 3×rsd of the exact count per group") {
    val rsd = 0.01 // the fast path's configured precision
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dir = s"/root/testdata/$sf"
      val joined = Tables.events(spark, dir).where($"user_id".isNotNull)
        .groupBy($"event_type")
        .agg(
          approx_count_distinct($"user_id", rsd).as("approx"),
          countDistinct($"user_id").as("exact"))
        .select($"event_type", $"approx", $"exact")
        .as[(String, Long, Long)].collect()
      assert(joined.nonEmpty)
      joined.foreach { case (grp, approx, exact) =>
        val relErr = math.abs(approx - exact).toDouble / exact
        assert(relErr <= 3 * rsd, s"$sf/$grp: approx=$approx exact=$exact relErr=$relErr")
      }
    }
  }
}
