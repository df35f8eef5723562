package graft

import org.apache.spark.sql.functions._
import graft.operators.PortableHll

/** PortableHll: the engine-independent register sketch. Three
  * contracts — (1) accuracy: the estimate stays within 3×rsd of the
  * exact distinct count per group at both spec SFs (linear-counting
  * regime included); (2) merge-invariance: rollup over fine-grain
  * register frames is bit-identical to building registers over the
  * raw union directly — the property that makes stored sketch rows a
  * safe substitute for raw data; (3) partition-independence: the
  * registers and estimates are the same frame at any parallelism
  * (max-merge is order-free), the local proxy for cluster-shape
  * independence. Cross-ENGINE equality is q_hll_portable's exact
  * DuckDB oracle, not re-tested here. */
class PortableHllSpec extends SparkSpec {
  import spark.implicits._

  private val lgK = 10
  private val rsd = 1.04 / math.sqrt((1L << lgK).toDouble) // ~3.25%

  test("estimate within 3×rsd of exact distinct count per group") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val ev = Tables.events(spark, s"/root/testdata/$sf").where($"user_id".isNotNull)
      val est = PortableHll.estimate(
          PortableHll.registers(ev, Seq("event_type"), "user_id", lgK),
          Seq("event_type"), lgK)
        .as[(String, Long)].collect().toMap
      val exact = ev.groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
        .as[(String, Long)].collect().toMap
      assert(exact.nonEmpty && est.keySet == exact.keySet)
      exact.foreach { case (grp, n) =>
        val relErr = math.abs(est(grp) - n).toDouble / n
        assert(relErr <= 3 * rsd, s"$sf/$grp: est=${est(grp)} exact=$n relErr=$relErr")
      }
    }
  }

  test("rollup of fine-grain registers equals direct build (bit-identical)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01").where($"user_id".isNotNull)
      .withColumn("day", to_date($"ts"))
    val viaRollup = PortableHll.rollup(
        PortableHll.registers(ev, Seq("event_type", "day"), "user_id", lgK),
        Seq("event_type"))
      .orderBy($"event_type", $"reg").as[(String, Int, Int)].collect()
    val direct = PortableHll.registers(ev, Seq("event_type"), "user_id", lgK)
      .orderBy($"event_type", $"reg").as[(String, Int, Int)].collect()
    assert(viaRollup.nonEmpty && viaRollup.sameElements(direct))
    // idempotent re-merge (at-least-once delivery cannot corrupt)
    val again = PortableHll.rollup(
        PortableHll.registers(ev, Seq("event_type", "day"), "user_id", lgK)
          .unionByName(PortableHll.registers(ev, Seq("event_type", "day"), "user_id", lgK)),
        Seq("event_type"))
      .orderBy($"event_type", $"reg").as[(String, Int, Int)].collect()
    assert(again.sameElements(direct))
  }

  test("registers and estimate independent of partitioning") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01").where($"user_id".isNotNull)
    val est3 = PortableHll.estimate(
        PortableHll.registers(ev.repartition(3), Seq("event_type"), "user_id", lgK),
        Seq("event_type"), lgK)
      .orderBy($"event_type").as[(String, Long)].collect()
    val est17 = PortableHll.estimate(
        PortableHll.registers(ev.repartition(17), Seq("event_type"), "user_id", lgK),
        Seq("event_type"), lgK)
      .orderBy($"event_type").as[(String, Long)].collect()
    assert(est3.nonEmpty && est3.sameElements(est17))
  }
}
