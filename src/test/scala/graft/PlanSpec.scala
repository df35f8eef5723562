package graft

import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan assertions — the "is this the plan you'd want at
  * 100 TB" checks: filter/projection pushdown into the parquet scan,
  * broadcast joins for dims, whole-stage codegen on the hot paths. */
class PlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q_scan_pushdown: predicates reach the parquet scan, schema is pruned") {
    val plan = planOf("q_scan_pushdown")
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("GreaterThan(l_discount"), plan)
    // only the 5 needed columns are read, not all 11
    assert(plan.contains("l_orderkey") && !plan.contains("l_extendedprice"), plan)
  }

  test("q_star_join: dims are broadcast, not shuffled") {
    val plan = planOf("q_star_join")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q1_agg: partial aggregation is map-side (two HashAggregate levels)") {
    val plan = planOf("q1_agg")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("partial_sum"), plan)
  }

  test("q_recap_hourly: projection pruning reaches the events scan") {
    val plan = planOf("q_recap_hourly")
    // props (unused JSON payload column) must not be read
    assert(!plan.contains("props"), plan)
  }

  test("flagship entry: broadcast dim join, no cartesian") {
    val df = SparkEntry.entry(spark)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
