package graft

import graft.functions.TextFunctions
import graft.plans.{GraftExtensions, Hash60}
import org.apache.spark.sql.functions._

class Hash60Spec extends SparkSpec {
  import spark.implicits._

  private lazy val strs =
    (Seq("", "a", "abc", "the_quick_brown", "€ünïcødé", "x" * 500) ++
      (0 until 200).map(i => s"token_$i")).toDF("s")

  test("native Hash60 ≡ composed conv(substring(md5)) form, incl. unicode and empty") {
    val rows = strs.select(
      Hash60.hash60($"s").as("native"),
      TextFunctions.hash60Composed($"s").as("composed")
    ).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("registered SQL function graft_hash60 resolves and matches") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT graft_hash60('abc') AS h").head().getLong(0)
    val expected = strs.limit(0).sparkSession.range(1)
      .select(TextFunctions.hash60Composed(lit("abc"))).head().getLong(0)
    assert(r == expected)
  }

  test("native expression stays inside whole-stage codegen") {
    // needs a real scan (a LocalTableScan projection has no codegen stage)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = docs.select(Hash60.hash60($"text")).queryExecution.executedPlan.toString
    // whole-stage codegen renders as a "*(n)" stage prefix
    assert(plan.contains("*(1) Project"), plan)
    assert(plan.contains("graft_hash60"), plan)
  }

  test("values are non-negative 60-bit") {
    val vals = strs.select(Hash60.hash60($"s")).as[Long].collect()
    assert(vals.forall(v => v >= 0 && v < (1L << 60)))
  }
}
