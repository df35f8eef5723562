package graft

import graft.ops.DataProfile
import org.apache.spark.sql.functions._
import java.nio.file.Files

class DataProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts rows, nulls, exact distincts, and min/max per column") {
    val df = Seq(
      (1L, Some(10.0)), (2L, None), (3L, Some(10.0)), (4L, Some(-2.5))
    ).toDF("id", "v")
    val out = DataProfile.profileNumeric(df, Seq("id", "v")).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val id = out("id")
    assert(id.getAs[Long]("n_rows") == 4 && id.getAs[Long]("n_null") == 0)
    assert(id.getAs[Long]("n_distinct") == 4)
    assert(id.getAs[Double]("min_val") == 1.0 && id.getAs[Double]("max_val") == 4.0)
    val v = out("v")
    assert(v.getAs[Long]("n_null") == 1)
    assert(v.getAs[Long]("n_distinct") == 2) // distinct excludes null
    assert(v.getAs[Double]("min_val") == -2.5 && v.getAs[Double]("max_val") == 10.0)
  }

  test("each column's aggregate reads ONLY that column from parquet") {
    val path = Files.createTempDirectory("graft-prof").toString
    spark.range(100).select($"id", ($"id" * 2.0).as("wide1"), ($"id" % 7).as("wide2"))
      .write.mode("overwrite").parquet(path)
    val one = DataProfile.profileNumeric(spark.read.parquet(path), Seq("wide2"))
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<wide2"), plan)
    assert(!plan.contains("wide1"), plan)
  }
}
