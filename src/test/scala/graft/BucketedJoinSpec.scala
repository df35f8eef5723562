package graft

import graft.sources.Sinks
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Proves the co-located join strategy (Sinks.writeBucketed): two
  * tables bucketed on the join key by the same bucket count join with
  * ZERO shuffle exchanges — the write-once shuffle is the whole cost,
  * which is the layout a 100 TB fact-fact join needs. */
class BucketedJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("join of two same-bucketed tables has no shuffle exchange") {
    val a = (0L until 1000L).map(i => (i % 97, i, s"a$i")).toDF("k", "a_id", "a_val")
    val b = (0L until 800L).map(i => (i % 97, i, s"b$i")).toDF("k", "b_id", "b_val")
    Sinks.writeBucketed(a, "bkt_a", "k", 8)
    Sinks.writeBucketed(b, "bkt_b", "k", 8)
    // force a sort-merge join: an auto-broadcast would have no shuffle
    // regardless of bucketing and make this test vacuous
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), Seq("k"))
      val n = joined.count()
      // every (k, a, b) triple with matching k: 97 keys fully crossed
      val expected = (0L until 1000L).flatMap(i => (0L until 800L)
        .filter(j => i % 97 == j % 97).map(_ => 1)).size.toLong
      assert(n == expected)
      val exchanges = collectWithSubqueries(joined.queryExecution.executedPlan) {
        case e: ShuffleExchangeLike => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join should be exchange-free, found: ${exchanges.map(_.nodeName)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("groupBy on the bucket key is also exchange-free") {
    val a = (0L until 1000L).map(i => (i % 53, i)).toDF("k", "v")
    Sinks.writeBucketed(a, "bkt_g", "k", 8)
    try {
      val agg = spark.table("bkt_g").groupBy("k").agg(sum("v").as("s"))
      assert(agg.count() == 53)
      val exchanges = collectWithSubqueries(agg.queryExecution.executedPlan) {
        case e: ShuffleExchangeLike => e
      }
      assert(exchanges.isEmpty,
        s"bucketed aggregation should be exchange-free, found: ${exchanges.map(_.nodeName)}")
    } finally spark.sql("DROP TABLE IF EXISTS bkt_g")
  }
}
