package graft

import graft.plans.{GraftExtensions, ThresholdLevenshteinRule}
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._

class LevenshteinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def thresholds(df: org.apache.spark.sql.DataFrame): Seq[Option[Int]] = {
    val plan = df.queryExecution.optimizedPlan
    plan.collect { case p => p.expressions }.flatten
      .flatMap(_.collect { case Levenshtein(_, _, t) =>
        t.map(_.eval().asInstanceOf[Int]) })
  }

  // parquet-backed (not a LocalRelation): Catalyst folds filters over
  // literal local data before any optimizer rule can be observed
  private lazy val pairsPath = {
    val p = java.nio.file.Files.createTempDirectory("levrule").toString + "/pairs"
    Seq(
      ("kitten", "sitting"),  // dist 3
      ("flaw", "lawn"),       // dist 2
      ("abc", "abc"),         // dist 0
      (null.asInstanceOf[String], "x")
    ).toDF("a", "b").write.mode("overwrite").parquet(p)
    p
  }
  private def pairs = spark.read.parquet(pairsPath)

  test("lev <= k rewrites to the thresholded form with identical results") {
    GraftExtensions.register(spark)
    val q = pairs.where(levenshtein($"a", $"b") <= 2)
    assert(thresholds(q) == Seq(Some(2)), s"rule did not fire: ${q.queryExecution.optimizedPlan}")
    assert(q.select($"a").as[String].collect().toSet == Set("flaw", "abc"))
  }

  test("lev < k rewrites with k-1; literal-first mirror forms fire too") {
    GraftExtensions.register(spark)
    assert(thresholds(pairs.where(levenshtein($"a", $"b") < 3)) == Seq(Some(2)))
    assert(thresholds(pairs.where(lit(2) >= levenshtein($"a", $"b"))) == Seq(Some(2)))
    assert(thresholds(pairs.where(lit(3) > levenshtein($"a", $"b"))) == Seq(Some(2)))
    assert(pairs.where(levenshtein($"a", $"b") < 3).count() == 2)
  }

  test("non-literal and negative thresholds are left alone") {
    GraftExtensions.register(spark)
    // a data-dependent threshold (a lit() column would be constant-
    // folded into a literal first — after which the rule correctly
    // fires; that path is covered by the tests above)
    val colThreshold = pairs.where(levenshtein($"a", $"b") <= length($"b"))
    assert(thresholds(colThreshold) == Seq.empty ||
      thresholds(colThreshold).forall(_ == None))
    // negative k: predicate is always false; rule must not produce a
    // negative-threshold levenshtein (Spark would reject it)
    assert(pairs.where(levenshtein($"a", $"b") <= -1).count() == 0)
  }

  test("rule is idempotent under the fixed-point optimizer") {
    val once = ThresholdLevenshteinRule(
      pairs.where(levenshtein($"a", $"b") <= 2).queryExecution.analyzed)
    val twice = ThresholdLevenshteinRule(once)
    assert(once == twice)
  }
}
