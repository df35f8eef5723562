package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the dbt-test / Deequ
  * shape: a battery of named row-level predicates evaluated in ONE
  * conditional-aggregation scan (the same single-pass design as
  * `Funnel.counts` — a 20-check battery at 100 TB costs one read,
  * not twenty), plus key-uniqueness checks (one aggregate per key
  * set, the one shape a row predicate can't express).
  *
  * Output: (check, violations, total, passed) — a small report
  * frame. Gate a pipeline with `require(report.where(!$"passed")
  * .isEmpty)` or land it next to the data as an audit artifact.
  *
  * NULL predicate results count as VIOLATIONS (a check that cannot
  * evaluate did not pass — the conservative reading; wrap the
  * predicate in coalesce/isNotNull guards to express "NULL is
  * fine").
  */
object Expectations {

  /** Row-level checks, one scan: each entry is (name, predicate that
    * must hold for every row). */
  def rowChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    require(checks.map(_._1).distinct.size == checks.size, "check names must be unique")
    require(checks.forall(!_._1.contains("`")), "check names must not contain backticks")
    val aggs = checks.flatMap { case (name, pred) =>
      // coalesce(…, 0): an EMPTY frame passes vacuously instead of
      // reporting NULL counts
      Seq(coalesce(sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)), lit(0L))
        .as(s"__v_$name"))
    } :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = checks.map { case (name, _) =>
      // backtick-quote on re-resolution: a dotted check name (e.g.
      // "value.range") would otherwise parse as struct-field access
      struct(lit(name).as("check"), col(s"`__v_$name`").as("violations"),
        col("__total").as("total"))
    }
    row.select(explode(array(stacked: _*)).as("r"))
      .select(col("r.check"), col("r.violations"), col("r.total"),
        (col("r.violations") === 0L).as("passed"))
  }

  /** Uniqueness over a key set: violations = rows beyond the first
    * of each duplicated key (0 ⇔ the key set is unique). */
  def uniqueCheck(df: DataFrame, name: String, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") - 1L), lit(0L)).as("violations"),
        coalesce(sum(col("__n")), lit(0L)).as("total"))
      .select(lit(name).as("check"), col("violations"), col("total"),
        (col("violations") === 0L).as("passed"))
  }

  /** A full battery: row checks (one scan) + uniqueness checks (one
    * aggregate each), unioned into one report. */
  def report(df: DataFrame, checks: Seq[(String, Column)],
             uniqueKeys: Seq[(String, Seq[String])] = Seq.empty): DataFrame = {
    val base = rowChecks(df, checks)
    uniqueKeys.foldLeft(base) { case (acc, (name, keys)) =>
      acc.unionByName(uniqueCheck(df, name, keys))
    }
  }
}
