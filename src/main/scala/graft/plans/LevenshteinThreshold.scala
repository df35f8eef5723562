package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite unbounded edit-distance comparisons into
  * Spark's THRESHOLDED levenshtein.
  *
  *   levenshtein(a, b) <= k   ==>   levenshtein(a, b, k) >= 0
  *   levenshtein(a, b) <  k   ==>   levenshtein(a, b, k-1) >= 0
  *
  * (plus the mirrored literal-first forms). The thresholded form is
  * the banded O(k·len) dynamic program with early exit — it returns
  * the exact distance when it is ≤ k and −1 otherwise, so the
  * rewritten predicate is equivalent row-for-row, including NULL
  * propagation (both forms are null-intolerant on the same inputs).
  *
  * Why a `Rule[LogicalPlan]` (SURVEY §7.3 decision table, extension
  * point (c)): users — and generated SQL — naturally write the
  * unbounded comparison, and no built-in optimization connects the
  * comparison context to the algorithm choice. The rewrite is local,
  * idempotent (the rewritten expression carries a threshold and no
  * longer matches), and purely a physical-cost improvement, which is
  * exactly what the `injectOptimizerRule` extension point is for.
  * FuzzyJoin calls the thresholded form directly; this rule gives
  * ad-hoc `spark.sql` users the same plan for free.
  *
  * Only non-negative INT literals rewrite: a column-valued or
  * negative threshold keeps the original expression (negative k is a
  * constant-false predicate the optimizer handles elsewhere).
  */
object ThresholdLevenshteinRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) if k >= 0 =>
      GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0))
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) if k >= 0 =>
      GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0))
    case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) if k >= 1 =>
      GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k - 1))), Literal(0))
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) if k >= 1 =>
      GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k - 1))), Literal(0))
  }
}
