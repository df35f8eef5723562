package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Deterministic long arg-min aggregate: the `value` of the
  * lexicographically smallest `(ord, value)` pair in the group — i.e.
  * "min by ord, ties broken by the smallest value". Order-independent
  * by construction (a min over a total order), so results are
  * bit-identical under any partitioning — the property every graft
  * iterative operator's cross-engine oracle rests on.
  *
  * Why this exists (r12 verdict item #1, the LPA scale finding): the
  * idiomatic spelling `min(struct(ord, value))` is NOT a
  * HashAggregateExec aggregate — a struct is not a mutable fixed-width
  * buffer type, so Catalyst plans ObjectHashAggregateExec, which falls
  * back to SORT-based aggregation after
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * (default 128) distinct keys. On LabelProp's round-1 vote frame the
  * (id, label) group count ≈ the EDGE count, so every high-cardinality
  * round devolved into a full spilled sort of the vote stream —
  * measured exponent 1.47 across the sf1→sf10 decade. This
  * DeclarativeAggregate keeps the same semantics in three primitive
  * buffer slots (flag, ord, value), which HashAggregateExec accepts:
  * the arg-min runs inside whole-stage codegen with spill-safe hash
  * aggregation, like `min`/`max` themselves.
  *
  * Null contract: input rows with a NULL ord or value are ignored
  * (the SQL aggregate convention); an all-NULL/empty group yields
  * NULL.
  */
case class ArgMinLong(ord: Expression, value: Expression)
  extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(ord, value)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_argmin_long"

  override def checkInputDataTypes(): TypeCheckResult =
    if (ord.dataType == LongType && value.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BIGINT, BIGINT), got " +
        s"(${ord.dataType.catalogString}, ${value.dataType.catalogString})")

  // bOrd doubles as the "seen anything yet" flag via nullability —
  // exactly how Spark's own Min/Max buffers work, so the buffer stays
  // two nullable longs (mutable primitive slots, HashAggregate-legal).
  private lazy val bOrd = AttributeReference("bOrd", LongType)()
  private lazy val bVal = AttributeReference("bVal", LongType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(bOrd, bVal)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, LongType), Literal.create(null, LongType))

  /** (candOrd, candVal) strictly beats the current buffer — buffer
    * empty, smaller ord, or equal ord with smaller value. Candidates
    * are pre-checked non-null by the caller. */
  private def beats(candOrd: Expression, candVal: Expression): Expression =
    Or(IsNull(bOrd),
      Or(LessThan(candOrd, bOrd),
        And(EqualTo(candOrd, bOrd), LessThan(candVal, bVal))))

  override lazy val updateExpressions: Seq[Expression] = {
    val take = And(And(IsNotNull(ord), IsNotNull(value)), beats(ord, value))
    Seq(If(take, ord, bOrd), If(take, value, bVal))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val take = And(IsNotNull(bOrd.right), beats(bOrd.right, bVal.right))
    Seq(If(take, bOrd.right, bOrd.left), If(take, bVal.right, bVal.left))
  }

  override lazy val evaluateExpression: Expression = bVal

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArgMinLong =
    copy(ord = newChildren(0), value = newChildren(1))
}

object ArgMinLong {
  /** Column form: the `value` at the group's smallest `(ord, value)`
    * pair. Both columns must be BIGINT. */
  def argMinLong(ord: Column, value: Column): Column =
    GraftSqlShim.column(
      ArgMinLong(GraftSqlShim.expression(ord), GraftSqlShim.expression(value))
        .toAggregateExpression())
}
