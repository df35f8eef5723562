package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a serialized
  * `org.apache.spark.util.sketch.BloomFilter` — the per-row half of
  * the runtime-filter pattern (build a bloom over the small join
  * side's keys, pre-filter the big side before it reaches the
  * shuffle; see ops.BloomJoin for the operator and the scale
  * argument).
  *
  * The filter travels as SERIALIZED BYTES in the expression (task
  * binary, not a plan literal — a multi-MB binary literal would bloat
  * every plan print and EXPLAIN) and is deserialized lazily ONCE per
  * JVM referencing the expression, then probed inside whole-stage
  * codegen via `addReferenceObj` — no per-row deserialization, no UDF
  * serialization wall.
  *
  * Standard null propagation (NULL key → NULL); `mightContain` wraps
  * the probe in `coalesce(_, false)` so operator rewrites treat NULL
  * keys as "definitely absent" — a NULL key can never satisfy an
  * equi-join. No false negatives by construction; false positives
  * only widen the "maybe" set the exact join re-checks, never the
  * result.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain expects BIGINT or STRING key, got ${other.catalogString}")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  /** Codegen (and eval) entry — public so generated code can call it. */
  def probeLong(v: Long): Boolean = bloom.mightContainLong(v)
  def probeBytes(v: Array[Byte]): Boolean = bloom.mightContainBinary(v)

  protected override def nullSafeEval(input: Any): Any = child.dataType match {
    // the sketch's put(Long)/put(String) insert paths hash the long
    // value / utf8 bytes; probe through the matching entry points
    case LongType => probeLong(input.asInstanceOf[Long])
    case StringType => probeBytes(input.asInstanceOf[UTF8String].getBytes)
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("graftBloomProbe", this, classOf[BloomMightContain].getName)
    child.dataType match {
      case LongType => defineCodeGen(ctx, ev, c => s"$self.probeLong($c)")
      case StringType => defineCodeGen(ctx, ev, c => s"$self.probeBytes($c.getBytes())")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column form: does `key` probe positive? NULL keys → false. */
  def mightContain(key: Column, filterBytes: Array[Byte]): Column =
    coalesce(
      GraftSqlShim.column(BloomMightContain(GraftSqlShim.expression(key), filterBytes)),
      lit(false))
}
