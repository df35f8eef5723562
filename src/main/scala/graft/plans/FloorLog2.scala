package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native codegen'd floor-log2 of a long — semantically identical to
  * the string trick `length(bin(v)) - 1` (which both engines share
  * and the DuckDB oracles keep using), but with ZERO allocation:
  * `bin()` renders a up-to-64-char string per ROW, so in a sketch
  * build over 10^9 rows the binning becomes a string-allocation
  * benchmark. Branch-free: `63 - numberOfLeadingZeros(v | 1)` — the
  * `| 1` makes v = 0 yield 0 (as "0".length − 1 does) without a
  * conditional, and negative v yields 63 (two's-complement leading
  * bit), exactly matching bin()'s 64-char rendering. One CPU
  * instruction (LZCNT) inside whole-stage codegen.
  *
  * Same §7.3 decision as Hash60: a custom Expression, not a UDF —
  * `doGenCode` keeps the sketch projection in one codegen stage.
  */
case class FloorLog2(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_floor_log2 expects BIGINT or INT, got ${other.catalogString}")
  }
  override def prettyName: String = "graft_floor_log2"

  protected override def nullSafeEval(input: Any): Any = {
    val v = input match {
      case i: java.lang.Integer => i.longValue
      case l: java.lang.Long    => l.longValue
    }
    63L - java.lang.Long.numberOfLeadingZeros(v | 1L)
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"63L - java.lang.Long.numberOfLeadingZeros(((long) $c) | 1L)")

  override protected def withNewChildInternal(newChild: Expression): FloorLog2 =
    copy(child = newChild)
}

object FloorLog2 {
  /** Column form for direct library use. */
  def floorLog2(c: Column): Column = GraftSqlShim.column(FloorLog2(GraftSqlShim.expression(c)))
}
