package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization — the first transform of any
  * multilingual curation pipeline: the same visible text arrives
  * both precomposed (U+00E9 'é') and decomposed ('e' + U+0301), and
  * exact dedup / tokenization / fingerprinting all key on BYTES, so
  * un-normalized corpora silently split identical documents. The
  * reference strips whitespace only (`dags/spark/
  * transform_raw_weather.py` trim/rename paths); these are the
  * Unicode-correct versions of that cleanup.
  *
  * Two operations, matching DuckDB's core pair so both replay in the
  * cross-engine oracle:
  *  - `nfc`: canonical composition (java.text.Normalizer NFC) — the
  *    W3C-recommended storage form; byte-identical to DuckDB's
  *    `nfc_normalize`.
  *  - `stripAccents`: canonical decomposition (NFD — deliberately
  *    NOT NFKD: compatibility forms like the 'ﬁ' ligature or '²'
  *    are MEANING-bearing and survive, exactly as DuckDB's
  *    `strip_accents` keeps them) followed by removal of all
  *    combining marks (Unicode category Mn). 'é'→'e', 'ü'→'u',
  *    while mark-free letters like 'ø'/'ß'/'ł' pass through — they
  *    are distinct letters, not accented ones, and both engines
  *    agree (verified: NormalizeSpec pins DuckDB-checked pairs).
  *
  * Same engineering shape as `JaroWinkler`/`Hash60`: a native
  * `UnaryExpression` whose `doGenCode` is one static JVM call, so
  * normalization stays inside whole-stage codegen in the scan
  * projection instead of dropping the pipeline out of codegen the
  * way a Scala UDF would. Both functions are pure per-value maps —
  * fully parallel, no shuffle, no state — so they cost one pass over
  * the bytes at any corpus size.
  */
object NormalizeImpl {

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: NFC-normalized ASCII/Latin text is the common case
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  private val Marks = java.util.regex.Pattern.compile("\\p{Mn}+")

  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    val d = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    val out = Marks.matcher(d).replaceAll("")
    if (out == str) s else UTF8String.fromString(out)
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects STRING, got ${t.catalogString}")
  }

  protected override def nullSafeEval(v: Any): Any =
    NormalizeImpl.nfc(v.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NormalizeImpl.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strip_accents"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_strip_accents expects STRING, got ${t.catalogString}")
  }

  protected override def nullSafeEval(v: Any): Any =
    NormalizeImpl.stripAccents(v.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NormalizeImpl.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object Normalize {
  /** Column forms for direct library use. */
  def nfc(c: Column): Column =
    GraftSqlShim.column(NfcNormalize(GraftSqlShim.expression(c)))
  def stripAccents(c: Column): Column =
    GraftSqlShim.column(StripAccents(GraftSqlShim.expression(c)))
}
