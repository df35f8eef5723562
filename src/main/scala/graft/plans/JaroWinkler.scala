package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler similarity — the other classic
  * entity-resolution scorer next to `levenshtein`: order-sensitive
  * but transposition-tolerant, with the Winkler common-prefix boost
  * that matters for names ("martha"/"marhta" = 0.961 where
  * levenshtein charges 2 full edits).
  *
  * Standard definition (Winkler 1990, as implemented by DuckDB and
  * Apache Commons Text): match window ⌊max(|a|,|b|)/2⌋−1,
  * transpositions = half the out-of-order matches,
  * jaro = (m/|a| + m/|b| + (m−t)/m)/3, and the prefix boost
  * jw = jaro + ℓ·p·(1−jaro) with ℓ = common prefix capped at 4,
  * p = 0.1, applied when jaro exceeds the 0.7 boost threshold.
  *
  * Spark has no built-in; the alternatives are a Scala UDF (breaks
  * codegen, serializes per-row) or shipping strings to a Python
  * worker. This is the Hash60/QDotLong decision again: a
  * `BinaryExpression` whose `doGenCode` calls one static JVM method,
  * so the scorer stays inside whole-stage codegen next to the
  * blocking filters it runs behind (`ops.FuzzyJoin`).
  *
  * Determinism: pure integer match-counting plus a fixed IEEE
  * formula — bit-stable across runs and partitionings. Cross-engine,
  * DuckDB computes the same formula with possibly different ulp-level
  * operation order, so the registered oracle compares at nano
  * resolution (the q_bm25 precedent).
  */
object JaroWinklerImpl {

  def similarity(a: UTF8String, b: UTF8String): Double = {
    // operate on code UNITS (chars) — both engines treat BMP text
    // identically; the synthetic corpora are ASCII
    val s = a.toString
    val t = b.toString
    jaroWinkler(s, t)
  }

  def jaroWinkler(s: String, t: String): Double = {
    val sl = s.length
    val tl = t.length
    if (sl == 0 && tl == 0) return 1.0
    if (sl == 0 || tl == 0) return 0.0
    val window = math.max(0, math.max(sl, tl) / 2 - 1)
    val sMatch = new Array[Boolean](sl)
    val tMatch = new Array[Boolean](tl)
    var m = 0
    var i = 0
    while (i < sl) {
      val lo = math.max(0, i - window)
      val hi = math.min(tl - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars of s vs matched chars of t, in order
    var trans = 0
    var j = 0
    i = 0
    while (i < sl) {
      if (sMatch(i)) {
        while (!tMatch(j)) j += 1
        if (s.charAt(i) != t.charAt(j)) trans += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / sl + md / tl + (md - trans / 2) / md) / 3.0
    // Winkler boost above the standard 0.7 threshold
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(sl, tl))
    while (l < maxL && s.charAt(l) == t.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler expects (STRING, STRING), got (${l.catalogString}, ${r.catalogString})")
    }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.JaroWinklerImpl.similarity($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Column form for direct library use. */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftSqlShim.column(JaroWinkler(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
}
