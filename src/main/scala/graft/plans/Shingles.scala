package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd word-shingle hashing — the front door of every
  * near-dup operator (graft.operators.NearDup): text → sorted distinct
  * array of 64-bit n-gram shingle hashes, in ONE pass over the
  * document's UTF-8 bytes.
  *
  * Replaces round 1's composed form (`split` → `transform(xxhash64)` →
  * `transform(sequence, i => xxhash64(slice))` → `array_distinct` →
  * `sort_array`): higher-order functions are CodegenFallback
  * (interpreted), allocate a token-string array plus two intermediate
  * hash arrays per row, and dispatch a lambda per element. Measured
  * 17 s → <1 s on the sf0.1 documents corpus (5k docs).
  *
  * Semantics mirrored from the composed form exactly:
  *  - tokens = Java `split(" +", -1)`: segments between maximal runs
  *    of 0x20 bytes, INCLUDING an empty leading segment when the text
  *    starts with a space and an empty trailing segment when it ends
  *    with one (UTF-8 guarantees no multibyte char contains 0x20, so
  *    the byte scan is equivalent to the char scan).
  *  - fewer than n tokens (or null text) → EMPTY array, not null.
  *  - output = sort_array(array_distinct(shingle hashes)).
  * Hash identity is engine-internal only (the DuckDB oracle recomputes
  * Jaccard from shingle strings), so the mixing function just needs
  * determinism and per-set uniqueness: per-token XXH64 over the raw
  * bytes, then an XXH64.hashLong chain across the n-token window —
  * position-sensitive, collision odds ≈ |set|²/2⁶⁴ per pair.
  */
/** The ONE `split(" +", -1)`-equivalent token-boundary walk, shared by
  * every tokenizing expression (ShingleImpl, SimHash60Impl) so the
  * subtle boundary semantics — empty leading/trailing tokens, space-
  * run skipping, the i<=len end-of-input emit — live in exactly one
  * place. Calls f(start, endExclusive) per token. */
object TokenWalk {
  def foreachToken(bytes: Array[Byte], f: (Int, Int) => Unit): Unit = {
    val len = bytes.length
    var i = 0
    var start = 0
    while (i <= len) {
      val atSpace = i < len && bytes(i) == ' '.toByte
      if (atSpace || i == len) {
        f(start, i) // token = [start, i): emitted at each space run or end
        i += 1
        while (i < len && bytes(i) == ' '.toByte) i += 1
        start = i
      } else {
        i += 1
      }
    }
  }
}

object ShingleImpl {
  private val Seed = 42L

  private val EmptyResult = new GenericArrayData(Array.empty[Long])

  def shingles(s: UTF8String, n: Int): ArrayData = {
    // one copy of the text, then a single boundary walk with per-token
    // hashing in place (the copy is noise next to the hashing)
    val bytes = s.getBytes
    var tokenHashes = new Array[Long](math.max(8, bytes.length / 5))
    var m = 0
    TokenWalk.foreachToken(bytes, (start, end) => {
      if (m == tokenHashes.length) tokenHashes = java.util.Arrays.copyOf(tokenHashes, m * 2)
      tokenHashes(m) = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start, end - start, Seed)
      m += 1
    })

    if (m < n) return EmptyResult

    val out = new Array[Long](m - n + 1)
    var t = 0
    while (t <= m - n) {
      var h = Seed
      var j = 0
      while (j < n) { h = XXH64.hashLong(tokenHashes(t + j), h); j += 1 }
      out(t) = h
      t += 1
    }
    java.util.Arrays.sort(out)
    // in-place distinct on the sorted array
    var w = 1
    var r = 1
    while (r < out.length) {
      if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == out.length) out else java.util.Arrays.copyOf(out, w))
  }

  /** Null text behaves like the composed form's `.otherwise(array())`. */
  def shinglesNullSafe(s: UTF8String, n: Int): ArrayData =
    if (s == null) EmptyResult else shingles(s, n)
}

case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"
  // null text yields an empty set, so the output itself is never null
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes expects STRING, got ${other.catalogString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    ShingleImpl.shinglesNullSafe(child.eval(input).asInstanceOf[UTF8String], n)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, FalseLiteral}
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        ${childGen.code}
        $javaType ${ev.value} = graft.plans.ShingleImpl.shinglesNullSafe(
          ${childGen.isNull} ? null : ${childGen.value}, $n);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def shingleHashes(c: Column, n: Int): Column =
    GraftSqlShim.column(ShingleHashes(GraftSqlShim.expression(c), n))
}
