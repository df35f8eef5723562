package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd multi-band sign-LSH signatures: all `bands`
  * bucket ids of a quantized vector in ONE fused pass.
  *
  * Semantically identical to `bands` compositions of
  * `Similarity.lshBucket(v, r, dim, firstPlane = b*r)` — the same
  * deterministic hash60-derived ±1 plane family (`(hash60("p:i") & 1)`
  * → +1 else −1), the same common-prefix dot product, the same
  * wider-than-dim error — but where the composed form builds
  * bands × r separate QDotLong expression trees (64 for the default
  * 16×4 config), each re-reading the vector array through its own
  * null-checked codegen path plus a 16-element array() + posexplode
  * allocation per row, this expression walks the vector once per
  * plane inside one JIT-compiled triple loop and emits the bucket
  * array directly. Same trade MinHashSig makes over its k-aggregate
  * composition (MinHash.scala:16-24).
  *
  * The plane-sign matrix is a function of (bands·r, dim) only:
  * computed once per JVM and cached, never shipped per row or
  * re-derived per call (the round-1 lshBucket lesson,
  * Similarity.scala:82-90).
  */
object SignBandsImpl {

  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Byte]]()

  /** ±1 sign matrix for planes [0, nPlanes) × dims [0, dim), from the
    * same global family as Similarity.planeSign. */
  def signs(nPlanes: Int, dim: Int): Array[Byte] =
    signCache.computeIfAbsent((nPlanes, dim), { case (p, d) =>
      val out = new Array[Byte](p * d)
      var pi = 0
      while (pi < p) {
        var i = 0
        while (i < d) {
          val h = Hash60Impl.hash(s"$pi:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          out(pi * d + i) = if ((h & 1L) == 1L) 1 else -1
          i += 1
        }
        pi += 1
      }
      out
    })

  /** All band bucket ids of one quantized vector. */
  def buckets(v: ArrayData, bands: Int, r: Int, dim: Int): ArrayData = {
    val n = v.numElements()
    if (n > dim)
      throw new IllegalArgumentException(
        s"graft_sign_bands: vector wider than the $dim-dim plane set: $n")
    val s = signs(bands * r, dim)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var j = 0
      while (j < r) {
        val off = (b * r + j) * dim
        var acc = 0L
        var i = 0
        while (i < n) {
          val x = v.getLong(i)
          acc += (if (s(off + i) > 0) x else -x)
          i += 1
        }
        if (acc >= 0L) bucket |= (1L << j)
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }
}

case class SignBands(child: Expression, bands: Int, r: Int, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sign_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_sign_bands expects array<bigint>, got ${other.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    SignBandsImpl.buckets(input.asInstanceOf[ArrayData], bands, r, dim)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SignBandsImpl.buckets($c, $bands, $r, $dim)")

  override protected def withNewChildInternal(newChild: Expression): SignBands =
    copy(child = newChild)
}

object SignBands {
  def signBands(c: Column, bands: Int, r: Int, dim: Int = 64): Column =
    GraftSqlShim.column(SignBands(GraftSqlShim.expression(c), bands, r, dim))
}
