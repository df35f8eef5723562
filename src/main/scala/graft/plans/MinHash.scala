package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd MinHash machinery for near-dup detection
  * (graft.operators.NearDup): the k-permutation signature and the
  * LSH band-bucket hashes, each as ONE tight primitive loop over the
  * document's shingle-hash array.
  *
  * Why a custom Expression instead of the composed form
  * (`explode(hs)` → k×`min((h%P)*(2i+1)+c_i % P)` aggregates):
  * with k≈96 the wide aggregate plan costs ~10 s of one-time
  * Janino/JIT compile per JVM, evaluates 96 separate expression trees
  * per shingle, and forces an extra explode+groupBy exchange just to
  * compute a per-row value. This expression keeps the signature a
  * NARROW map-side projection — no shuffle, tiny codegen, one
  * JIT-compiled double loop (measured ~8× faster end-to-end on the
  * sf0.1 corpus, cold JVM).
  *
  * The permutation family is xor-seed + murmur3-style finalizer per
  * permutation: h_i(x) = mix64(x ⊕ seed_i) with per-i splitmix64
  * seeds. Round 1's affine family ((x mod P)·(2i+1)+c_i mod P) with
  * tiny odd multipliers is only weakly min-wise independent — on a
  * 50k-doc corpus its bias cost ~300 of ~250k true pairs (1.2% of
  * the near-threshold band) vs the ~0.1-pair loss LSH theory allows;
  * the mixed family measures at theoretical recall and is also
  * cheaper per element (no 64-bit modulo). Outputs are
  * engine-internal; correctness is gated by exact-Jaccard
  * verification downstream.
  */
object MinHashImpl {

  /** splitmix64-generated per-permutation xor seeds. */
  private def seeds(k: Int): Array[Long] = {
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      var z = (i + 1) * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      out(i) = z ^ (z >>> 31)
      i += 1
    }
    out
  }

  private val seedCache = new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()
  private def seedsFor(k: Int): Array[Long] =
    seedCache.computeIfAbsent(k, (kk: Integer) => seeds(kk))

  /** k-permutation MinHash signature of a shingle-hash set. */
  def sig(hs: ArrayData, k: Int): ArrayData = {
    val s = seedsFor(k)
    val n = hs.numElements()
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var j = 0
    while (j < n) {
      val x = hs.getLong(j)
      var i = 0
      while (i < k) {
        var v = x ^ s(i)
        v = (v ^ (v >>> 33)) * 0xFF51AFD7ED558CCDL
        v = (v ^ (v >>> 29)) * 0xC4CEB9FE1A85EC53L
        v ^= v >>> 32
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** One 64-bit bucket hash per band: murmur-style mix of the band's r
    * signature slots (band index seeds the hash so identical slices in
    * different bands land in distinct buckets). */
  def bands(sig: ArrayData, b: Int, r: Int): ArrayData = {
    val out = new Array[Long](b)
    var bi = 0
    while (bi < b) {
      var h = 0x9E3779B97F4A7C15L * (bi + 1)
      var ri = 0
      while (ri < r) {
        var v = sig.getLong(bi * r + ri)
        v *= 0xC2B2AE3D27D4EB4FL
        v = java.lang.Long.rotateLeft(v, 31)
        h = (h ^ (v * 0x9E3779B97F4A7C15L)) * 5 + 0x52DCE729L
        ri += 1
      }
      h ^= h >>> 33
      h *= 0xFF51AFD7ED558CCDL
      h ^= h >>> 33
      out(bi) = h
      bi += 1
    }
    new GenericArrayData(out)
  }
}

case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig expects array<bigint>, got ${other.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    MinHashImpl.sig(input.asInstanceOf[ArrayData], k)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MinHashImpl.sig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

case class BandBuckets(child: Expression, b: Int, r: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_band_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_band_buckets expects array<bigint>, got ${other.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    MinHashImpl.bands(input.asInstanceOf[ArrayData], b, r)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MinHashImpl.bands($c, $b, $r)")

  override protected def withNewChildInternal(newChild: Expression): BandBuckets =
    copy(child = newChild)
}

object MinHashSig {
  def minhashSig(c: Column, k: Int): Column =
    GraftSqlShim.column(MinHashSig(GraftSqlShim.expression(c), k))

  def bandBuckets(c: Column, b: Int, r: Int): Column =
    GraftSqlShim.column(BandBuckets(GraftSqlShim.expression(c), b, r))
}
