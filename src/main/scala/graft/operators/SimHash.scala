package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash fingerprinting: a 60-bit locality-sensitive fingerprint —
  * documents with small token-set differences land at small Hamming
  * distance. Standard large-corpus near-dup primitive (Charikar
  * sim-hash as used by web-scale dedup pipelines).
  *
  * 60 bits (not 64) because the per-token hash is TextFunctions.hash60
  * — md5-derived, engine-reproducible, and safely inside a signed
  * long, which keeps both the Spark expression and the DuckDB oracle
  * in plain BIGINT arithmetic.
  *
  * Scale shape: `simhash` is a narrow projection (HOFs over the token
  * array — no shuffle). `hammingPairs` blocks on 4×15-bit sub-bands:
  * any pair within Hamming distance ≤ 3 shares at least one exact
  * sub-band (pigeonhole), so the band join finds all such pairs
  * without a quadratic scan.
  */
object SimHash {

  val Bits = 60
  val Bands = 4                 // 15 bits each; catches hamming ≤ 3 exactly
  private val BandBits = Bits / Bands

  /** 60-bit simhash over distinct tokens: bit i is set iff the count
    * of tokens with bit i set exceeds half the token count. */
  def simhash(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val toks = array_distinct(TextFunctions.tokens(text))
    val hashes = transform(toks, t => TextFunctions.hash60(t))
    // per bit: #tokens with bit set vs cleared; set ⇔ sum(±1) >= 0.
    // Bit index is a compile-time constant, so this unrolls to 60
    // codegen'd when-expressions rather than a lambda over bits.
    val bitVals = (0 until Bits).map { i =>
      when(
        aggregate(hashes, lit(0L),
          (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)) >= 0L,
        lit(1L << i)
      ).otherwise(lit(0L))
    }
    bitVals.reduce(_ + _)
  }

  /** doc_id + simhash fingerprint.
    *
    * Physical shape: ONE native codegen'd expression per document
    * (graft.plans.SimHash60) — a narrow projection, no explode, no
    * groupBy exchange. Bit-compatible with the column-level
    * `simhash()` form (kept for composability) and the DuckDB oracle;
    * round 1's explode → 60-column sum aggregate shape paid a
    * 60-expression Janino compile plus a full corpus-token shuffle.
    * Null-text docs are dropped (no comparable content ⇒ no
    * fingerprint — matches the oracle, whose unnest of a null token
    * list emits no rows). */
  def fingerprints(docs: DataFrame, textCol: String): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(col("doc_id"), graft.plans.SimHash60.simhash60(col(textCol)).as("simhash"))

  /** All pairs (d1 < d2) within Hamming distance ≤ maxDist (≤ Bands-1),
    * via exact sub-band blocking + bit_count verification. */
  def hammingPairs(fps: DataFrame, maxDist: Int = Bands - 1): DataFrame = {
    require(maxDist < Bands, s"band blocking only guarantees recall for dist < $Bands")
    val mask = (1L << BandBits) - 1
    val banded = fps.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until Bands).map(b =>
        shiftright(col("simhash"), b * BandBits).bitwiseAND(mask)): _*))
        .as(Seq("band", "bucket"))
    )
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("d1"), col("simhash").as("h1"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("d2"), col("simhash").as("h2"))
    a.join(b, Seq("band", "bucket")).where(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxDist)
  }
}
