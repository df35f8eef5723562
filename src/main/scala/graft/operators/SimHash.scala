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
  * Scale shape: fingerprints are a narrow native projection (no
  * shuffle). `hammingPairs` uses Manku-style block combinations
  * (the simhash-dedup paper's table design, "Detecting Near-Duplicates
  * for Web Crawling", WWW'07): 60 bits split into 6 blocks of 10; one
  * table per C(6,3)=20 block-triples, keyed on the triple's 30 bits.
  * Any pair within Hamming distance ≤ 3 has ≥ 3 error-free blocks, so
  * some triple matches exactly (pigeonhole) — recall stays exact —
  * while 30-bit keys shrink bucket collisions by 2¹⁵ vs the naive
  * 4×15-bit banding, whose hot buckets went quadratic on dup-heavy
  * corpora (measured 44 s → 4 s on a 50k-doc 10-clone corpus).
  */
object SimHash {

  val Bits = 60
  // Manku blocking: tables = C(Blocks, SelBlocks); exact for
  // maxDist ≤ Blocks - SelBlocks
  val Blocks = 6
  val SelBlocks = 3
  private val BlockBits = Bits / Blocks

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

  /** All pairs (d1 < d2) within Hamming distance ≤ maxDist
    * (≤ Blocks - SelBlocks), via exact block-combination blocking +
    * bit_count verification.
    *
    * Pair generation runs in FINGERPRINT space: docs sharing an
    * identical fingerprint collapse into one cluster row first, the
    * banded join matches distinct fingerprints only, and surviving
    * fingerprint pairs expand back to doc pairs at the end (identical-
    * fingerprint clusters contribute their internal hamming-0 pairs
    * directly). On dup-heavy corpora — the whole point of a dedup
    * pass — this is the difference between joining 20 tables of N
    * docs and 20 tables of U ≪ N distinct fingerprints, and each
    * near-dup CLUSTER pair is verified once instead of |A|·|B| times
    * (measured 30 s → ~4 s on a 50k-doc 10-clone corpus). */
  def hammingPairs(fps: DataFrame, maxDist: Int = Blocks - SelBlocks): DataFrame = {
    require(maxDist <= Blocks - SelBlocks,
      s"block blocking only guarantees recall for dist <= ${Blocks - SelBlocks}")
    val mask = (1L << BlockBits) - 1
    val combos = (0 until Blocks).combinations(SelBlocks).toSeq
    val bucketCols = combos.map { c =>
      c.zipWithIndex.map { case (bi, pos) =>
        shiftleft(shiftright(col("simhash"), bi * BlockBits).bitwiseAND(mask), pos * BlockBits)
      }.reduce(_.bitwiseOR(_))
    }

    val clusters = fps.groupBy(col("simhash"))
      .agg(collect_list(col("doc_id")).as("ids"))

    val banded = clusters.select(
      col("simhash"),
      posexplode(array(bucketCols: _*)).as(Seq("band", "bucket"))
    )
    val a = banded.select(col("band"), col("bucket"), col("simhash").as("h1"))
    val b = banded.select(col("band"), col("bucket"), col("simhash").as("h2"))
    val fpPairs = a.join(b, Seq("band", "bucket")).where(col("h1") < col("h2"))
      .select(col("h1"), col("h2")).distinct()
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .where(col("hamming") <= maxDist)

    val cross = fpPairs
      .join(clusters.select(col("simhash").as("h1"), col("ids").as("ids1")), Seq("h1"))
      .join(clusters.select(col("simhash").as("h2"), col("ids").as("ids2")), Seq("h2"))
      .select(col("hamming"), explode(col("ids1")).as("i1"), col("ids2"))
      .select(col("hamming"), col("i1"), explode(col("ids2")).as("i2"))
      .select(least(col("i1"), col("i2")).as("d1"),
        greatest(col("i1"), col("i2")).as("d2"), col("hamming"))

    val intra = clusters.where(size(col("ids")) >= 2)
      .select(explode(col("ids")).as("d1"), col("ids"))
      .select(col("d1"), explode(col("ids")).as("d2"))
      .where(col("d1") < col("d2"))
      .withColumn("hamming", lit(0).cast("int"))

    cross.unionByName(intra)
  }
}
