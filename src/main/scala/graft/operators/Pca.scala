package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top principal component of an embedding corpus by power iteration
  * on the EXACT integer scatter matrix — the whitening/debiasing
  * direction a curation pipeline removes before similarity search
  * (the dominant direction of sentence embeddings is well known to
  * encode frequency, not meaning — Mu & Viswanath, ICLR 2018,
  * "All-but-the-Top").
  *
  * Exactness, the kmeans/PQ playbook: vectors quantize to integers
  * (Similarity.quantize), and the n²-scaled CENTERED scatter matrix
  *
  *   M = n·Σ v·vᵀ − s·sᵀ,   s = Σ v
  *
  * is exact integer arithmetic (the same mean-clearing trick as
  * Autocorr). Power iteration runs in integers too: M is pre-scaled
  * by D_M = max(1, max|M| div 2³⁰) and each iterate by
  * D_u = max(1, max|u| div 2²⁰) — truncating division, identical in
  * Java and DuckDB — so THE APPROXIMATION ITSELF replays bit-for-bit
  * cross-engine (the HyperBall/PQ contract: deterministic integers
  * all the way down, fixed iteration count, fixed all-ones start).
  *
  * Scale split: the data-sized work is the scatter aggregate — each
  * row fans out to its dim² cell contributions (explode + hash
  * aggregate onto dim² rows, full parallelism, no shuffle of raw
  * vectors beyond the cell key). The iteration happens on the
  * COLLECTED dim×dim matrix — model-sized (64² = 4096 longs, the
  * centroidModel precedent), never data-sized.
  */
object Pca {

  /** Output: (dim, w) — the un-normalized top-eigenvector iterate
    * after `iters` rounds, one row per 1-based dimension. Mixed
    * vector widths raise. */
  def topComponent(emb: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 10, s"topComponent: iters in [1,10], got $iters")
    val spark = emb.sparkSession
    val ev = emb.where(col("embedding").isNotNull)
      .select(Similarity.quantize(col("embedding")).as("v"))
    val ei = ev.select(col("v"), posexplode(col("v")).as(Seq("i", "vi")))
    val cells = ei.select(col("i"), col("vi"), posexplode(col("v")).as(Seq("j", "vj")))
      .groupBy(col("i"), col("j")).agg(sum(col("vi") * col("vj")).as("g"))
      .collect() // dim² rows — model-sized (the centroidModel precedent)
    val sums = ei.groupBy(col("i"))
      .agg(sum(col("vi")).as("s"), count(lit(1)).as("n"), max(abs(col("vi"))).as("mx"))
      .collect() // dim rows
    require(sums.nonEmpty, "topComponent: empty corpus")
    val dim = sums.length
    val n = sums.head.getLong(2)
    require(sums.forall(_.getLong(2) == n),
      s"topComponent: mixed vector widths — every embedding must have $dim dims")
    val s = Array.ofDim[Long](dim)
    sums.foreach(r => s(r.getInt(0)) = r.getLong(1))
    // moment-overflow guards (the Autocorr/Anova contract: exact means
    // loud, never silently wrapped). Three products can wrap Long:
    //  (1) the executor-side Σ vᵢvⱼ itself — bounded by n·max|v|²;
    //  (2) n·g in the centered cell n·g − sᵢsⱼ;
    //  (3) sᵢsⱼ (|s| ≤ n·max|v| so this trips first on biased data).
    // BigInt comparisons, so the guard itself cannot wrap; /4 head-
    // room keeps the DIFFERENCE of the two guarded terms exact too.
    val maxV = sums.iterator.map(_.getLong(3)).max
    require(BigInt(n) * BigInt(maxV) * BigInt(maxV) <= BigInt(Long.MaxValue) / 4,
      s"topComponent: n·max|v|² = ${n}·${maxV}² would overflow the exact scatter sums Σvᵢvⱼ — " +
        "rescale the quantization units (e.g. lower Similarity.quantize's scale)")
    val maxAbsG = cells.iterator.map(r => math.abs(r.getLong(2))).max
    val maxAbsS = s.iterator.map(math.abs).max
    require(BigInt(n) * BigInt(maxAbsG) <= BigInt(Long.MaxValue) / 4 &&
        BigInt(maxAbsS) * BigInt(maxAbsS) <= BigInt(Long.MaxValue) / 4,
      s"topComponent: the centered scatter cell n·g − sᵢsⱼ would overflow exact Long " +
        s"arithmetic (n=$n, max|g|=$maxAbsG, max|s|=$maxAbsS) — rescale the quantization units")
    val m = Array.ofDim[Long](dim, dim)
    cells.foreach(r => m(r.getInt(0))(r.getInt(1)) = n * r.getLong(2) - s(r.getInt(0)) * s(r.getInt(1)))
    // pre-scale M to 30 bits so u = M'·w (w ≤ ~2²¹ after its own
    // rescale) stays under 2⁵⁷ ≪ 2⁶³ at any dim ≤ 64
    val dM = math.max(1L, m.iterator.flatMap(_.iterator).map(math.abs).max / (1L << 30))
    for (i <- 0 until dim; j <- 0 until dim) m(i)(j) /= dM
    var w = Array.fill(dim)(1L)
    for (_ <- 1 to iters) {
      val u = Array.tabulate(dim)(i => (0 until dim).map(j => m(i)(j) * w(j)).sum)
      val dU = math.max(1L, u.iterator.map(math.abs).max / (1L << 20))
      w = u.map(_ / dU)
    }
    import spark.implicits._
    w.toSeq.zipWithIndex.map { case (v, i) => (i + 1L, v) }.toDF("dim", "w")
  }
}
