package graft

import graft.operators.{NearDup, Similarity}
import org.apache.spark.sql.functions._

/** r9 verdict item #2: the loud candidate-volume pre-check on banded
  * LSH joins. The sf1 run measured the detonation this prevents —
  * the threshold-0.5 default config (16 bands x 4 planes) went
  * output-quadratic (exp 1.64, 217x true output) while the tuned
  * 28x12 regime stayed sub-linear (exp 0.82). The guard computes the
  * band join's EXACT pre-distinct candidate cardinality from a count
  * frame (Σ m·(m−1)/2 over buckets) and raises before any wide work.
  *
  * The corpus here reproduces sf1-like density: n vectors all
  * pairwise at cosine ≈ 0.6 (base-1 components + amplitude-1.4
  * deterministic noise: cos ≈ 1/(1+a²/3) ≈ 0.6). At that density a
  * 4-plane band keeps a pair with p⁴ ≈ 0.25, so 16 bands pass nearly
  * ALL n²/2 pairs — the degenerate regime — while 12-plane bands cut
  * it ~3x below the default budget.
  */
class LshGuardSpec extends SparkSpec {

  private def denseCorpus(n: Int) =
    spark.range(n).select(
      col("id").as("vec_id"),
      expr("transform(sequence(1, 64), j -> CAST(" +
        "1.0 + 1.4 * (pmod(xxhash64(concat(CAST(id AS STRING), '_', CAST(j AS STRING))), 2000) / 1000.0 - 1.0)" +
        " AS FLOAT))").as("embedding"))

  test("pinned 16x4 config on a dense corpus trips the candidate-volume guard, naming the remedy") {
    // r=4 pinned explicitly since r14 (the DEFAULT is now the
    // n-scaled AutoPlanes law — see the auto-path test below): this
    // case proves the guard still refuses the historic fixed-r regime
    val e = intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairsLsh(denseCorpus(16000), 0.5, planesPerBand = 4)
    }
    assert(e.getMessage.contains("cosineNearDupPairsLsh(bands=16, planesPerBand=4)"))
    assert(e.getMessage.contains("maxCandidatePairs"))
    assert(e.getMessage.contains("28x12")) // the tuned alternative, by name
  }

  test("the tuned 28x12 config passes the same corpus under the same default budget") {
    // construction must not throw — the guard runs eagerly; the wide
    // verify join itself is NOT executed here (that is the point:
    // the guard's cost is one count aggregate)
    val df = Similarity.cosineNearDupPairsLsh(denseCorpus(16000), 0.9,
      bands = 28, planesPerBand = 12)
    assert(df.columns.toSeq == Seq("a_id", "b_id", "cosine"))
  }

  test("minhash band join guard trips on a clone-heavy corpus with a small budget; default passes") {
    import spark.implicits._
    // 60 distinct near-identical long documents (one token differs):
    // every pair shares nearly all shingles, so every band bucket
    // holds all 60 reps -> 24 bands x C(60,2) = 42,480 candidates
    val docs = (0 until 60).map { i =>
      val base = (0 until 80).map(w => s"w${w % 7}tok$w").mkString(" ")
      (i.toLong, s"$base uniq$i")
    }.toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      NearDup.minhashNearDupPairs(docs, "text", 3, 0.8, maxCandidatePairs = 1000L)
    }
    assert(e.getMessage.contains("minhashRepPairsFrom"))
    // the default budget (1e8) passes and the pipeline still answers
    val pairs = NearDup.minhashNearDupPairs(docs, "text", 3, 0.8)
    assert(pairs.count() >= 0L)
  }
}
