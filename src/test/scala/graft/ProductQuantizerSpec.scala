package graft

import graft.operators.ProductQuantizer
import org.apache.spark.sql.functions._

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  // 4-dim corpus, m=2 subspaces of 2 dims, k=2 centroids (rows 0, 1)
  private lazy val tiny = Seq(
    (0L, Array(1f, 0f, 0f, 1f)),
    (1L, Array(0f, 1f, 1f, 0f)),
    (2L, Array(1f, 0f, 1f, 0f)),  // sub0 = cent0's, sub1 = cent1's
    (3L, Array(0f, 1f, 0f, 1f))   // sub0 = cent1's, sub1 = cent0's
  ).toDF("vec_id", "embedding")

  test("encode picks the exact nearest centroid per subspace") {
    val mdl = ProductQuantizer.model(tiny, m = 2, k = 2)
    assert(mdl.subDim == 2 && mdl.k == 2)
    val codes = ProductQuantizer.encode(tiny, mdl)
      .orderBy($"vec_id").as[(Long, Int, Int)].collect()
    // centroid rows encode to themselves; mixed rows pick per-subspace
    assert(codes.toSeq == Seq((0L, 0, 0), (1L, 1, 1), (2L, 0, 1), (3L, 1, 0)))
  }

  test("ADC distance is the exact integer identity sum of per-subspace distances") {
    val mdl = ProductQuantizer.model(tiny, m = 2, k = 2)
    val codes = ProductQuantizer.encode(tiny, mdl)
    val got = ProductQuantizer.adcTopK(codes, tiny.where($"vec_id" === 0), mdl, k = 3)
      .orderBy($"rnk").as[(Long, Long, Long, Int)].collect()
    // query 0 = [1,0,0,1]: row 2 coded (0,1) -> d = 0 + ||[0,1]-[1,0]||² (x1e4)
    // row 3 coded (1,0) -> same by symmetry; row 1 coded (1,1) -> both subs off
    val u = 10000L * 10000L // quantized unit²
    val m1 = got.map(r => (r._2, r._3)).toMap
    assert(m1(2L) == 2 * u && m1(3L) == 2 * u && m1(1L) == 4 * u)
    // ties broken by corpus id: row 2 before row 3
    assert(got.map(_._2).toSeq == Seq(2L, 3L, 1L))
  }

  test("model rejects dims not divisible into m subspaces and missing centroid rows") {
    intercept[IllegalArgumentException](ProductQuantizer.model(tiny, m = 3, k = 2))
    intercept[IllegalArgumentException](ProductQuantizer.model(tiny, m = 2, k = 9))
  }

  test("real corpus: codes are stable under repartitioning and ADC ranks are deterministic") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val mdl = ProductQuantizer.model(emb, m = 4, k = 16)
    val a = ProductQuantizer.encode(emb, mdl).orderBy($"vec_id").collect()
    val b = ProductQuantizer.encode(emb.repartition(13), mdl).orderBy($"vec_id").collect()
    assert(a.sameElements(b) && a.length == emb.count())
    val codes = ProductQuantizer.encode(emb, mdl)
    val top = ProductQuantizer.adcTopK(codes, emb.where($"vec_id" < 5), mdl, k = 3)
      .orderBy($"query_id", $"rnk").collect()
    assert(top.length == 15) // 5 queries x top-3
  }

  test("trainedModel: centroids move to exact cluster means and reduce quantization error") {
    // two tight clusters in each subspace; init centroids (rows 0, 1)
    // are cluster members, Lloyd's must converge to the rounded means
    val df = Seq(
      (0L, Array(1.0f, 0f, 0f, 1f)), (1L, Array(0f, 1f, 1f, 0f)),
      (2L, Array(1.02f, 0f, 0f, 1.02f)), (3L, Array(0.98f, 0f, 0f, 0.98f)),
      (4L, Array(0f, 1.02f, 1.02f, 0f)), (5L, Array(0f, 0.98f, 0.98f, 0f))
    ).toDF("vec_id", "embedding")
    val t = ProductQuantizer.trainedModel(df, m = 2, k = 2, iters = 3)
    // cluster {0,2,3}: mean of (10000, 10200, 9800) = 10000 exactly
    assert(t.cents(0).find(_._1 == 0).get._2.toSeq == Seq(10000L, 0L))
    assert(t.cents(0).find(_._1 == 1).get._2.toSeq == Seq(0L, 10000L))
    // trained codes still route members to their own cluster
    val codes = ProductQuantizer.encode(df, t).orderBy($"vec_id")
      .as[(Long, Int, Int)].collect()
    assert(codes.map(_._2).toSeq == Seq(0, 1, 0, 0, 1, 1))
    // determinism: same inputs, same model
    val t2 = ProductQuantizer.trainedModel(df.repartition(5), m = 2, k = 2, iters = 3)
    assert(t.cents.flatten.map(c => (c._1, c._2.toSeq)).sameElements(
      t2.cents.flatten.map(c => (c._1, c._2.toSeq))))
  }

  test("NULL embeddings are dropped, never encoded or scored") {
    val withNull = tiny.unionByName(
      Seq((9L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val mdl = ProductQuantizer.model(tiny, m = 2, k = 2)
    assert(ProductQuantizer.encode(withNull, mdl).where($"vec_id" === 9L).count() == 0)
    val top = ProductQuantizer.adcTopK(
      ProductQuantizer.encode(withNull, mdl), withNull.where($"vec_id".isin(0L, 9L)), mdl, 2)
    assert(top.where($"query_id" === 9L).count() == 0 && top.count() == 2)
  }

  test("ivfPqTopK with a full probe equals plain ADC top-k; partial probe is a subset") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where($"vec_id" < 20)
    val mdl = ProductQuantizer.model(emb, m = 4, k = 16)
    // probing every list removes the approximation on the IVF side:
    // the composition must reduce exactly to adcTopK
    val full = graft.operators.Similarity.ivfPqTopK(emb, queries, 3, nLists = 8, nProbe = 8, mdl)
      .select($"query_id", $"corpus_id", $"adc_dist", $"rnk")
      .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._4))
    val plain = ProductQuantizer.adcTopK(ProductQuantizer.encode(emb, mdl), queries, mdl, 3)
      .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._4))
    assert(full.toSeq == plain.toSeq)
    // a partial probe returns pairs drawn only from probed lists —
    // every (query, corpus, dist) it emits exists in the full scoring
    val partial = graft.operators.Similarity.ivfPqTopK(emb, queries, 3, nLists = 8, nProbe = 2, mdl)
      .select($"query_id", $"corpus_id", $"adc_dist").as[(Long, Long, Long)].collect().toSet
    val allPairs = plain.map(r => (r._1, r._2, r._3)).toSet
    // top-k of a subset need not be the global top-k, but distances
    // must agree wherever pairs coincide
    val fullDists = ProductQuantizer.adcTopK(
      ProductQuantizer.encode(emb, mdl), queries, mdl, Int.MaxValue - 1)
      .select($"query_id", $"corpus_id", $"adc_dist").as[(Long, Long, Long)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    assert(partial.forall { case (q, c, d) => fullDists((q, c)) == d })
    assert(allPairs.nonEmpty && partial.nonEmpty)
  }

  test("ADC ranking tracks true distance: a planted exact twin ranks first") {
    // append an exact copy of vector 20 with a fresh id — its codes
    // equal vector 20's, so ADC distance(query=20, twin) is the
    // quantization floor and must rank 1
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val twin = emb.where($"vec_id" === 20L)
      .select(lit(999999L).as("vec_id"), $"embedding", $"label")
    val corpus = emb.unionByName(twin)
    val mdl = ProductQuantizer.model(corpus, m = 4, k = 16)
    val codes = ProductQuantizer.encode(corpus, mdl)
    val top = ProductQuantizer.adcTopK(codes, corpus.where($"vec_id" === 20L), mdl, k = 1)
      .as[(Long, Long, Long, Int)].collect()
    assert(top.length == 1 && top.head._2 == 999999L)
  }
}
