package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic spherical k-means over quantized embeddings — the
  * trained coarse quantizer that upgrades `Similarity.ivfTopK`'s
  * smallest-vec_id centroid stand-in into real cluster means, and the
  * clustering stage of SemDeDup-style semantic dedup
  * (`SemDedup.pairs`). Reference analogue: none — the reference
  * (RaihanFuadSyakir/ETL-Weather-Jabar) has no vector ops; this is
  * part of the beyond-reference training-data layer.
  *
  * Every step is exact-integer or a fixed IEEE formula over exact
  * integers, so a given (corpus, k, iters) has ONE reproducible
  * answer that a DuckDB oracle rebuilds term-for-term:
  *
  *  - vectors are quantized (`Similarity.quantize`: round(x·10⁴) as
  *    long) — dot products and norms are exact integer sums;
  *  - a centroid is represented by the per-dimension SUM of its
  *    members' quantized vectors (array<long>, exact, order-free),
  *    never the floating mean: cosine against the sum equals cosine
  *    against the mean (norms scale out), so no division ever enters
  *    the training loop;
  *  - init = the k smallest-vec_id vectors (same deterministic seed
  *    as `Similarity.centroidModel`);
  *  - assignment = argmax cosine, ties to the smallest centroid id;
  *  - a cluster that loses all members keeps its previous centroid
  *    (deterministic, loud in the model — its count reads 0).
  *
  * Scale shape (per iteration): assignment is a NARROW projection
  * over literal centroids (no shuffle, no broadcast — the model is
  * k×dim longs inlined into the plan, exactly like
  * `Similarity.assignLists`); the update is one
  * posexplode → groupBy(cid, dim) SUM whose map-side partials reduce
  * every partition to at most k×dim rows before the (tiny) shuffle.
  * The driver holds only model parameters (k×dim longs per round),
  * the same bounded-collect contract as `centroidModel`. The corpus
  * is localCheckpoint'd once so all `iters` rounds plan over a
  * materialized scan (the Components.scala lesson: constant-size
  * loop plans, no lineage growth). At 100 TB swap the checkpoint for
  * a persisted quantized table and/or train on a deterministic hash
  * sample (`Sampling.hashBucket` — the model only needs a sample);
  * the per-iteration shapes are unchanged.
  *
  * Overflow bounds (guarded, not assumed): with scale=10⁴ and unit-
  * norm-ish inputs, |v_i| ≲ 10⁴ and a centroid-sum component is at
  * most members·10⁴, so a 64-dim dot against a sum stays under 2⁶³
  * while members < ~1.4e9 per cluster; `train` require()s the
  * observed bound each round rather than overflowing silently.
  */
object KMeans {

  /** Argmax-cosine centroid id for a quantized vector column `v` with
    * norm column `nrm`, over literal centroids (cid, vector, norm).
    * Ties → smallest cid (array_max on struct(cos, -cid)). Shared by
    * the training loop and `Similarity.assignLists`' final pass. */
  private[operators] def nearestCentroid(
      v: Column, nrm: Column, cents: Array[(Int, Array[Long], Double)]): Column = {
    val scores = array(cents.map { case (cid, cv, cn) =>
      struct(
        (Similarity.qdot(v, typedLit(cv.toSeq)).cast("double") / (nrm * lit(cn))).as("cos"),
        lit(-cid).as("negid"))
    }: _*)
    -array_max(scores).getField("negid")
  }

  /** Train `iters` update steps from the deterministic seed; returns
    * (cid, centroidSumVec, norm) triples sorted by cid — directly
    * consumable by `Similarity.assignLists` / `probeLists` /
    * `ivfTopK(cents = ...)`. `iters = 0` returns the seed itself. */
  def train(corpus: DataFrame, k: Int, iters: Int): Array[(Int, Array[Long], Double)] = {
    require(k > 0, "k must be positive")
    require(iters >= 0, "iters must be non-negative")
    // quantize + norm ONCE; every round plans over the materialized blocks
    val base = corpus
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(Similarity.qnorm2(col("v")).cast("double")))
      .transform(graft.ops.Checkpoints.truncate)
    var cents = Similarity.centroidModel(corpus, k)
    require(cents.length == k,
      s"corpus has fewer than k=$k seed vectors (got ${cents.length})")
    var it = 0
    while (it < iters) {
      // one narrow assignment + one partial-agg'd (cid, dim) SUM
      val sums = base
        .withColumn("cid", nearestCentroid(col("v"), col("nrm"), cents))
        .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("members"))
        .collect()
      val byCid = sums.groupBy(_.getInt(0))
      cents = cents.map { case (cid, prev, prevNorm) =>
        byCid.get(cid) match {
          case Some(rows) =>
            val sv = new Array[Long](prev.length)
            var members = 0L
            rows.foreach { r =>
              sv(r.getInt(1)) = r.getLong(2)
              members = r.getLong(3)
            }
            // overflow guard: next round's dots are v·sum over dim terms
            val maxAbs = sv.map(math.abs).max.max(1L)
            require(maxAbs <= Long.MaxValue / (10000L * prev.length),
              s"kmeans: centroid-sum magnitude $maxAbs risks 64-bit dot overflow " +
                s"(cluster $cid, $members members); train on a hash sample instead")
            // exact integer norm², converted ONCE (BigInt: correctly
            // rounded to double) — a running double sum would round at
            // every add and drift from the oracle's integer-sum form
            var n2 = BigInt(0)
            sv.foreach(x => n2 += BigInt(x) * BigInt(x))
            (cid, sv, math.sqrt(n2.doubleValue))
          case None => (cid, prev, prevNorm) // empty cluster: keep previous
        }
      }
      it += 1
    }
    base.unpersist()
    cents.sortBy(_._1)
  }

  /** Final assignment under trained centroids: (vec_id, list_id) for
    * every corpus vector — the registered-query surface (`q_kmeans`).
    * One narrow projection; no shuffle. */
  def assign(corpus: DataFrame, cents: Array[(Int, Array[Long], Double)]): DataFrame =
    Similarity.assignLists(corpus, cents)
      .select(col("corpus_id").as("vec_id"), col("list_id"))
}
