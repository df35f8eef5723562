package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic negative sampling for contrastive training: each
  * anchor row gets `k` pseudo-random partners drawn uniformly from
  * the whole corpus — reproducibly (re-runs, resumes, and a DuckDB
  * replica all draw the SAME partners), with no `rand()` and no
  * driver-side loop.
  *
  * Construction: `Ids.globalRowNumber` assigns dense ids 1..N (the
  * cut-bucketed two-pass — no global window), then partner j of the
  * row with dense id r is `1 + hash60(r ":" j) mod N`, translated
  * back to the caller's id space by one equi-join on the dense id.
  * The hash makes the draw a pure function of (corpus order, j,
  * seed), uniform over the corpus to within hash60's 2^-60 bias.
  *
  * Self-collisions (a draw landing on its own row, probability 1/N
  * per draw, independently for each of the k draws) are dropped, not
  * re-drawn: re-drawing needs data-dependent iteration; dropping
  * keeps membership a pure projection. So callers get UP TO k
  * partners per anchor (k−1/N ≈ k expected); and because draws are
  * independent, two draws for one anchor can land on the SAME
  * partner — neg_id may repeat across j for an anchor. Both edges
  * are exactly replicated by the oracle; dedup on (anchor_id,
  * neg_id) downstream if distinct partners are required.
  *
  * Plan shape: the id pass (see `Ids`), one narrow ×k explode of a
  * two-column frame, one equi-join on the dense id. Anchor text /
  * payload columns never replicate through the explode — only ids
  * shuffle; join payloads back by id afterwards if needed.
  */
object Negatives {

  /** `k` corpus-uniform partners per row. `idCol` must be a unique
    * numeric key (it seeds the dense order). Output: anchor_id,
    * j (1..k, INT), neg_id — where anchor_id/neg_id carry `idCol`
    * values. `seed` re-deals every draw. */
  def sample(df: DataFrame, idCol: String, k: Int, seed: Long = 0L): DataFrame = {
    require(k > 0, "k must be positive")
    val (numbered, total) = Ids.globalRowNumberWithTotal(
      df.select(col(idCol)), idCol, Seq(idCol), out = "__rid")
    require(total > 1, "need at least 2 rows to draw negatives")
    // the (rid, id) frame feeds BOTH sides of the translate-back
    // join; without truncation the bucket-sort-window id pass would
    // execute twice per action (ReuseExchange dedups exchanges, not
    // the sort+window on top). localCheckpoint materializes the
    // two-long-per-row frame once — same pattern as Components.
    val ids = numbered.localCheckpoint()

    val drawn = ids
      .withColumn("j", explode(array((1 to k).map(lit): _*)))
      .withColumn("__neg_rid",
        lit(1L) + pmod(
          graft.plans.Hash60.hash60(concat_ws(":",
            lit(seed), col("__rid").cast("string"), col("j").cast("string"))),
          lit(total)))
      .where(col("__neg_rid") =!= col("__rid"))

    val lookup = ids.select(col("__rid").as("__neg_rid"), col(idCol).as("neg_id"))
    drawn.join(lookup, "__neg_rid")
      .select(col(idCol).as("anchor_id"), col("j").cast("int").as("j"), col("neg_id"))
  }
}
