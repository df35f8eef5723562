package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document repeated-substring removal — the exact-substring
  * half of training-data dedup (Lee et al. 2021, "Deduplicating
  * Training Data Makes Language Models Better", arXiv:2107.06499):
  * any n-token sequence that occurs more than once in the corpus is
  * removed from every position EXCEPT its first occurrence (smallest
  * (doc_id, pos)), and the surviving tokens are reassembled in
  * order. Near-dup operators (MinHash/SimHash/SemDeDup) drop whole
  * documents; this one surgically removes the repeated SPANS —
  * boilerplate paragraphs, license headers, quoted chunks — that
  * whole-document dedup can't see.
  *
  * Semantics, precisely:
  *  - occurrences of duplicated n-grams (global occurrence count ≥ 2)
  *    are ranked by (doc_id, pos); rank 1 is canonical and kept;
  *  - every other occurrence masks its n token positions; overlapping
  *    masks union;
  *  - a doc's output is its unmasked tokens joined by single spaces
  *    (the library's whitespace-canonical reassembly, same convention
  *    as Boilerplate.removeFrequentUnits).
  *
  * Grams are compared by their 60-bit content hash
  * (`plans.Hash60` over the '_'-joined token window — the same
  * convention as every shingle operator here, and the same md5
  * formula the DuckDB oracle rebuilds). A hash collision would merge
  * two distinct grams' occurrence lists (masking a non-duplicate);
  * the expected collision count stays below 1 until ~2³⁰ distinct
  * grams per corpus — and because BOTH engines hash identically, the
  * oracle equality is exact regardless.
  *
  * Scale shape: one posexplode to (doc_id, pos, h) — longs only, the
  * gram STRINGS never shuffle; per-gram stats by groupBy(h) with
  * map-side partials (skew-safe for the chrome gram that appears 10⁹
  * times — unlike a window over h, which would sort the hot
  * partition); one equi-join back on h; the mask explode is bounded
  * by n × masked occurrences; the rebuild is one (doc_id) aggregate.
  * At 100 TB everything that moves is (long, long, long) triples.
  */
object SubstringDedup {

  /** (doc_id, text_clean, n_tokens, n_removed) for every input doc
    * (token-less docs pass through with empty text_clean). */
  def removeRepeatedNgrams(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n >= 2, s"n must be >= 2 (n=1 would mask every repeated token), got $n")
    // coalesce: NULL text means zero tokens, not a NULL spine row
    val toks = docs.select(col("doc_id"),
      coalesce(filter(graft.functions.TextFunctions.tokens(col(textCol)),
        t => length(t) > 0), array().cast("array<string>")).as("toks"))

    // (doc_id, pos, h): one row per n-gram occurrence, hash only
    val occ = toks.select(col("doc_id"),
        posexplode(when(size(col("toks")) >= n,
          transform(sequence(lit(0), size(col("toks")) - n),
            i => graft.plans.Hash60.hash60(
              concat_ws("_", (0 until n).map(j => element_at(col("toks"), i + j + 1)): _*))))
          .otherwise(array().cast("array<long>"))))
      .toDF("doc_id", "pos", "h")

    // per-gram occurrence count + canonical (first) occurrence —
    // groupBy with partial aggregation, not a window over h (a hot
    // boilerplate gram would serialize a window's sort)
    val stats = occ.groupBy(col("h")).agg(
      count(lit(1)).as("cnt"),
      min(struct(col("doc_id"), col("pos"))).as("first_occ"))

    // non-canonical occurrences of duplicated grams → masked indices
    val covered = occ.join(stats, Seq("h"))
      .where(col("cnt") >= 2 &&
        !(col("doc_id") === col("first_occ.doc_id") && col("pos") === col("first_occ.pos")))
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + n - 1)).as("idx"))

    // rebuild: surviving tokens in order; docs spine keeps empty docs
    val pos = toks.select(col("doc_id"), posexplode(col("toks")).as(Seq("idx", "token")))
    val kept = pos.join(covered, Seq("doc_id", "idx"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("idx"), col("token")))).as("ordered"))
      .select(col("doc_id"),
        concat_ws(" ", transform(col("ordered"), s => s.getField("token"))).as("text_clean"),
        size(col("ordered")).cast("long").as("n_kept"))
    toks.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }
}
