package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-document character-distribution entropy — the cheap garbage
  * detector a curation pipeline runs before any model-based scorer:
  * mojibake, base64 blobs, and key-mash have near-uniform byte
  * histograms (high H), while template boilerplate and repeated
  * padding sit far below natural text's ~4 bits/char. Complements
  * the Gopher repetition battery (which looks at n-gram STRUCTURE;
  * this looks at the symbol distribution itself).
  *
  *   H(doc) = −Σ_c (n_c/n)·ln(n_c/n)   (nats)
  *
  * Determinism is the `Drift.psi` contract: counts are exact
  * integers; each character contributes ONE double expression
  * nano-rounded to a long, and the per-doc total is a sum of
  * pre-rounded longs — order-free, bit-identical across engines and
  * partitionings.
  *
  * Scale shape: explode to (doc, char) → one hash aggregate with
  * map-side partials (the shuffle carries (doc, distinct-char)
  * rows — alphabet-bounded per doc, NOT text-sized), a same-key
  * re-aggregate for doc lengths, one join on the doc key reusing
  * that partitioning, and the final per-doc sum. A single hot doc
  * costs its alphabet, not its length.
  */
object Entropy {

  /** (idCol, n_chars, distinct_chars, h_nano) per document; empty
    * and NULL texts are dropped (entropy of nothing is undefined —
    * emitting 0 would read as "perfectly repetitive"). */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chars = docs
      .where(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol), explode(split(col(textCol), "")).as("__ch"))
      .where(col("__ch") =!= "") // some engines emit a trailing empty split
      .groupBy(col(idCol), col("__ch"))
      .agg(count(lit(1)).as("__nc"))
    val totals = chars
      .groupBy(col(idCol))
      .agg(sum(col("__nc")).as("__n"), count(lit(1)).as("distinct_chars"))
    chars.join(totals, Seq(idCol))
      .select(col(idCol), col("distinct_chars"), col("__n"),
        round(lit(-1e9) * (col("__nc").cast("double") / col("__n").cast("double")) *
          log(col("__nc").cast("double") / col("__n").cast("double")))
          .cast("long").as("__hc"))
      .groupBy(col(idCol))
      .agg(first(col("__n")).as("n_chars"),
        first(col("distinct_chars")).as("distinct_chars"),
        sum(col("__hc")).as("h_nano"))
  }
}
