package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Boilerplate removal by document frequency: drop the units (lines
  * of a web page, sentences, tokens) that appear in more than
  * `maxDfFrac` of all documents — navigation chrome, cookie banners,
  * license headers, disclaimer footers. The web-pipeline heuristic:
  * content is rare, boilerplate is everywhere; a unit's document
  * frequency separates them without any model.
  *
  * Unit identity is EXACT text; order within the document is
  * preserved, and the document is reassembled from its surviving
  * units. Documents whose units are all boilerplate come back as the
  * empty string (kept, not dropped — dropping is a corpus decision
  * that belongs to the caller's filter); NULL text stays NULL. Empty
  * units (from doubled separators) are dropped, so runs of
  * separators collapse on reassembly.
  *
  * Plan shape: posexplode (map-side Generate) → one distinct-doc
  * count per unit (two hash aggregates — the count is over DISTINCT
  * (unit, doc) so a unit repeated inside one page still counts that
  * page once) → equi-join units to their df (longs/strings only;
  * AQE broadcasts the unit-df side when the distinct-unit universe
  * is small) → one reassembly aggregate keyed by doc. Document text
  * crosses the wire once per stage; at 100 TB the unit-df frame is
  * the small side (distinct units, not occurrences).
  *
  * The df threshold is compared in exact integers
  * (`df · 1000 ≤ maxDfPermille · nDocs`) — no double rounding at the
  * boundary in either engine.
  */
object Boilerplate {

  /** Remove units with document frequency above `maxDfPermille`/1000.
    * Returns (doc_id, textCol cleaned). `sep` both splits and
    * re-joins (a literal separator, not a regex). */
  def removeFrequentUnits(docs: DataFrame, textCol: String, sep: String,
                          maxDfPermille: Int): DataFrame = {
    require(maxDfPermille >= 0 && maxDfPermille <= 1000,
      s"maxDfPermille must be in [0, 1000], got $maxDfPermille")
    require(sep.nonEmpty, "sep must be non-empty")
    val units = docs
      .select(col("doc_id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("pos", "unit")))
      .where(length(col("unit")) > 0)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val unitDf = units.select(col("unit"), col("doc_id")).distinct()
      .groupBy(col("unit")).agg(count(lit(1)).as("df"))
    units
      .join(unitDf, Seq("unit"))
      .crossJoin(broadcast(nDocs))
      // keep iff df/nDocs <= maxDfPermille/1000, in exact integers
      .where(col("df") * 1000 <= lit(maxDfPermille.toLong) * col("n_docs"))
      .groupBy(col("doc_id"))
      .agg(concat_ws(sep, array_sort(collect_list(struct(col("pos"), col("unit"))))
        .getField("unit")).as("kept"))
      // documents that lost everything reappear as empty strings;
      // NULL text stays NULL
      .join(docs.select(col("doc_id"), col(textCol).as("__orig")), Seq("doc_id"), "right")
      .select(col("doc_id"),
        when(col("__orig").isNull, lit(null).cast("string"))
          .otherwise(coalesce(col("kept"), lit(""))).as(textCol))
  }
}
