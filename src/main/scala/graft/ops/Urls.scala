package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL normalization for web-corpus curation — the canonicalization
  * step every crawl-derived training set runs before per-domain
  * aggregation, domain-level quality scoring, and URL-key dedup
  * (two spellings of one URL are the most common exact-dup source in
  * crawl data).
  *
  * Everything is built from `regexp_extract`/`regexp_replace` column
  * expressions — codegen'd, row-local, no UDF, streaming-legal —
  * and every rule is deterministic, so normalized keys are stable
  * across engines (q_domain_stats checks the whole chain against
  * ground-truth hosts constructed arithmetically in the oracle).
  *
  * Normalization contract (documented, exact):
  *  - fragment (`#…`) dropped;
  *  - host matched after an optional `scheme://` (bare
  *    `example.com/path` works; userinfo is not supported — it is a
  *    phishing marker worth quarantining upstream, not normalizing);
  *  - host lowercased; explicit port, ONE trailing dot, and ONE
  *    leading `www.` stripped (in that order — `WWW.x.com.:8080`
  *    → `x.com`);
  *  - `registrableDomain` = last two labels, a documented
  *    public-suffix-LITE approximation: correct for `.com`/`.org`
  *    style TLDs, wrong for multi-label suffixes like `co.uk`
  *    (a real PSL is a ~10k-row broadcast-join table, the same
  *    plan shape — this keeps the exact-oracle property instead).
  *
  * Scale: a narrow per-row projection — normalization cost is
  * O(bytes scanned), no shuffle; the per-domain aggregate after it
  * is one hash aggregation on a low-cardinality key.
  */
object Urls {

  /** The URL without its fragment part. */
  def stripFragment(url: Column): Column = regexp_replace(url, "#.*$", "")

  /** Raw `host[:port]` as spelled (lowercased), after an optional
    * scheme. Empty string when nothing host-like is present. */
  private def hostPort(url: Column): Column =
    lower(regexp_extract(stripFragment(url),
      "^(?:[A-Za-z][A-Za-z0-9+.-]*://)?([^/?#]+)", 1))

  /** Normalized host: lowercased, port / one trailing dot / one
    * leading `www.` stripped. */
  def host(url: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(hostPort(url), ":[0-9]+$", ""),
        "\\.$", ""),
      "^www\\.", "")

  /** Last two labels of a normalized host (public-suffix-lite; see
    * class doc). Empty string for single-label hosts. */
  def registrableDomain(hostCol: Column): Column =
    regexp_extract(hostCol, "([^.]+\\.[^.]+)$", 1)

  /** Path with the default-document normalization crawls use: no
    * path → `/`; query string kept (it distinguishes documents),
    * fragment dropped. */
  def pathQuery(url: Column): Column = {
    val pq = regexp_extract(stripFragment(url),
      "^(?:[A-Za-z][A-Za-z0-9+.-]*://)?[^/?#]*(.*)$", 1)
    // default document in BOTH no-path shapes: bare host AND
    // query-without-path (`host?q=1` ≡ `host/?q=1`)
    when(pq === "", lit("/"))
      .when(pq.startsWith("?"), concat(lit("/"), pq))
      .otherwise(pq)
  }

  /** Full canonical key for URL-level dedup:
    * `host + pathQuery` — scheme deliberately dropped (http/https
    * duplicates are the same document in crawl data). */
  def canonicalKey(url: Column): Column = concat(host(url), pathQuery(url))

  /** Hierarchical path prefixes for URL-tree rollups: "/a/b/c" →
    * ["/a", "/a/b", "/a/b/c"] (up to `maxDepth` levels — deeper
    * segments fold into their depth-maxDepth ancestor, keeping the
    * explode bounded by a constant per URL). Exploding these and
    * aggregating gives the per-subtree traffic/count rollup a crawl
    * frontier or robots audit reads ("which sections carry the
    * corpus"), without a recursive query: the hierarchy is
    * materialized as ≤ maxDepth extra rows per URL, aggregated by
    * one hash aggregate. Empty paths yield an empty array. */
  def pathPrefixes(path: org.apache.spark.sql.Column, maxDepth: Int): org.apache.spark.sql.Column = {
    require(maxDepth >= 1, s"pathPrefixes: maxDepth must be >= 1, got $maxDepth")
    val segs = filter(split(path, "/"), s => length(s) > 0)
    // sequence() steps DOWNWARD for start > stop (the wordShingles
    // guard): an empty segment list must short-circuit to []
    when(size(segs) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), least(size(segs), lit(maxDepth))),
        i => concat(lit("/"), array_join(slice(segs, lit(1), i), "/"))))
  }
}
