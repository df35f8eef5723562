package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document quality signals (Rae et al. 2021, appendix
  * A1) — the standard pre-training corpus filter battery: intra-
  * document repetition measurements and rule-based quality flags.
  * Complements `TextFunctions.repetitionRatio` (one scalar) with the
  * full per-unit table the published pipelines actually gate on.
  *
  * Two cost classes, kept deliberately separate:
  *
  *  - `repetitionSignals` and `qualityRules` are ROW-LOCAL — pure
  *    higher-order-function projections over each document (split,
  *    filter, array_distinct, aggregate). No shuffle, no state:
  *    streaming-legal unchanged (StreamCurationSpec's row-local
  *    class), embarrassingly parallel at any corpus size.
  *
  *  - `topNgramCharFrac` / `dupNgramCharFrac` need per-document
  *    n-gram frequency tables, which we compute with explode +
  *    aggregate keyed by (doc, gram) — two narrow shuffles whose key
  *    cardinality is bounded by corpus token count. The row-local
  *    alternative (frequency via nested array filters) is O(len²)
  *    per document and melts on long documents; the shuffle form is
  *    the one that survives 100 TB.
  *
  * Character fractions are over TOKEN characters (separators
  * excluded) — exact in integers, identical in the DuckDB mirror;
  * the published span-based variant differs only by inter-token
  * separator chars. Duplicate-unit fractions follow the standard
  * "occurrences beyond the first" convention:
  * dup_frac = 1 − distinct/total.
  */
object Gopher {

  /** Non-empty units of `text` under a LITERAL separator (runs of
    * separators collapse — same convention as Boilerplate). */
  private def units(text: Column, sep: String): Column =
    filter(split(text, java.util.regex.Pattern.quote(sep)),
      u => length(u) > 0)

  /** Fraction of units that are repeats of an earlier occurrence:
    * 1 − distinct/total. Empty/NULL-unit docs → 0.0. */
  def dupUnitFrac(us: Column): Column =
    when(size(us) > 0,
      lit(1.0) - size(array_distinct(us)).cast("double") / size(us).cast("double"))
      .otherwise(lit(0.0))

  /** Fraction of unit CHARACTERS inside repeated occurrences:
    * (Σ len(unit) − Σ len(distinct unit)) / Σ len(unit).
    * A duplicated long line weighs more than a duplicated short one
    * — the reason Gopher tracks char fractions next to line
    * fractions. Empty/NULL-unit docs → 0.0. */
  def dupUnitCharFrac(us: Column): Column = {
    val totalChars = aggregate(us, lit(0L), (acc, u) => acc + length(u))
    val distinctChars = aggregate(array_distinct(us), lit(0L), (acc, u) => acc + length(u))
    when(totalChars > 0,
      (totalChars - distinctChars).cast("double") / totalChars.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Per-document duplicate-line and duplicate-paragraph fractions
    * (count and character weighted): (doc_id, dup_line_frac,
    * dup_line_char_frac, dup_para_frac, dup_para_char_frac).
    *
    * `paraSep` must be a repetition/superset of `lineSep` (the usual
    * "\n\n" over "\n") or any other literal; lines are split on
    * `lineSep` alone, so paragraph boundaries collapse into line
    * boundaries naturally. Row-local: one projection, no shuffle. */
  def repetitionSignals(docs: DataFrame, textCol: String,
                        lineSep: String = "\n", paraSep: String = "\n\n"): DataFrame = {
    require(lineSep.nonEmpty && paraSep.nonEmpty, "separators must be non-empty")
    val lines = units(col(textCol), lineSep)
    val paras = units(col(textCol), paraSep)
    docs.select(col("doc_id"),
      dupUnitFrac(lines).as("dup_line_frac"),
      dupUnitCharFrac(lines).as("dup_line_char_frac"),
      dupUnitFrac(paras).as("dup_para_frac"),
      dupUnitCharFrac(paras).as("dup_para_char_frac"))
  }

  /** Word n-grams with their start position: (doc_id, gpos, gram) —
    * gram text joined with a single space, positions 0-based. The
    * gram LIST is built row-locally (no shuffle); the caller decides
    * whether to explode. */
  private def gramRows(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    // empty tokens from edge whitespace are dropped BEFORE gram
    // positions are assigned (with n=1 the phantom "" gram would
    // otherwise out-count every real token); dupNgramCharFrac's
    // token-position frame enumerates the same filtered array, so
    // positions stay aligned
    val toks = filter(graft.functions.TextFunctions.tokens(col(textCol)),
      t => length(t) > 0)
    // starts 1..m-n+1 (slice is 1-based). The short-doc case MUST be
    // an explicit empty array: sequence(1, 0) in Spark steps DOWN to
    // [1, 0], which would fabricate grams from truncated slices.
    val starts = when(size(toks) >= n, sequence(lit(1), size(toks) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    val grams = transform(starts, i => concat_ws(" ", slice(toks, i, lit(n))))
    docs.select(col("doc_id"), posexplode(grams).as(Seq("gpos", "gram")))
  }

  /** Fraction of token characters inside the most frequent word
    * n-gram of each document: count(top gram) · tokenChars(top gram)
    * / Σ tokenChars(doc). Top gram is deterministic: max count, then
    * max char length, then lexicographically smallest. Documents
    * shorter than n tokens report 0.0. Output: (doc_id, top_gram,
    * top_gram_char_frac).
    *
    * Spans of the same gram may overlap in the document; like the
    * published implementations this multiplies count · length
    * without overlap-union (the n=2..4 regime Gopher uses this for
    * makes unions a second-order correction). */
  def topNgramCharFrac(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    // token chars of a gram = chars(gram) − (n−1) single-space joins
    val gramTokChars = length(col("gram")) - (n - 1)
    val counts = gramRows(docs, textCol, n)
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    // deterministic argmax "count desc, len desc, gram ASC" — the
    // mixed direction rules out one max_by, and a row_number window
    // would SORT corpus-token-scale rows; two hash aggregates + one
    // self-join (all keyed by doc, all with map-side partials) get
    // the same answer sort-free: max (cnt, len) per doc, then the
    // lexicographically smallest gram among the ties
    val withLen = counts.withColumn("tc", gramTokChars)
    val best = withLen.groupBy(col("doc_id"))
      .agg(max(struct(col("cnt"), col("tc"))).as("mx"))
    val top1 = withLen.join(best, Seq("doc_id"))
      .where(col("cnt") === col("mx.cnt") && col("tc") === col("mx.tc"))
      .groupBy(col("doc_id"))
      .agg(min(col("gram")).as("top_gram"),
        max(col("cnt") * col("tc")).as("top_chars"))
    val totals = docs.select(col("doc_id"),
      aggregate(graft.functions.TextFunctions.tokens(col(textCol)),
        lit(0L), (acc, t) => acc + length(t)).as("tok_chars"))
    totals.join(top1, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("top_gram"), lit("")).as("top_gram"),
        when(col("tok_chars") > 0 && col("top_chars").isNotNull,
          col("top_chars").cast("double") / col("tok_chars").cast("double"))
          .otherwise(lit(0.0)).as("top_gram_char_frac"))
  }

  /** Fraction of token characters covered by ANY word n-gram that
    * occurs at least twice in the document — the n=5..10 Gopher
    * signal. Overlapping duplicate grams are position-UNIONED (each
    * token counted once), the part the count·length shortcut gets
    * wrong at exactly the doc lengths this filter targets. Output:
    * (doc_id, dup_ngram_char_frac).
    *
    * Shape: gram list row-local → (doc, gram) count → duplicated
    * grams back to their start positions → explode each to its n
    * covered token positions → distinct → sum covered token chars.
    * All shuffles are keyed by doc or (doc, gram) — narrow rows,
    * corpus-linear. */
  def dupNgramCharFrac(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val toks = docs.select(col("doc_id"),
      posexplode(filter(graft.functions.TextFunctions.tokens(col(textCol)),
        t => length(t) > 0))
        .as(Seq("pos", "tok")))
    val grams = gramRows(docs, textCol, n)
    // duplicated gram KEYS only — no collect_list of positions: a
    // pathological spam doc can put millions of occurrences in one
    // (doc, gram) group, and a per-group array is exactly the buffer
    // blow-up this filter's targets would trigger. Joining the gram
    // occurrences back (the DuckDB oracle's shape) keeps every row
    // narrow.
    val dupGrams = grams
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 2)
      .select(col("doc_id"), col("gram"))
    val covered = grams.join(dupGrams, Seq("doc_id", "gram"))
      .select(col("doc_id"), explode(sequence(col("gpos"), col("gpos") + (n - 1))).as("pos"))
      .distinct()
    val coveredChars = covered.join(toks, Seq("doc_id", "pos"))
      .groupBy(col("doc_id")).agg(sum(length(col("tok"))).as("dup_chars"))
    val totals = toks.groupBy(col("doc_id")).agg(sum(length(col("tok"))).as("tok_chars"))
    docs.select(col("doc_id"))
      .join(totals, Seq("doc_id"), "left")
      .join(coveredChars, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("tok_chars") > 0,
          coalesce(col("dup_chars"), lit(0L)).cast("double") / col("tok_chars").cast("double"))
          .otherwise(lit(0.0)).as("dup_ngram_char_frac"))
  }

  /** Gopher stop words — presence of ≥ `minStopWords` distinct ones
    * is the "this is running text" rule. */
  val stopWords: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher rule battery, row-local: per-document metrics plus
    * one boolean per rule and the conjunction `pass`. Thresholds are
    * parameters (the published defaults assume web pages; short-doc
    * corpora tune them down). Output columns:
    * (doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
    * ellipsis_frac, alpha_frac, n_stop, r_word_count, r_word_len,
    * r_symbol, r_bullet, r_ellipsis, r_alpha, r_stop, pass).
    *
    * Rules (Rae et al. 2021 §A1.1): word count in [minWords,
    * maxWords]; mean word length in [3, 10]; symbol-to-word ratio
    * (#, …, ...) ≤ 0.1; ≤ 90% of lines start with a bullet; ≤ 30%
    * of lines end with an ellipsis; ≥ 80% of words contain an
    * alphabetic char; ≥ 2 of the 8 stop words present. */
  def qualityRules(docs: DataFrame, textCol: String,
                   minWords: Int = 50, maxWords: Int = 100000,
                   lineSep: String = "\n",
                   stops: Seq[String] = stopWords): DataFrame = {
    require(stops.nonEmpty, "stop-word list must be non-empty")
    // drop empty tokens: split(" +") yields "" for leading/trailing
    // whitespace, and phantom words would inflate n_words and dilute
    // every per-word ratio the rules gate on
    val toks = filter(graft.functions.TextFunctions.tokens(col(textCol)),
      t => length(t) > 0)
    // NULL text must yield n_words 0 (and pass=false), not a NULL
    // that poisons every downstream boolean
    val nWords = coalesce(size(toks), lit(0))
    val tokChars = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val meanLen = when(nWords > 0, tokChars.cast("double") / nWords.cast("double"))
      .otherwise(lit(0.0))
    // symbols: '#' occurrences + ellipsis occurrences ('…' or '...';
    // count '…' then '...' on a copy with '…' removed so neither
    // form double-counts)
    // literal patterns use translate/replace, not regexp_replace: the
    // same non-overlapping left-to-right semantics without a regex
    // matcher allocation per row (a per-document cost that matters at
    // corpus scale, and the DuckDB mirror is unchanged either way)
    val nHash = length(col(textCol)) - length(translate(col(textCol), "#", ""))
    val nUniEll = (length(col(textCol)) -
      length(translate(col(textCol), "…", ""))).cast("long")
    val noUni = translate(col(textCol), "…", "")
    val nAsciiEll = ((length(noUni) -
      length(replace(noUni, lit("..."), lit("")))) / 3).cast("long")
    val symbolRatio = when(nWords > 0,
      (nHash + nUniEll + nAsciiEll).cast("double") / nWords.cast("double"))
      .otherwise(lit(0.0))
    val lines = units(col(textCol), lineSep)
    val nLines = size(lines)
    val bulletFrac = when(nLines > 0,
      size(filter(lines, l => trim(l).startsWith("-") || trim(l).startsWith("*") ||
        trim(l).startsWith("•"))).cast("double") / nLines.cast("double"))
      .otherwise(lit(0.0))
    val ellipsisFrac = when(nLines > 0,
      size(filter(lines, l => trim(l).endsWith("...") || trim(l).endsWith("…")))
        .cast("double") / nLines.cast("double"))
      .otherwise(lit(0.0))
    val alphaFrac = when(nWords > 0,
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / nWords.cast("double"))
      .otherwise(lit(0.0))
    val lowered = filter(graft.functions.TextFunctions.tokens(lower(col(textCol))),
      t => length(t) > 0)
    val nStop = size(filter(
      typedLit(stops),
      s => array_contains(lowered, s)))
    val rWordCount = nWords >= minWords && nWords <= maxWords
    val rWordLen = meanLen >= 3.0 && meanLen <= 10.0
    val rSymbol = symbolRatio <= 0.1
    val rBullet = bulletFrac <= 0.9
    val rEllipsis = ellipsisFrac <= 0.3
    val rAlpha = alphaFrac >= 0.8
    val rStop = nStop >= 2
    docs.select(col("doc_id"),
      nWords.as("n_words"), meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"), bulletFrac.as("bullet_frac"),
      ellipsisFrac.as("ellipsis_frac"), alphaFrac.as("alpha_frac"),
      nStop.as("n_stop"),
      rWordCount.as("r_word_count"), rWordLen.as("r_word_len"),
      rSymbol.as("r_symbol"), rBullet.as("r_bullet"),
      rEllipsis.as("r_ellipsis"), rAlpha.as("r_alpha"), rStop.as("r_stop"),
      (rWordCount && rWordLen && rSymbol && rBullet && rEllipsis &&
        rAlpha && rStop).as("pass"))
  }
}
