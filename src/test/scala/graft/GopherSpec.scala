package graft

import graft.ops.Gopher
import org.apache.spark.sql.functions._

class GopherSpec extends SparkSpec {
  import spark.implicits._

  // doc 1: "a b\nc d\na b\n\nc d\na b" —
  //   lines: [a b, c d, a b, c d, a b] → 5 lines, 3 dup (2×"a b",
  //   1×"c d"), dup_line_frac = 3/5; all lines 3 chars →
  //   dup_line_char_frac = 9/15 = 3/5
  //   paragraphs (\n\n): ["a b\nc d\na b", "c d\na b"] → distinct →
  //   dup_para_frac = 0
  // doc 2: "x\nx\nx\n\nx\nx\nx" — paragraphs identical → dup 1/2
  // doc 3: empty; doc 4: NULL
  private def docs = Seq(
    (1L, "a b\nc d\na b\n\nc d\na b"),
    (2L, "x\nx\nx\n\nx\nx\nx"),
    (3L, ""),
    (4L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("repetitionSignals: hand-computed line/para dup fractions; empty and NULL docs report 0") {
    val out = Gopher.repetitionSignals(docs, "text")
      .orderBy($"doc_id")
      .as[(Long, Double, Double, Double, Double)].collect()
    assert(out(0) == ((1L, 3.0 / 5, 9.0 / 15, 0.0, 0.0)))
    assert(out(1)._2 == 5.0 / 6) // 6 x-lines, 5 beyond-first
    assert(out(1)._4 == 0.5) // 2 identical paragraphs
    assert(out(2) == ((3L, 0.0, 0.0, 0.0, 0.0)))
    assert(out(3) == ((4L, 0.0, 0.0, 0.0, 0.0)))
  }

  test("repetitionSignals is a row-local projection: no Exchange in the plan") {
    val plan = Gopher.repetitionSignals(docs, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("topNgramCharFrac: count*tokenChars of the deterministic top gram over token chars") {
    // doc 1 bigrams: [a b, b c, c a, a b] → top "a b" ×2, token
    // chars 2, total token chars 5 → 4/5
    // doc 2: shorter than n → 0.0, top_gram empty
    val d = Seq((1L, "a b c a b"), (2L, "z")).toDF("doc_id", "text")
    val out = Gopher.topNgramCharFrac(d, "text", 2)
      .orderBy($"doc_id").as[(Long, String, Double)].collect()
    assert(out(0) == ((1L, "a b", 4.0 / 5)))
    assert(out(1) == ((2L, "", 0.0)))
  }

  test("topNgramCharFrac tie-break: equal counts pick longer token chars, then smallest gram") {
    // "aa bb cc dd": bigrams all unique (count 1) — tie on count and
    // length → lexicographically smallest "aa bb" wins
    val d = Seq((1L, "aa bb cc dd")).toDF("doc_id", "text")
    val out = Gopher.topNgramCharFrac(d, "text", 2).as[(Long, String, Double)].collect()
    assert(out(0)._2 == "aa bb")
  }

  test("dupNgramCharFrac: overlapping duplicate grams union their token positions") {
    // "a b a b a": bigrams [a b, b a, a b, b a] — all duplicated;
    // covered positions 0..4 = every token → frac 1.0
    val d1 = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    val o1 = Gopher.dupNgramCharFrac(d1, "text", 2).as[(Long, Double)].collect()
    assert(o1(0)._2 == 1.0)
    // "aa bb aa bb zz qq": dup bigram "aa bb" at positions 0 and 2 →
    // covers tokens 0,1,2,3 (8 chars) of 12 total → 2/3; the
    // count*len shortcut would say 2*5/17 of a span — the union form
    // counts each token once
    val d2 = Seq((1L, "aa bb aa bb zz qq")).toDF("doc_id", "text")
    val o2 = Gopher.dupNgramCharFrac(d2, "text", 2).as[(Long, Double)].collect()
    assert(o2(0)._2 == 8.0 / 12)
    // no duplicates → 0; doc shorter than n → 0
    val d3 = Seq((1L, "a b c"), (2L, "x")).toDF("doc_id", "text")
    val o3 = Gopher.dupNgramCharFrac(d3, "text", 2)
      .orderBy($"doc_id").as[(Long, Double)].collect()
    assert(o3.map(_._2).toSeq == Seq(0.0, 0.0))
  }

  test("qualityRules: each rule trips on its designed violator") {
    val d = Seq(
      // passes everything (with minWords=5): 8 words, normal
      // lengths, 2 stop words, alphabetic, no bullets/ellipses
      (1L, "the cat sat on the mat with hats"),
      // too few words
      (2L, "the and"),
      // symbol soup: ellipses outnumber a tenth of the words
      (3L, "the stuff and ... more ... stuff ... here ... now ..."),
      // bullet lines > 90%
      (4L, "- the point\n- and another\n- that too\n- have more\n- with zeal"),
      // non-alphabetic words > 20%
      (5L, "the 1 2 3 4 5 6 and 9 10"),
      // only one distinct stop word
      (6L, "the quick brown fox jumps over lazy dogs")
    ).toDF("doc_id", "text")
    val out = Gopher.qualityRules(d, "text", minWords = 5)
      .orderBy($"doc_id")
      .select($"doc_id", $"r_word_count", $"r_symbol", $"r_bullet", $"r_alpha", $"r_stop", $"pass")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
    assert(out(0) == ((1L, true, true, true, true, true, true)))
    assert(!out(1)._2 && !out(1)._7) // word count
    assert(!out(2)._3 && !out(2)._7) // symbol ratio
    assert(!out(3)._4 && !out(3)._7) // bullets
    assert(!out(4)._5 && !out(4)._7) // alpha fraction
    assert(!out(5)._6 && !out(5)._7) // stop words
  }

  test("qualityRules: mean word length bounds and unicode ellipsis both count") {
    val d = Seq(
      (1L, "aaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbb cccccccccccccccc dddddddddddddddd eeeeeeeeeeeeeeee"),
      (2L, "the thing and … more … stuff … here … too …")
    ).toDF("doc_id", "text")
    val out = Gopher.qualityRules(d, "text", minWords = 3)
      .orderBy($"doc_id")
      .select($"r_word_len", $"r_symbol").as[(Boolean, Boolean)].collect()
    assert(!out(0)._1) // mean 16 chars > 10
    assert(!out(1)._2) // 5 unicode ellipses / 10 words > 0.1
  }

  test("qualityRules and repetitionSignals report NULL text as zeros, pass=false") {
    val d = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val q = Gopher.qualityRules(d, "text").select($"n_words", $"pass")
      .as[(Int, Boolean)].collect()
    assert(q(0) == ((0, false)))
  }
}
