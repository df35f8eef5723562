package graft

import graft.operators.Contamination
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    (1L, "the quick brown fox jumps over the lazy dog every day"),
    (2L, "spark catalyst plans declarative queries into physical operators")
  ).toDF("doc_id", "text")

  test("a verbatim eval doc is fully contaminated; a fresh one is clean") {
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog every day"), // verbatim
      (101L, "eleven genuinely novel benchmark tokens appearing nowhere in training"),
      (102L, "too short")  // < 3 tokens → no shingles
    ).toDF("doc_id", "text")
    val out = Contamination.evalContamination(train, eval, "text", 3, 0.8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("containment"), r.getAs[Boolean]("is_contaminated")))).toMap
    assert(out(100L) == ((1.0, true)))
    assert(out(101L) == ((0.0, false)))
    assert(out(102L) == ((0.0, false)))
  }

  test("partial overlap reports the exact shingle fraction") {
    // eval doc shares its first 5 tokens (3 shingles) with train doc 1
    val eval = Seq((200L, "the quick brown fox jumps straight into entirely new material here"))
      .toDF("doc_id", "text")
    val r = Contamination.evalContamination(train, eval, "text", 3, 0.5).head()
    val nSh = r.getAs[Int]("n_shingles")
    assert(r.getAs[Long]("n_contaminated") == 3L)
    assert(r.getAs[Double]("containment") == 3.0 / nSh)
    assert(!r.getAs[Boolean]("is_contaminated"))
  }

  test("repetitionRatio: boilerplate scores high, varied text scores 0") {
    val df = Seq(
      (1L, "buy now buy now buy now buy now buy now"),
      (2L, "each word here appears exactly once in this sentence"),
      (3L, "ab cd")
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id", TF.repetitionRatio($"text", 3).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 10 tokens → 8 trigrams, only 2 distinct ("buy now buy", "now buy now")
    assert(out(1L) == 1.0 - 2.0 / 8.0)
    assert(out(2L) == 0.0)
    assert(out(3L) == 0.0) // shorter than n → no n-grams, reports 0
  }

  test("contaminationSources attributes the right training docs, ranked by overlap") {
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog every day"), // = train 1
      (101L, "spark catalyst plans declarative queries into something else entirely"),
      (102L, "eleven genuinely novel benchmark tokens appearing nowhere in training")
    ).toDF("doc_id", "text")
    val out = Contamination.contaminationSources(train, eval, "text", 3,
        minCommon = 2L, k = 2)
      .collect().map(r => (r.getAs[Long]("eval_id"), r.getAs[Long]("train_id"),
        r.getAs[Long]("n_common"), r.getAs[Int]("rnk")))
    // eval 100 fully matches train 1 (9 shingles), nothing from train 2
    assert(out.count(_._1 == 100L) == 1)
    assert(out.find(_._1 == 100L).get._2 == 1L)
    assert(out.find(_._1 == 100L).get._3 == 9L)
    // eval 101 shares its 4-token prefix (2 shingles of wiggle) with train 2
    assert(out.find(_._1 == 101L).map(_._2) == Some(2L))
    // the clean doc attributes nothing
    assert(!out.exists(_._1 == 102L))
  }

  test("contaminationSources: the train-df cap drops ubiquitous shingles before the join") {
    // 'a b c' appears in EVERY training doc; with the cap below that
    // df it stops contributing to any pair count
    val tr = (1L to 5L).map(i => (i, s"a b c unique$i tail$i more$i")).toDF("doc_id", "text")
    val ev = Seq((100L, "a b c something else entirely here")).toDF("doc_id", "text")
    val capped = Contamination.contaminationSources(tr, ev, "text", 3,
        minCommon = 1L, k = 5, maxTrainDf = 4L)
    assert(capped.isEmpty, "the df-5 shingle must be stop-listed at cap 4")
    val uncapped = Contamination.contaminationSources(tr, ev, "text", 3,
        minCommon = 1L, k = 5, maxTrainDf = 5L)
    assert(uncapped.count() == 5L, "at cap 5 all five train docs attribute via the shared shingle")
  }
}
