package graft

import graft.functions.Redact
import graft.operators.{Incremental, NearDup, TfIdf}
import graft.ops.Chunking
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties for the round-4 training-data operators,
  * using PropertySpec's manual-sampling pattern (the
  * scalatest-scalacheck bridge isn't in the offline cache). */
class TrainingPropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAllSamples[T](gen: Gen[T])(body: T => Unit): Unit = {
    val params = Gen.Parameters.default.withSize(40)
    (1 to 5).foreach { i =>
      gen.apply(params, Seed(1042L + i)).foreach(body)
    }
  }

  test("chunking: every token is covered, chunk count is ceil(n/step)") {
    val gen = for {
      n <- Gen.choose(0, 60)
      maxT <- Gen.choose(1, 12)
      ov <- Gen.choose(0, maxT - 1)
    } yield (n, maxT, ov)
    forAllSamples(gen) { case (n, maxT, ov) =>
      val text = (1 to n).map(i => s"w$i").mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val chunks = Chunking.chunkByTokens(df, "text", "doc_id", maxT, ov).collect()
      val step = maxT - ov
      val nTok = if (n == 0) 1 else n // "" tokenizes to [""]
      assert(chunks.length == (nTok + step - 1) / step, s"n=$n maxT=$maxT ov=$ov")
      if (n > 0) {
        val covered = chunks.flatMap(_.getAs[String]("chunk_text").split(" ")).toSet
        assert(covered == (1 to n).map(i => s"w$i").toSet, s"n=$n maxT=$maxT ov=$ov")
      }
    }
  }

  test("redaction is idempotent: redact(redact(x)) == redact(x)") {
    val word = Gen.oneOf("alpha", "beta", "x1", "a@b.io", "c.d@e-f.org",
      "10.0.0.1", "999.12.13.14", "+62 812-3456-789", "021-555-0199", "2024-01-01", "...")
    val gen = Gen.listOf(word).map(_.mkString(" "))
    forAllSamples(gen) { text =>
      val df = Seq(text).toDF("t")
      val once = df.select(Redact.redact($"t")).head().getString(0)
      val twice = Seq(once).toDF("t").select(Redact.redact($"t")).head().getString(0)
      assert(twice == once, s"input: $text")
    }
  }

  test("incremental probe == corpus-wide exact pairs restricted to cross pairs") {
    // docs are random token lists over a TINY vocab so near-dups occur
    val docGen = Gen.choose(5, 10).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    val gen = for {
      nOld <- Gen.choose(1, 6)
      nNew <- Gen.choose(1, 4)
      docs <- Gen.listOfN(nOld + nNew, docGen)
    } yield (nOld, docs)
    forAllSamples(gen) { case (nOld, docs) =>
      val all = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val old = all.take(nOld).toDF("doc_id", "text")
      val batch = all.drop(nOld).toDF("doc_id", "text")
      val oldSh = NearDup.shingled(old, "text", 3)
      val got = Incremental
        .nearDupsAgainstFrom(NearDup.shingled(batch, "text", 3),
          Incremental.bandTable(oldSh), oldSh, 0.8)
        .select($"new_id", $"old_id").as[(Long, Long)].collect().toSet
      val oldIds = all.take(nOld).map(_._1).toSet
      val expected = NearDup
        .jaccardPairs(all.toDF("doc_id", "text"), "text", 3, 0.8)
        .select($"d1", $"d2").as[(Long, Long)].collect()
        .collect { // jaccardPairs orders d1 < d2; cross pairs flip to (new, old)
          case (d1, d2) if oldIds(d1) && !oldIds(d2) => (d2, d1)
          case (d1, d2) if !oldIds(d1) && oldIds(d2) => (d1, d2)
        }.toSet
      assert(got == expected, s"old=$nOld docs=$docs")
    }
  }

  test("tf-idf: at most k rows per doc, ranks dense from 1, tfidf positive") {
    val docGen = Gen.choose(1, 8).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("p", "q", "r", "s", "t")).map(_.mkString(" ")))
    val gen = Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, docGen))
    forAllSamples(gen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = TfIdf.topTerms(df, "text", 3).collect()
      out.groupBy(_.getAs[Long]("doc_id")).values.foreach { rows =>
        assert(rows.length <= 3)
        assert(rows.map(_.getAs[Int]("rnk")).sorted.toSeq == (1 to rows.length))
        assert(rows.forall(_.getAs[Double]("tfidf") > 0))
      }
    }
  }
}
