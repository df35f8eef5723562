package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "a tiny image payload", "srcA", 20L),
    (1L, "an audio payload with more bytes", "srcB", 32L),
    (2L, "video payload content here", "srcC", 26L),
    (3L, "another image-ish thing", "srcD", 23L)
  ).toDF("doc_id", "text", "source", "n_chars")

  private lazy val media = Multimodal.fromDocuments(docs)

  test("media frame has the declared schema (binary payload + typed meta)") {
    assert(media.schema("payload").dataType.typeName == "binary")
    assert(media.schema("meta").dataType.typeName == "struct")
    assert(media.count() == 4)
  }

  test("decodeFeatures is deterministic, partition-batched, and kind-aware") {
    val f1 = Multimodal.decodeFeatures(media).orderBy($"media_id").collect()
    val f2 = Multimodal.decodeFeatures(Multimodal.balanceBySize(media, 3)).orderBy($"media_id").collect()
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq) // partitioning must not change results
    f1.foreach { r =>
      val kind = r.getAs[String]("kind")
      if (kind == "audio") {
        assert(!r.isNullAt(r.fieldIndex("sample_rate")) && r.isNullAt(r.fieldIndex("width")))
      } else {
        assert(r.isNullAt(r.fieldIndex("sample_rate")) && !r.isNullAt(r.fieldIndex("width")))
      }
      assert(r.getAs[collection.Seq[Double]]("features").size == 8)
      assert(r.getAs[Long]("n_bytes") > 0)
    }
  }

  test("resizeStub computes a uniform scale only for dimensioned media") {
    val out = Multimodal.resizeStub(Multimodal.decodeFeatures(media), 224, 224)
    out.collect().foreach { r =>
      if (r.getAs[String]("kind") == "audio") assert(r.isNullAt(r.fieldIndex("scale")))
      else assert(r.getAs[Double]("scale") > 0.0)
    }
  }

  test("frameSampleStub explodes deterministic frame rows for videos only") {
    val frames = Multimodal.frameSampleStub(media, everyK = 4, maxFrames = 8)
    val kinds = frames.join(media, Seq("media_id")).select($"kind").distinct().as[String].collect()
    assert(kinds.toSeq == Seq("video"))
    val idxs = frames.select($"frame_idx").as[Int].collect()
    assert(idxs.forall(_ % 4 == 0))
    assert(idxs.nonEmpty && idxs.length <= 8)
  }
}
