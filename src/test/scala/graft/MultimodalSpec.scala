package graft

import graft.multimodal.{ImageCodec, Multimodal}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** Build a real uncompressed 24-bpp BMP: pixels in row-major
    * top-down (r,g,b) order; written bottom-up with 4-byte row
    * padding, as the format requires. */
  private def bmpBytes(w: Int, h: Int, px: Seq[(Int, Int, Int)]): Array[Byte] = {
    require(px.length == w * h)
    val rowBytes = (w * 3 + 3) & ~3
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = (0 until 4).foreach(i => out.write((v >> (8 * i)) & 0xff))
    def le16(v: Int): Unit = (0 until 2).foreach(i => out.write((v >> (8 * i)) & 0xff))
    out.write('B'); out.write('M'); le32(54 + rowBytes * h); le32(0); le32(54)
    le32(40); le32(w); le32(h); le16(1); le16(24); le32(0); le32(rowBytes * h)
    le32(0); le32(0); le32(0); le32(0)
    for (y <- (h - 1) to 0 by -1) { // bottom-up
      for (x <- 0 until w) {
        val (r, g, b) = px(y * w + x)
        out.write(b); out.write(g); out.write(r) // BGR on disk
      }
      (w * 3 until rowBytes).foreach(_ => out.write(0))
    }
    out.toByteArray
  }

  private def ppmBytes(w: Int, h: Int, px: Seq[(Int, Int, Int)]): Array[Byte] = {
    require(px.length == w * h)
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"P6\n# comment\n$w $h\n255\n".getBytes("US-ASCII"))
    px.foreach { case (r, g, b) => out.write(r); out.write(g); out.write(b) }
    out.toByteArray
  }

  // 3x2 fixture with distinct channel structure: one white, one
  // black, one mid-grey, one pure red/green/blue pixel
  private val px6 = Seq(
    (255, 255, 255), (0, 0, 0), (128, 128, 128),
    (255, 0, 0), (0, 255, 0), (0, 0, 255))

  private def expectedF6: Seq[Double] = {
    val n = 6L
    val sr = 255L + 0 + 128 + 255 + 0 + 0
    val sg = 255L + 0 + 128 + 0 + 255 + 0
    val sb = 255L + 0 + 128 + 0 + 0 + 255
    val lumas = px6.map { case (r, g, b) => r + g + b }
    Seq(sr / (n * 255.0), sg / (n * 255.0), sb / (n * 255.0),
      (sr + sg + sb) / (n * 765.0),
      lumas.min / 765.0, lumas.max / 765.0,
      lumas.count(_ >= 383).toDouble / n, 3.0 / 2.0)
  }

  test("ImageCodec decodes a real padded bottom-up BMP to exact pixels and features") {
    val d = ImageCodec.decode(bmpBytes(3, 2, px6)).get
    assert(d.width == 3 && d.height == 2)
    assert(d.features.toSeq == expectedF6)
  }

  test("ImageCodec decodes a real PPM (comments, ascii header) to the same features") {
    val d = ImageCodec.decode(ppmBytes(3, 2, px6)).get
    assert(d.width == 3 && d.height == 2)
    assert(d.features.toSeq == expectedF6) // format-independent pixel truth
  }

  test("malformed/unknown bytes are rejected, never thrown on") {
    assert(ImageCodec.decode(Array[Byte]()).isEmpty)
    assert(ImageCodec.decode("BMnot really a bitmap".getBytes).isEmpty)
    assert(ImageCodec.decode("P6 garbage".getBytes).isEmpty)
    val truncated = bmpBytes(3, 2, px6).take(40)
    assert(ImageCodec.decode(truncated).isEmpty)
    // 8-bpp BMPs (unsupported depth) are declined, not mis-parsed
    val bad = bmpBytes(3, 2, px6); bad(28) = 8
    assert(ImageCodec.decode(bad).isEmpty)
    // PPM with maxval != 255 (legal format, different sample scale)
    // is declined rather than mis-normalized by /255
    val lowMax = ("P6\n3 2\n15\n".getBytes("US-ASCII") ++
      px6.flatMap { case (r, g, b) => Seq((r / 17).toByte, (g / 17).toByte, (b / 17).toByte) })
    assert(ImageCodec.decode(lowMax.toArray).isEmpty)
  }

  test("decodeFeatures routes real images through ImageCodec and the rest to the stub") {
    val rows = Seq(
      (10L, "image", bmpBytes(3, 2, px6)),            // real decode
      (11L, "image", "not an image".getBytes),        // image kind, stub fallback
      (12L, "audio", bmpBytes(3, 2, px6))             // audio kind: stub even for BMP bytes
    ).toDF("media_id", "kind", "payload")
    val got = Multimodal.decodeFeatures(rows).orderBy($"media_id").collect()
    assert(got(0).getAs[Int]("width") == 3 && got(0).getAs[Int]("height") == 2)
    assert(got(0).getAs[collection.Seq[Double]]("features") == expectedF6)
    assert(got(1).getAs[Int]("width") >= 64) // stub dims, schema intact
    assert(got(2).isNullAt(got(2).fieldIndex("width")) &&
      !got(2).isNullAt(got(2).fieldIndex("sample_rate")))
  }

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

  test("imageDHash: exact bits on a hand gradient; brightness-shift invariant; dup-equal") {
    // 4x1 left-to-right brightening ramp on a 2x1 grid (gw=2, gh=1):
    // samples at pxX = floor(gx*4/3) = 0,1,2 -> lums 30,60,90 ->
    // both right-brighter bits set -> hash = 0b11
    val ramp = Seq((10, 10, 10), (20, 20, 20), (30, 30, 30), (40, 40, 40))
    val shifted = ramp.map { case (r, g, b) => (r + 50, g + 50, b + 50) }
    import graft.multimodal.ImageCodec
    val (w, h, rgb) = ImageCodec.pixels(bmpBytes(4, 1, ramp)).get
    assert(ImageCodec.dHash(w, h, rgb, gw = 2, gh = 1) == 3L)
    val (_, _, rgb2) = ImageCodec.pixels(bmpBytes(4, 1, shifted)).get
    assert(ImageCodec.dHash(4, 1, rgb2, gw = 2, gh = 1) == 3L) // gradient invariance
    // the Spark plumbing: dup images hash equal, stubs and non-images drop
    val px6 = Seq((1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12), (13, 14, 15), (16, 17, 18))
    val rows = Seq(
      (1L, "image", bmpBytes(3, 2, px6)),
      (2L, "image", ppmBytes(3, 2, px6)),   // same pixels, other container
      (3L, "image", "not-an-image".getBytes),
      (4L, "audio", bmpBytes(3, 2, px6))
    ).toDF("media_id", "kind", "payload")
    val hashed = Multimodal.imageDHash(rows).as[(Long, Int, Int, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(hashed.keySet == Set(1L, 2L))
    assert(hashed(1L) == hashed(2L)) // container-independent perceptual key
  }

  test("imageNearDupPairs: a brightness-shifted copy verifies at Hamming 0; radius bound is loud") {
    val base = Seq((10, 40, 90), (120, 20, 60), (5, 150, 30), (80, 80, 80), (33, 66, 99), (140, 7, 70))
    val copy = base.map { case (r, g, b) => (r + 40, g + 40, b + 40) } // no clipping
    val other = base.map { case (r, g, b) => (255 - r, 255 - g, 255 - b) } // inverted gradient
    val media = Seq(
      (1L, "image", bmpBytes(3, 2, base)),
      (2L, "image", bmpBytes(3, 2, copy)),
      (3L, "image", bmpBytes(3, 2, other))
    ).toDF("media_id", "kind", "payload")
    val pairs = Multimodal.imageNearDupPairs(media, 0)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((1L, 2L, 0)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(intercept[IllegalArgumentException] {
      Multimodal.imageNearDupPairs(media, 4)
    }.getMessage.contains("Hamming 3"))
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
