package graft

import graft.multimodal.AudioCodec

class AudioCodecSpec extends SparkSpec {

  /** Build a canonical 16-bit PCM WAV: 44-byte header + samples. */
  private def wav(rate: Int, channels: Int, samples: Seq[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(channels.toShort); bb.putInt(rate)
    bb.putInt(rate * channels * 2); bb.putShort((channels * 2).toShort); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataLen)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  test("decodes a hand-built mono WAV to exact integer-derived features") {
    val d = AudioCodec.decode(wav(8000, 1, Seq(100, -200, 300, -32768))).get
    assert(d.sampleRate == 8000 && d.channels == 1 && d.nSamples == 4)
    val f = d.features
    assert(f(0) == (100 + 200 + 300 + 32768) / (4 * 32768.0))      // mean |s|
    assert(f(1) == (100L * 100 + 200L * 200 + 300L * 300 + 32768L * 32768) / (4 * 32768.0 * 32768.0))
    assert(f(2) == -32768 / 32768.0 && f(3) == 300 / 32768.0)      // trough/peak
    assert(f(4) == 3 / 3.0)                                        // all alternating
    assert(f(5) == 1 / 4.0)                                        // one clipped
    assert(f(6) == 4 / 8000.0 && f(7) == 1.0)
  }

  test("constant-sign signals have zero crossings; silence is all-zero features") {
    val d = AudioCodec.decode(wav(16000, 1, Seq(5, 7, 9))).get
    assert(d.features(4) == 0.0)
    val z = AudioCodec.decode(wav(16000, 1, Seq(0, 0))).get
    assert(z.features(0) == 0.0 && z.features(1) == 0.0 && z.features(4) == 0.0)
  }

  test("stereo: channels and duration account for interleaving") {
    val d = AudioCodec.decode(wav(8000, 2, Seq(1, -1, 2, -2))).get // 2 frames
    assert(d.channels == 2 && d.nSamples == 4)
    assert(d.features(6) == 4.0 / 16000)  // n/(rate*channels)
    assert(d.features(7) == 2.0)
  }

  test("chunk walk survives an extra chunk before data (e.g. LIST)") {
    val base = wav(8000, 1, Seq(10, -10))
    // splice a 6-byte LIST chunk (odd size -> padded) between fmt and data
    val bb = java.nio.ByteBuffer.allocate(base.length + 8 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(base, 0, 36)                      // through end of fmt chunk
    bb.put("LIST".getBytes); bb.putInt(5); bb.put(Array[Byte](1, 2, 3, 4, 5, 0))
    bb.put(base, 36, base.length - 36)       // data chunk
    val spliced = bb.array()
    val d = AudioCodec.decode(spliced).get
    assert(d.nSamples == 2 && d.sampleRate == 8000)
  }

  test("declines what it cannot parse exactly: non-PCM, 8-bit, truncated, non-WAV") {
    // non-PCM format code
    val f = wav(8000, 1, Seq(1, 2)); f(20) = 3 // IEEE float format
    assert(AudioCodec.decode(f).isEmpty)
    // 8-bit
    val b8 = wav(8000, 1, Seq(1, 2)); b8(34) = 8
    assert(AudioCodec.decode(b8).isEmpty)
    // data chunk claiming more bytes than present
    val tr = wav(8000, 1, Seq(1, 2, 3, 4)).dropRight(4)
    assert(AudioCodec.decode(tr).isEmpty)
    // not a RIFF at all
    assert(AudioCodec.decode("not audio".getBytes).isEmpty)
    assert(AudioCodec.decode(Array.empty[Byte]).isEmpty)
  }

  test("samples() returns the exact interleaved signed stream; declines non-PCM") {
    val got = AudioCodec.samples(wav(8000, 2, Seq(100, -200, 32767, -32768))).get
    assert(got._1 == 8000 && got._2 == 2)
    assert(got._3.toSeq == Seq(100, -200, 32767, -32768))
    assert(AudioCodec.samples("not audio".getBytes).isEmpty)
  }

  test("audioFrames: exact per-frame integer features; ragged tail dropped; stub skipped") {
    import spark.implicits._
    // 5 samples at frameLen=2 -> frames {100,-200}, {300,-400}; tail {5} dropped
    val payload = wav(8000, 1, Seq(100, -200, 300, -400, 5))
    val media = Seq(
      (1L, "audio", payload),
      (2L, "audio", "opus-encoded-bytes".getBytes), // undecodable: no frames
      (3L, "image", payload)                        // wrong kind: filtered
    ).toDF("media_id", "kind", "payload")
    val rows = graft.multimodal.Multimodal.audioFrames(media, frameLen = 2)
      .orderBy($"media_id", $"frame_idx")
      .as[(Long, Int, Int, Long, Long, Int, Int, Long)].collect().toSeq
    assert(rows == Seq(
      (1L, 0, 2, 100L * 100 + 200L * 200, 300L, 100, -200, 1L),
      (1L, 1, 2, 300L * 300 + 400L * 400, 700L, 300, -400, 1L)))
  }

  test("audioFrames crossings count only within-frame sign changes") {
    import spark.implicits._
    // alternating signs: 4 crossings in the stream, but the pair at
    // the frame boundary (idx 1->2) belongs to neither frame
    val media = Seq((1L, "audio", wav(8000, 1, Seq(1, -1, 1, -1))))
      .toDF("media_id", "kind", "payload")
    val z = graft.multimodal.Multimodal.audioFrames(media, frameLen = 2)
      .orderBy($"frame_idx").select($"crossings").as[Long].collect().toSeq
    assert(z == Seq(1L, 1L))
  }

  test("decodeFeatures routes genuine WAV audio through the real branch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val payload = wav(44100, 1, Seq(1000, -1000, 1000))
    val media = Seq((1L, "audio", payload)).toDF("media_id", "kind", "payload")
    val row = graft.multimodal.Multimodal.decodeFeatures(media).collect()(0)
    assert(row.getAs[Int]("sample_rate") == 44100)   // real rate, not md5 stub
    assert(row.isNullAt(row.fieldIndex("width")))
    val feats = row.getSeq[Double](row.fieldIndex("features"))
    assert(feats(4) == 2 / 2.0 && feats(7) == 1.0)
    // and a non-WAV audio payload still takes the md5 stub path
    val stub = Seq((2L, "audio", "opus-encoded-bytes".getBytes)).toDF("media_id", "kind", "payload")
    val srow = graft.multimodal.Multimodal.decodeFeatures(stub).collect()(0)
    assert(Seq(8000, 16000, 22050, 44100).contains(srow.getAs[Int]("sample_rate")))
  }
}
