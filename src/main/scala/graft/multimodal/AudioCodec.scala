package graft.multimodal

/** Real, dependency-free audio decoding for the one format a plain
  * JVM can parse exactly — RIFF/WAVE containing 16-bit PCM — the
  * audio twin of [[ImageCodec]]. Genuine WAV payloads take this
  * branch; everything else (compressed codecs absent from the
  * sandbox) falls back to `Multimodal.decodeStub`, preserving the
  * schema/batching contract.
  *
  * Feature contract (integer-derived so a SQL oracle replicates it
  * bit-for-bit — each feature is exact integer arithmetic followed
  * by ONE IEEE-754 double division, deterministic across engines):
  *
  *   f0 = Σ|s| / (n·32768)          mean absolute amplitude
  *   f1 = Σs² / (n·32768²)          mean power
  *   f2 = min(s) / 32768            trough
  *   f3 = max(s) / 32768            peak
  *   f4 = crossings / max(n−1, 1)   sign changes between consecutive
  *                                  samples, sign(s) := (s ≥ 0)
  *   f5 = |{s : |s| ≥ 32256}| / n   clipped fraction (≥ 0.984 FS)
  *   f6 = n / (rate·channels)       duration in seconds
  *   f7 = channels
  *
  * where s ranges over the raw interleaved sample stream and
  * n = total samples across channels. For multi-channel audio the
  * crossing count deliberately runs over the INTERLEAVED stream —
  * order-dependent but byte-deterministic, and the oracle replays
  * the identical order; per-channel features are a deinterleave
  * away if a pipeline needs them.
  *
  * Scale: identical to the image path — decode runs inside
  * `Multimodal.decodeFeatures`'s mapPartitions, payloads never leave
  * the executor, one row in → one feature row out.
  */
object AudioCodec {

  final case class DecodedAudio(sampleRate: Int, channels: Int,
                                nSamples: Int, features: Array[Double])

  /** Parse a payload that may be a PCM WAV. None = not a
    * recognized/valid 16-bit PCM RIFF/WAVE (caller falls back to the
    * stub). Never throws on malformed bytes. */
  def decode(payload: Array[Byte]): Option[DecodedAudio] =
    try {
      if (payload.length >= 12 &&
          payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F' &&
          payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E')
        decodeWav(payload)
      else None
    } catch { case _: RuntimeException => None }

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Signed 16-bit little-endian sample. */
  private def leSample(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)).toShort.toInt

  /** Chunk walk shared by the feature decode and [[samples]]:
    * (rate, channels, dataOff, nSamples), or None when not 16-bit
    * PCM. fmt must precede data per spec, but tolerate any order by
    * scanning; chunks are word-aligned (odd sizes padded). */
  private def parsePcm(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    var pos = 12
    var rate = -1; var channels = -1; var fmtOk = false
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= b.length && (dataOff < 0 || !fmtOk)) {
      val id = new String(b, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = leInt(b, pos + 4)
      if (size < 0 || pos.toLong + 8 + size > b.length) return None
      if (id == "fmt " && size >= 16) {
        val audioFormat = leShort(b, pos + 8)
        channels = leShort(b, pos + 10)
        rate = leInt(b, pos + 12)
        val bits = leShort(b, pos + 22)
        fmtOk = audioFormat == 1 && bits == 16 && channels >= 1 && rate > 0
        if (!fmtOk) return None // a WAV, but not 16-bit PCM -> stub
      } else if (id == "data") {
        dataOff = pos + 8; dataLen = size
      }
      pos += 8 + size + (size & 1)
    }
    if (!fmtOk || dataOff < 0 || dataLen < 2) return None
    Some((rate, channels, dataOff, dataLen / 2)) // trailing odd byte ignored
  }

  /** Raw interleaved signed samples of a 16-bit PCM RIFF/WAVE —
    * the sample-level entry frame analysis builds on. None = not a
    * recognized payload (caller skips or stubs). Never throws. */
  def samples(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      if (payload.length < 12 ||
          payload(0) != 'R' || payload(1) != 'I' || payload(2) != 'F' || payload(3) != 'F' ||
          payload(8) != 'W' || payload(9) != 'A' || payload(10) != 'V' || payload(11) != 'E')
        None
      else parsePcm(payload).map { case (rate, ch, off, n) =>
        val out = new Array[Int](n)
        var i = 0
        while (i < n) { out(i) = leSample(payload, off + i * 2); i += 1 }
        (rate, ch, out)
      }
    } catch { case _: RuntimeException => None }

  private def decodeWav(b: Array[Byte]): Option[DecodedAudio] = {
    val parsed = parsePcm(b)
    if (parsed.isEmpty) return None
    val (rate, channels, dataOff, n) = parsed.get
    var sabs = 0L; var ssq = 0L; var minS = Int.MaxValue; var maxS = Int.MinValue
    var clip = 0L; var crossings = 0L; var prevNonNeg = false
    var i = 0
    while (i < n) {
      val s = leSample(b, dataOff + i * 2)
      sabs += math.abs(s); ssq += s.toLong * s
      if (s < minS) minS = s
      if (s > maxS) maxS = s
      if (math.abs(s) >= 32256) clip += 1
      val nonNeg = s >= 0
      if (i > 0 && nonNeg != prevNonNeg) crossings += 1
      prevNonNeg = nonNeg
      i += 1
    }
    val nd = n.toDouble
    val features = Array(
      sabs / (nd * 32768.0),
      ssq / (nd * 32768.0 * 32768.0),
      minS / 32768.0,
      maxS / 32768.0,
      crossings.toDouble / math.max(n - 1, 1),
      clip / nd,
      nd / (rate.toLong * channels),
      channels.toDouble)
    Some(DecodedAudio(rate, channels, n, features))
  }
}
