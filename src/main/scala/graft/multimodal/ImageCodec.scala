package graft.multimodal

/** Real, dependency-free image decoding for the two formats a plain
  * JVM can parse exactly — uncompressed 24-bit BMP and binary PPM
  * (P6) — so the multimodal decode path exercises a genuine
  * bytes→pixels→features pipeline end to end (the md5 stub remains
  * the fallback for formats this sandbox has no codec for; see
  * `Multimodal.decodeStub`).
  *
  * Feature contract (deliberately integer-derived so a SQL oracle
  * can replicate it bit-for-bit: every feature is an exact integer
  * sum/count/extreme followed by ONE double division, and IEEE-754
  * division is deterministic across engines):
  *
  *   f0 = ΣR / (n·255)      f1 = ΣG / (n·255)     f2 = ΣB / (n·255)
  *   f3 = Σ(R+G+B) / (n·765)
  *   f4 = min(R+G+B) / 765  f5 = max(R+G+B) / 765
  *   f6 = |{px : R+G+B ≥ 383}| / n   (bright-pixel fraction)
  *   f7 = width / height    (aspect ratio)
  *
  * where n = width·height and sums run over all pixels. Pixel order
  * never matters (sums/extremes/counts are order-free), so the
  * decoder is free to scan rows in file order.
  *
  * Scale: decoding happens inside `Multimodal.decodeFeatures`'s
  * mapPartitions — payloads stay executor-side, one row in, one
  * feature row out, no state. A 100 TB media corpus decodes as an
  * embarrassingly parallel narrow map; `balanceBySize` handles the
  * payload-size skew.
  */
object ImageCodec {

  final case class Decoded(width: Int, height: Int, features: Array[Double])

  /** Parse a payload that may be a BMP or PPM image. None = not a
    * recognized/valid image (caller falls back to the stub). Never
    * throws on malformed bytes. */
  def decode(payload: Array[Byte]): Option[Decoded] =
    pixels(payload).map { case (w, h, rgb) => Decoded(w, h, features(w, h, rgb)) }

  /** Raw interleaved RGB samples of a decodable image — the
    * pixel-level entry perceptual hashing builds on. None = not a
    * recognized payload (caller skips or stubs). Never throws. */
  def pixels(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M') decodeBmp(payload)
      else if (payload.length >= 2 && payload(0) == 'P' && payload(1) == '6') decodePpm(payload)
      else None
    } catch { case _: RuntimeException => None }

  /** Features from raw RGB triples (the formula in the class doc). */
  private def features(w: Int, h: Int, rgb: Array[Int]): Array[Double] = {
    val n = w.toLong * h
    var sr = 0L; var sg = 0L; var sb = 0L
    var minL = Int.MaxValue; var maxL = Int.MinValue; var bright = 0L
    var i = 0
    while (i < rgb.length) {
      val r = rgb(i); val g = rgb(i + 1); val b = rgb(i + 2)
      sr += r; sg += g; sb += b
      val l = r + g + b
      if (l < minL) minL = l
      if (l > maxL) maxL = l
      if (l >= 383) bright += 1
      i += 3
    }
    Array(
      sr / (n * 255.0), sg / (n * 255.0), sb / (n * 255.0),
      (sr + sg + sb) / (n * 765.0),
      minL / 765.0, maxL / 765.0,
      bright.toDouble / n,
      w.toDouble / h)
  }

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Uncompressed 24-bpp BMP with a BITMAPINFOHEADER: rows are
    * 4-byte-padded BGR, bottom-up when height > 0, top-down when the
    * height field is negative (both legal per the format). Other
    * bit depths / compressions → None. */
  private def decodeBmp(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 54) return None
    val pixOff = leInt(b, 10)
    val hdrSize = leInt(b, 14)
    if (hdrSize < 40) return None // BITMAPCOREHEADER not supported
    val w = leInt(b, 18)
    val hRaw = leInt(b, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bpp = leShort(b, 28)
    val compression = leInt(b, 30)
    if (w <= 0 || h <= 0 || bpp != 24 || compression != 0) return None
    // bounds in Long arithmetic: for w > ~715M, `w * 3 + 3` wraps
    // negative in Int and a negative rowBytes would slip past the
    // payload-length check — safety must not depend on catching
    // runtime array exceptions downstream
    val rowBytesL = (3L * w + 3) & ~3L
    if (pixOff < 0 || pixOff.toLong + rowBytesL * h > b.length) return None
    val rowBytes = rowBytesL.toInt // <= b.length, so Int-safe
    val rgb = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      // file row y is image row (h-1-y) bottom-up; order is
      // irrelevant to the order-free features but kept correct
      val imgY = if (topDown) y else h - 1 - y
      val src = pixOff + y * rowBytes
      var x = 0
      while (x < w) {
        val o = (imgY * w + x) * 3
        rgb(o) = b(src + x * 3 + 2) & 0xff     // R (file is BGR)
        rgb(o + 1) = b(src + x * 3 + 1) & 0xff // G
        rgb(o + 2) = b(src + x * 3) & 0xff     // B
        x += 1
      }
      y += 1
    }
    Some((w, h, rgb))
  }

  /** Binary PPM (P6): ASCII header "P6 <w> <h> <maxval>" with
    * whitespace/comment handling, then raw RGB bytes. Only
    * maxval = 255 is accepted: a smaller maxval is legal PPM but its
    * samples would need 255/maxval rescaling to keep the feature
    * formula's /255 normalization format-independent — declining it
    * (stub fallback) is honest; silently treating 15-scale samples
    * as 255-scale would yield wrong intensity features. */
  private def decodePpm(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    var pos = 2
    def skipWs(): Unit = {
      var more = true
      while (more && pos < b.length) {
        val c = b(pos).toChar
        if (c == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else if (c.isWhitespace) pos += 1
        else more = false
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0; var any = false
      while (pos < b.length && (b(pos) >= '0' && b(pos) <= '9')) {
        v = v * 10 + (b(pos) - '0'); pos += 1; any = true
      }
      if (!any) -1 else v
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    if (w <= 0 || h <= 0 || maxval != 255) return None
    pos += 1 // single whitespace byte after maxval, per spec
    if (pos.toLong + 3L * w * h > b.length) return None
    val rgb = new Array[Int](w * h * 3)
    var i = 0
    while (i < rgb.length) { rgb(i) = b(pos + i) & 0xff; i += 1 }
    Some((w, h, rgb))
  }

  /** Perceptual difference hash (dHash, Krawetz 2013): sample a
    * (gw+1)×gh luminance grid by EXACT nearest-pixel pick (floor
    * scaling — no interpolation, so the hash is pure integer
    * arithmetic and replicates in any engine), then set bit
    * y·gw + x when the right sample is strictly brighter than the
    * left. Luminance = r+g+b (0..765 — no /3, stays integral).
    * Robust to uniform brightness shifts by construction (gradients
    * are shift-invariant) — the property that makes it a NEAR-dup
    * key where md5 is an exact-dup key. Default 9×7 grid = 63 bits —
    * one bit shy of the classic 8×8, keeping the hash a NON-NEGATIVE
    * long that any engine's signed shift can build (1<<63 overflows
    * checked-arithmetic engines). */
  def dHash(w: Int, h: Int, rgb: Array[Int], gw: Int = 9, gh: Int = 7): Long = {
    require(gw >= 1 && gh >= 1 && gw.toLong * gh <= 63, s"grid $gw x $gh must fit 63 bits")
    def lum(gx: Int, gy: Int): Int = {
      // nearest sample of the (gw+1) x gh grid over the w x h image
      val pxX = (gx.toLong * w / (gw + 1)).toInt
      val pxY = (gy.toLong * h / gh).toInt
      val o = (pxY * w + pxX) * 3
      rgb(o) + rgb(o + 1) + rgb(o + 2)
    }
    var bits = 0L
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw) {
        if (lum(gx + 1, gy) > lum(gx, gy)) bits |= 1L << (gy * gw + gx)
        gx += 1
      }
      gy += 1
    }
    bits
  }
}
