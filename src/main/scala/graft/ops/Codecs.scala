package graft.ops

/** REAL media codecs written from scratch (no libraries exist in this sandbox):
  * RIFF/WAVE PCM-16 audio and BMP 24bpp images — both are pure byte-layout formats,
  * so a from-scratch parser is complete, not a stub. These upgrade the multimodal
  * story: `Multimodal.decodeStub` remains only for codecs that genuinely need
  * external libraries (JPEG/H.264-class entropy coding); WAV and BMP decode here are
  * the real thing, gated bit-exactly (q92/q93) via encode -> decode -> statistics
  * round-trips whose expected values the DuckDB oracle re-derives from the closed-
  * form sample/pixel formulas. Spec conformance (little-endian fields, chunk
  * walking, bottom-up padded BMP rows) is pinned separately by golden-byte tests in
  * CodecsSpec so a mirrored encode/decode bug cannot cancel out.
  */
object Codecs {

  private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
    le16(b, off, v & 0xffff); le16(b, off + 2, (v >>> 16) & 0xffff)
  }
  private def rd16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def rd32(b: Array[Byte], off: Int): Int =
    rd16(b, off) | (rd16(b, off + 2) << 16)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  // ---------------------------------------------------------------- RIFF/WAVE PCM16

  /** Canonical 44-byte-header mono PCM-16 WAV. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val b = new Array[Byte](44 + dataSize)
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    le32(b, 4, 36 + dataSize)
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
    le32(b, 16, 16) // PCM fmt chunk size
    le16(b, 20, 1) // audio format: PCM
    le16(b, 22, 1) // channels: mono
    le32(b, 24, sampleRate)
    le32(b, 28, sampleRate * 2) // byte rate
    le16(b, 32, 2) // block align
    le16(b, 34, 16) // bits per sample
    b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
    le32(b, 40, dataSize)
    var i = 0
    while (i < samples.length) { le16(b, 44 + 2 * i, samples(i) & 0xffff); i += 1 }
    b
  }

  /** Full RIFF chunk walk (handles extra chunks and odd-size padding, validates
    * PCM/mono/16-bit) — NOT a fixed-offset read, so WAVs with LIST/INFO chunks
    * between fmt and data decode correctly too.
    */
  def decodeWavPcm16(b: Array[Byte]): (Int, Array[Short]) = {
    require(b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE",
      "not a RIFF/WAVE file")
    var off = 12
    var sampleRate = -1
    var samples: Array[Short] = null
    while (off + 8 <= b.length) {
      val id = tag(b, off)
      val size = rd32(b, off + 4)
      val body = off + 8
      // long math: a hostile size near Int.MaxValue must not wrap past the guard
      require(size >= 0 && body.toLong + size <= b.length,
        s"chunk '$id' overruns the file: size=$size at offset $off")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          require(rd16(b, body) == 1, "only PCM supported")
          require(rd16(b, body + 2) == 1, "only mono supported")
          require(rd16(b, body + 14) == 16, "only 16-bit supported")
          sampleRate = rd32(b, body + 4)
        case "data" =>
          require(size % 2 == 0, "PCM16 data size must be even")
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = rd16(b, body + 2 * i).toShort; i += 1 }
        case _ => // skip unknown chunk
      }
      off = body + size + (size & 1) // RIFF pads chunks to even length
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    (sampleRate, samples)
  }

  // ------------------------------------------------------------------- BMP (24bpp)

  /** BMP row stride: 24bpp rows pad to 4-byte boundaries. */
  def bmpStride(w: Int): Int = ((w * 3 + 3) / 4) * 4

  /** Standard 54-byte-header bottom-up 24bpp BMP; `rgb(x, y)` returns packed
    * 0xRRGGBB for image coordinates with y=0 the TOP row.
    */
  def encodeBmp24(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val stride = bmpStride(w)
    val b = new Array[Byte](54 + stride * h)
    b(0) = 'B'; b(1) = 'M'
    le32(b, 2, b.length)
    le32(b, 10, 54) // pixel data offset
    le32(b, 14, 40) // BITMAPINFOHEADER size
    le32(b, 18, w)
    le32(b, 22, h) // positive height => bottom-up rows
    le16(b, 26, 1) // planes
    le16(b, 28, 24) // bpp
    le32(b, 34, stride * h) // image size (BI_RGB may be 0; set it anyway)
    var y = 0
    while (y < h) {
      val row = 54 + (h - 1 - y) * stride // bottom-up: top image row is LAST in file
      var x = 0
      while (x < w) {
        val p = rgb(x, y)
        b(row + 3 * x) = (p & 0xff).toByte // B
        b(row + 3 * x + 1) = ((p >> 8) & 0xff).toByte // G
        b(row + 3 * x + 2) = ((p >> 16) & 0xff).toByte // R
        x += 1
      }
      y += 1
    }
    b
  }

  /** Decode a 24bpp uncompressed BMP: honors the header's data offset and stride
    * padding; positive heights are bottom-up per the spec (top-down negative-height
    * images are accepted too). Returns (w, h, pixels) with pixels in row-major
    * top-down order, packed 0xRRGGBB.
    */
  def decodeBmp24(b: Array[Byte]): (Int, Int, Array[Int]) = {
    require(b.length >= 54 && b(0) == 'B' && b(1) == 'M', "not a BMP file")
    val dataOff = rd32(b, 10)
    require(rd32(b, 14) >= 40, "BITMAPINFOHEADER required")
    val w = rd32(b, 18)
    val hRaw = rd32(b, 22)
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    require(rd16(b, 28) == 24, "only 24bpp supported")
    require(rd32(b, 30) == 0, "only uncompressed BI_RGB supported")
    require(w > 0 && h > 0, s"bad dimensions ${w}x$hRaw")
    // stride and pixel count in LONG: a hostile header width near Int.MaxValue
    // must fail this guard, not wrap bmpStride/w*h and over-allocate
    val strideL = (w.toLong * 3 + 3) / 4 * 4
    require(dataOff >= 54 && dataOff.toLong + strideL * h <= b.length,
      s"pixel data overruns the file: offset=$dataOff stride=$strideL h=$h")
    val stride = strideL.toInt // bounded by b.length after the guard
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val fileRow = if (bottomUp) h - 1 - y else y
      val row = dataOff + fileRow * stride
      var x = 0
      while (x < w) {
        px(y * w + x) = ((b(row + 3 * x + 2) & 0xff) << 16) |
          ((b(row + 3 * x + 1) & 0xff) << 8) | (b(row + 3 * x) & 0xff)
        x += 1
      }
      y += 1
    }
    (w, h, px)
  }

  /** Nearest-neighbor resize (the thumbnail op): source pixel of target (tx, ty) is
    * (tx*w div tw, ty*h div th) — integer floor, matching the oracle's `div`.
    */
  def resizeNearest(px: Array[Int], w: Int, h: Int, tw: Int, th: Int): Array[Int] = {
    val out = new Array[Int](tw * th)
    var ty = 0
    while (ty < th) {
      val sy = ty * h / th
      var tx = 0
      while (tx < tw) {
        out(ty * tw + tx) = px(sy * w + tx * w / tw)
        tx += 1
      }
      ty += 1
    }
    out
  }
}
