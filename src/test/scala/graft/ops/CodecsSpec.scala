package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Golden-BYTE conformance for the from-scratch WAV/BMP codecs: hand-constructed
  * spec-conformant files decode to known values, so a mirrored encode/decode bug
  * (e.g. both sides writing and reading top-down rows) cannot cancel out the way it
  * could in the q92/q93 round-trip gates alone.
  */
class CodecsSpec extends AnyFunSuite {

  private def le16(v: Int): Seq[Byte] = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Seq[Byte] = le16(v & 0xffff) ++ le16((v >>> 16) & 0xffff)
  private def ascii(s: String): Seq[Byte] = s.getBytes("US-ASCII").toSeq

  test("WAV golden bytes: hand-built spec-conformant PCM16 file decodes exactly") {
    // RIFF("WAVE" fmt(PCM, mono, 8000 Hz, 16-bit) data[0, 1000, -1000])
    val samples = Seq(0, 1000, -1000)
    val data = samples.flatMap(v => le16(v & 0xffff))
    val bytes = (ascii("RIFF") ++ le32(36 + data.length) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16) ++
      ascii("data") ++ le32(data.length) ++ data).toArray
    val (rate, dec) = Codecs.decodeWavPcm16(bytes)
    assert(rate == 8000)
    assert(dec.toSeq == Seq[Short](0, 1000, -1000))
  }

  test("WAV chunk walk: an odd-sized LIST chunk between fmt and data is skipped with padding") {
    val data = Seq(42, -7).flatMap(v => le16(v & 0xffff))
    val junk = ascii("LIST") ++ le32(3) ++ Seq[Byte](1, 2, 3, 0) // 3 bytes + pad to even
    val bytes = (ascii("RIFF") ++ le32(36 + 8 + 4 + data.length) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(44100) ++
      le32(88200) ++ le16(2) ++ le16(16) ++
      junk ++
      ascii("data") ++ le32(data.length) ++ data).toArray
    val (rate, dec) = Codecs.decodeWavPcm16(bytes)
    assert(rate == 44100)
    assert(dec.toSeq == Seq[Short](42, -7))
  }

  test("WAV round-trip: encode(decode) is the identity on samples and rate") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 1, 63, 500)) {
      val samples = Array.fill(n)(rnd.nextInt(65536).toShort)
      val (rate, dec) = Codecs.decodeWavPcm16(Codecs.encodeWavPcm16(22050, samples))
      assert(rate == 22050)
      assert(dec.toSeq == samples.toSeq)
    }
  }

  test("BMP golden bytes: hand-built bottom-up padded 2x2 file decodes to the right corners") {
    // image rows (top-down): [(RED, GREEN), (BLUE, WHITE)]; the FILE stores the
    // bottom row first (positive height), each row BGR padded to 8 bytes
    val stride = 8
    val fileRows = Seq(
      Seq[Byte](-1, 0, 0, /*BLUE*/ -1, -1, -1, /*WHITE*/ 0, 0), // bottom image row
      Seq[Byte](0, 0, -1, /*RED*/ 0, -1, 0, /*GREEN*/ 0, 0)) // top image row
    val bytes = (ascii("BM") ++ le32(54 + stride * 2) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(stride * 2) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++
      fileRows.flatten).toArray
    val (w, h, px) = Codecs.decodeBmp24(bytes)
    assert((w, h) == (2, 2))
    assert(px.toSeq == Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff))
  }

  test("BMP top-down (negative height) decodes without the row flip") {
    val stride = 8
    val fileRows = Seq(
      Seq[Byte](0, 0, -1, 0, -1, 0, 0, 0), // first file row IS the top image row
      Seq[Byte](-1, 0, 0, -1, -1, -1, 0, 0))
    val bytes = (ascii("BM") ++ le32(54 + stride * 2) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ le32(-2) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(stride * 2) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++
      fileRows.flatten).toArray
    val (w, h, px) = Codecs.decodeBmp24(bytes)
    assert((w, h) == (2, 2))
    assert(px.toSeq == Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff))
  }

  test("BMP round-trip at widths that exercise every stride padding remainder") {
    for (w <- 1 to 8; h <- Seq(1, 3)) {
      def rgb(x: Int, y: Int): Int = ((x * 37 + y * 11) % 256 << 16) |
        ((x * 5 + y * 3) % 256 << 8) | ((x + y * 7) % 256)
      val (w2, h2, px) = Codecs.decodeBmp24(Codecs.encodeBmp24(w, h, rgb))
      assert((w2, h2) == (w, h))
      for (y <- 0 until h; x <- 0 until w)
        assert(px(y * w + x) == rgb(x, y), s"pixel ($x,$y) at w=$w h=$h")
    }
  }

  test("nearest-neighbor resize: identity at 1:1, uniform stays uniform, floor sampling") {
    val px = Array.tabulate(6 * 4)(i => i)
    assert(Codecs.resizeNearest(px, 6, 4, 6, 4).toSeq == px.toSeq)
    val uni = Array.fill(5 * 5)(0xabcdef)
    assert(Codecs.resizeNearest(uni, 5, 5, 2, 2).forall(_ == 0xabcdef))
    // 4x2 -> 2x1: targets sample (0*4/2, 0*2/1)=(0,0) and (1*4/2, 0)=(2,0)
    val g = Array.tabulate(4 * 2)(i => i * 10)
    assert(Codecs.resizeNearest(g, 4, 2, 2, 1).toSeq == Seq(0, 20))
  }
}
