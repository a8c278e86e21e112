package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import TestOracles._

/** Fixed-block-boosting wavelet: differential tests against a naive counter and the
  * Huffman wavelet tree, across block/superblock boundaries, plus serde and size checks.
  */
class WaveletFbbSpec extends AnyFunSuite {

  private def naiveRank(seq: Array[Int], pos: Int, sym: Int): Int = {
    var n = 0
    var i = 0
    while (i < pos) { if (seq(i) == sym) n += 1; i += 1 }
    n
  }

  private def checkAll(seq: Array[Int], sigma: Int, fbb: WaveletFbb, probes: Int, rnd: Random): Unit = {
    assert(fbb.length == seq.length && fbb.sigma == sigma)
    for (_ <- 0 until probes) {
      val pos = rnd.nextInt(seq.length + 1)
      val sym = rnd.nextInt(sigma)
      assert(fbb.rank(pos, sym) == naiveRank(seq, pos, sym), s"rank($pos, $sym)")
    }
    for (_ <- 0 until probes) {
      val pos = rnd.nextInt(seq.length)
      val packed = fbb.inverseSelect(pos)
      val sym = (packed & 0xffffL).toInt
      val rankBefore = (packed >>> 16).toInt
      assert(sym == seq(pos), s"inverseSelect($pos) symbol")
      assert(rankBefore == naiveRank(seq, pos, sym), s"inverseSelect($pos) rank")
    }
  }

  test("rank/inverseSelect match naive counting on skewed data across superblocks") {
    val rnd = new Random(11)
    val sigma = 40
    // > 2 superblocks, skewed zipf-ish distribution with local regime shifts
    val n = 150000
    val seq = Array.tabulate(n) { i =>
      val regime = (i / 9000) % 3
      val r = rnd.nextInt(100)
      if (r < 60) regime * 3 + rnd.nextInt(3)
      else if (r < 90) 10 + rnd.nextInt(10)
      else 20 + rnd.nextInt(sigma - 20)
    }
    checkAll(seq, sigma, WaveletFbb(seq, sigma), probes = 600, rnd = rnd)
  }

  test("agrees with HuffmanWaveletTree everywhere on random input (incl. absent symbols)") {
    val rnd = new Random(5)
    val sigma = 97
    val n = 70001 // crosses one superblock boundary, partial last block
    val seq = Array.fill(n)(rnd.nextInt(sigma - 5)) // symbols sigma-5..sigma-1 ABSENT
    val fbb = WaveletFbb(seq, sigma)
    val hwt = HuffmanWaveletTree(seq, sigma)
    for (_ <- 0 until 500) {
      val pos = rnd.nextInt(n + 1)
      val sym = rnd.nextInt(sigma)
      assert(fbb.rank(pos, sym) == hwt.rank(pos, sym), s"rank($pos, $sym)")
    }
    for (_ <- 0 until 500) {
      val pos = rnd.nextInt(n)
      assert(fbb.inverseSelect(pos) == hwt.inverseSelect(pos), s"inverseSelect($pos)")
    }
  }

  test("block boundaries, superblock boundaries and corpus ends are exact") {
    val rnd = new Random(3)
    val sigma = 8
    val n = (1 << 16) + (1 << 12) + 77 // one full superblock + partial + ragged tail
    val seq = Array.fill(n)(rnd.nextInt(sigma))
    val fbb = WaveletFbb(seq, sigma)
    val interesting = Seq(0, 1, 511, 512, 513, 4095, 4096, 4097,
      (1 << 16) - 1, 1 << 16, (1 << 16) + 1, n - 1, n)
    for (pos <- interesting; sym <- 0 until sigma)
      assert(fbb.rank(pos, sym) == naiveRank(seq, pos, sym), s"rank($pos, $sym)")
    for (pos <- interesting.filter(_ < n)) {
      val packed = fbb.inverseSelect(pos)
      assert((packed & 0xffffL).toInt == seq(pos))
    }
  }

  test("single-run blocks and single-symbol corpus fast paths") {
    // long runs make many single-symbol blocks (zero payload bits)
    val seq = Array.tabulate(30000)(i => (i / 5000) % 3)
    val fbb = WaveletFbb(seq, 3)
    val rnd = new Random(9)
    checkAll(seq, 3, fbb, probes = 300, rnd = rnd)

    val solo = Array.fill(5000)(0)
    checkAll(solo, 1, WaveletFbb(solo, 1), probes = 50, rnd = rnd)
  }

  test("serde round-trips (plain and RRR-compressed) and preserves hashCode") {
    val rnd = new Random(21)
    val sigma = 30
    val seq = Array.fill(90000)(if (rnd.nextInt(10) < 7) rnd.nextInt(4) else rnd.nextInt(sigma))
    for (compress <- Seq(false, true)) {
      val fbb = WaveletFbb(seq, sigma, compress)
      val bytes = Serde.writeToByteArray[WaveletFbb]((v, o) => v.write(o), fbb)
      val back = Serde.readFromByteArray(WaveletFbb.read, bytes)
      assert(back.hashCode == fbb.hashCode)
      for (_ <- 0 until 200) {
        val pos = rnd.nextInt(seq.length + 1)
        val sym = rnd.nextInt(sigma)
        assert(back.rank(pos, sym) == fbb.rank(pos, sym))
      }
      for (_ <- 0 until 200) {
        val pos = rnd.nextInt(seq.length)
        assert(back.inverseSelect(pos) == fbb.inverseSelect(pos))
      }
    }
  }

  test("FM-Index with the FBB engine answers like the Huffman engine, smaller on log text") {
    val fmH = new FmIndexBuilder().setSampleRate(8).build(LogChars)
    val fmF = new FmIndexBuilder().setSampleRate(8)
      .setWaveletEngine(FmIndex.Fbb).setCompression(true).build(LogChars)
    val rnd = new Random(17)
    for (_ <- 0 until 80) {
      val start = rnd.nextInt(LogCorpus.length - 32)
      val pat = LogCorpus.substring(start, start + 1 + rnd.nextInt(31)).toCharArray
      assert(fmF.count(pat) == fmH.count(pat), s"pat='${new String(pat)}'")
      assert(fmF.locateAll(pat).toSeq == fmH.locateAll(pat).toSeq)
    }
    val a = rnd.nextInt(LogCorpus.length - 80)
    assert(fmF.extractString(a, a + 80) == fmH.extractString(a, a + 80))
    val back = FmIndex.deserialize(fmF.serialize())
    assert(back.hashCode == fmF.hashCode)
    assert(back.count("block".toCharArray) == fmH.count("block".toCharArray))
    val hB = fmH.serialize().length
    val fB = fmF.serialize().length
    info(f"serialized bytes: huffman-rank9=$hB fbb-rrr=$fB (${100.0 * fB / hB}%.1f%%)")
  }

  test("block-size boosting picks smaller blocks for locally-skewed text") {
    // regime-switching text: each 512-symbol stretch uses a different tiny alphabet
    val rnd = new Random(33)
    val seq = Array.tabulate(1 << 16) { i =>
      val base = ((i / 512) % 16) * 4
      base + rnd.nextInt(4)
    }
    val local = WaveletFbb(seq, 64)
    // globally-uniform text with the same alphabet
    val uniform = Array.fill(1 << 16)(rnd.nextInt(64))
    val flat = WaveletFbb(uniform, 64)
    info(s"locally-skewed bytes=${local.sizeInBytes} uniform bytes=${flat.sizeInBytes}")
    // the boosted encoding of regime text must be much smaller than of uniform text
    assert(local.sizeInBytes.toDouble < flat.sizeInBytes * 0.55,
      s"boosting failed: local=${local.sizeInBytes} uniform=${flat.sizeInBytes}")
  }
}
