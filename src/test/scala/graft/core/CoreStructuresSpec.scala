package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class IntVectorSpec extends AnyFunSuite {
  test("packed values round-trip across word boundaries for many widths") {
    val rnd = new Random(42)
    for (width <- Seq(1, 3, 7, 13, 17, 31, 45, 63)) {
      val n = 1000
      val expected = Array.fill(n)(math.abs(rnd.nextLong()) & Bits.lowMask(width))
      val v = new IntVector(n, width)
      expected.zipWithIndex.foreach { case (x, i) => v.setValue(i, x) }
      expected.zipWithIndex.foreach { case (x, i) => assert(v.getValue(i) == x, s"width=$width i=$i") }
    }
  }

  test("serde round-trip preserves equality and hashCode") {
    val v = new IntVector(100, 13)
    (0 until 100).foreach(i => v.setValue(i, (i * 37 % 8000).toLong))
    val bytes = Serde.writeToByteArray[IntVector]((x, o) => x.write(o), v)
    val back = Serde.readFromByteArray(IntVector.read, bytes)
    assert(back == v && back.hashCode == v.hashCode)
  }
}

class RankBitVectorSpec extends AnyFunSuite {
  test("rankOnes/rankZeroes/access match a naive bit array at several densities") {
    val rnd = new Random(42)
    for (density <- Seq(0.01, 0.5, 0.99); n <- Seq(1, 63, 64, 65, 511, 512, 513, 10000)) {
      val bits = Array.fill(n)(rnd.nextDouble() < density)
      val b = new RankBitVector.Builder(n)
      bits.zipWithIndex.foreach { case (x, i) => if (x) b.set(i) }
      val v = b.result()
      var ones = 0
      var i = 0
      while (i < n) {
        assert(v.rankOnes(i) == ones, s"rankOnes($i) density=$density n=$n")
        assert(v.rankZeroes(i) == i - ones)
        assert(v.access(i) == bits(i))
        if (bits(i)) ones += 1
        i += 1
      }
      assert(v.rankOnes(n) == ones)
    }
  }

  test("serde round-trip") {
    val b = new RankBitVector.Builder(1000)
    (0 until 1000 by 3).foreach(b.set)
    val v = b.result()
    val bytes = Serde.writeToByteArray[RankBitVector]((x, o) => x.write(o), v)
    val back = Serde.readFromByteArray(RankBitVector.read, bytes)
    assert(back == v && back.rankOnes(997) == v.rankOnes(997))
  }
}

class SuffixArraySpec extends AnyFunSuite {
  private def check(s: Array[Int], sigma: Int): Unit = {
    val got = SuffixArrays.saIs(s, sigma)
    val want = SuffixArrays.naive(s)
    assert(got.toSeq == want.toSeq, s"input=${s.mkString(",")}")
  }

  test("SA-IS matches naive oracle on random small inputs (sentinel-terminated)") {
    val rnd = new Random(42)
    for (_ <- 0 until 300) {
      val n = 1 + rnd.nextInt(40)
      val s = Array.fill(n)(1 + rnd.nextInt(4)) :+ 0
      check(s, 6)
    }
    for (_ <- 0 until 100) { // larger alphabet + longer
      val n = 50 + rnd.nextInt(300)
      val s = Array.fill(n)(1 + rnd.nextInt(60)) :+ 0
      check(s, 62)
    }
  }

  test("SA-IS handles degenerate inputs") {
    check(Array(0), 1)
    check(Array(1, 0), 2)
    check(Array(1, 1, 1, 1, 0), 2)
    check(Array(2, 1, 2, 1, 2, 1, 0), 3)
    check(Array.fill(5000)(1) :+ 0, 2) // long run
  }

  test("SuffixArraySearch count/locate match the overlap oracle on the log corpus") {
    val text = TestOracles.LogChars.take(50000)
    val search = new SuffixArraySearch(text)
    val rnd = new Random(42)
    for (_ <- 0 until 50) {
      val start = rnd.nextInt(text.length - 32)
      val pat = java.util.Arrays.copyOfRange(text, start, start + 1 + rnd.nextInt(31))
      assert(search.count(pat) == TestOracles.countOverlapping(text, pat))
      assert(search.locate(pat).toSeq == TestOracles.locateOverlapping(text, pat).toSeq)
    }
    assert(search.count("zzz-never-there".toCharArray) == 0)
  }
}

class WaveletMatrixSpec extends AnyFunSuite {
  test("rank matches naive counting for random sequences") {
    val rnd = new Random(42)
    for (sigma <- Seq(2, 3, 17, 300)) {
      val n = 2000
      val seq = Array.fill(n)(rnd.nextInt(sigma))
      val wm = WaveletMatrix(seq, sigma)
      for (_ <- 0 until 200) {
        val pos = rnd.nextInt(n + 1)
        val sym = rnd.nextInt(sigma)
        assert(wm.rank(pos, sym) == TestOracles.countPrevOccurrences(sym, seq, pos),
          s"sigma=$sigma pos=$pos sym=$sym")
      }
    }
  }

  test("inverseSelect returns (symbol, rank-before) at every position") {
    val rnd = new Random(7)
    val sigma = 50
    val seq = Array.fill(3000)(rnd.nextInt(sigma))
    val wm = WaveletMatrix(seq, sigma)
    var i = 0
    while (i < seq.length) {
      val packed = wm.inverseSelect(i)
      val sym = (packed & 0xffffL).toInt
      val rank = (packed >>> 16).toInt
      assert(sym == seq(i), s"access($i)")
      assert(rank == TestOracles.countPrevOccurrences(sym, seq, i), s"rank@$i")
      i += 1
    }
  }

  test("serde round-trip preserves answers") {
    val seq = Array.tabulate(500)(i => (i * 7) % 23)
    val wm = WaveletMatrix(seq, 23)
    val bytes = Serde.writeToByteArray[WaveletMatrix]((x, o) => x.write(o), wm)
    val back = Serde.readFromByteArray(WaveletMatrix.read, bytes)
    (0 until 500 by 17).foreach { p =>
      assert(back.rank(p, p % 23) == wm.rank(p, p % 23))
      assert(back.inverseSelect(p) == wm.inverseSelect(p))
    }
    assert(back.hashCode == wm.hashCode)
  }
}

class BwtSpec extends AnyFunSuite {
  test("Wikipedia BANANA example") {
    assert(new String(Bwt.transform("BANANA".toCharArray)) == "ANNB\u0000AA")
  }

  test("BANANA with embedded sentinel") {
    assert(new String(Bwt.transform("BANANA\u0000".toCharArray)) == "\u0000ANNB\u0000AA")
  }

  test("short string example") {
    assert(new String(Bwt.transform("the_fm_index_is_a_great_data_structure".toCharArray)) ==
      "esteamxa_tedu_nrhrd__t__fiugti_aa\u0000scrte")
  }

  test("BWT increases redundancy on natural text") {
    val t = TestOracles.LongerText
    assert(Bwt.redundancy(Bwt.transform(t)) > Bwt.redundancy(t))
  }
}
