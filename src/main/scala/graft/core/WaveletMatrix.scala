package graft.core

import java.io.{DataInput, DataOutput}

/** Wavelet matrix over an integer sequence: rank(pos, sym) and inverseSelect(pos).
  *
  * Same query contract as the reference's Huffman-shaped fixed-block-boosting wavelet tree
  * (/root/reference/indices/src/main/java/com/dynatrace/wavelet/WaveletFixedBlockBoosting.java:1010,1305)
  * but a structurally different design: a wavelet *matrix* (Claude, Navarro, Ordonez:
  * "The Wavelet Matrix: An Efficient Wavelet Tree for Large Alphabets", SPIRE 2012) with
  * ceil(log2 sigma) levels of plain rank bitvectors and a precomputed per-symbol block-start
  * table, so `inverseSelect` returns symbol AND rank in a single descent.
  */
final class WaveletMatrix private (
    val length: Int,
    val numLevels: Int,
    private val levels: Array[RankBitVector],
    private val zeros: Array[Int],
    private val symStart: Array[Int]
) extends SymbolRankSeq {

  def sigma: Int = symStart.length

  /** Number of occurrences of `sym` in [0, pos). */
  def rank(pos: Int, sym: Int): Int = {
    if (sym < 0 || sym >= symStart.length) return 0
    var p = pos
    var l = 0
    while (l < numLevels) {
      val bit = (sym >>> (numLevels - 1 - l)) & 1
      val lv = levels(l)
      p = if (bit == 0) lv.rankZeroes(p) else zeros(l) + lv.rankOnes(p)
      l += 1
    }
    p - symStart(sym)
  }

  /** Symbol at `pos` together with rank(pos, symbol), packed as (rank << 16) | symbol.
    * One descent instead of the reference's separate access + rank.
    */
  def inverseSelect(pos: Int): Long = {
    var p = pos
    var sym = 0
    var l = 0
    while (l < numLevels) {
      val lv = levels(l)
      if (lv.access(p)) {
        sym = (sym << 1) | 1
        p = zeros(l) + lv.rankOnes(p)
      } else {
        sym = sym << 1
        p = lv.rankZeroes(p)
      }
      l += 1
    }
    ((p - symStart(sym)).toLong << 16) | sym
  }

  def sizeInBytes: Long = levels.map(_.sizeInBytes).sum + 4L * symStart.length + 4L * zeros.length

  def write(out: DataOutput): Unit = {
    out.writeInt(length)
    out.writeInt(numLevels)
    out.writeInt(symStart.length)
    var l = 0
    while (l < numLevels) { levels(l).write(out); out.writeInt(zeros(l)); l += 1 }
  }

  override def hashCode: Int = {
    var h = length + 31 * numLevels
    var l = 0
    while (l < numLevels) { h = h * 31 + levels(l).hashCode; l += 1 }
    h
  }
}

object WaveletMatrix {

  /** Build over `seq` whose values lie in [0, sigma). */
  def apply(seq: Array[Int], sigma: Int): WaveletMatrix = {
    val n = seq.length
    val numLevels = math.max(1, Bits.minBits(math.max(0, sigma - 1).toLong))
    val levels = new Array[RankBitVector](numLevels)
    val zeros = new Array[Int](numLevels)
    var cur = seq.clone()
    var next = new Array[Int](n)
    var l = 0
    while (l < numLevels) {
      val shift = numLevels - 1 - l
      val b = new RankBitVector.Builder(n)
      var nZeros = 0
      var i = 0
      while (i < n) {
        if (((cur(i) >>> shift) & 1) != 0) b.set(i) else nZeros += 1
        i += 1
      }
      levels(l) = b.result()
      zeros(l) = nZeros
      // stable partition by the current bit for the next level
      var z = 0
      var o = nZeros
      i = 0
      while (i < n) {
        val v = cur(i)
        if (((v >>> shift) & 1) == 0) { next(z) = v; z += 1 }
        else { next(o) = v; o += 1 }
        i += 1
      }
      val t = cur; cur = next; next = t
      l += 1
    }
    finish(n, numLevels, levels, zeros, sigma)
  }

  private def finish(
      n: Int,
      numLevels: Int,
      levels: Array[RankBitVector],
      zeros: Array[Int],
      sigma: Int
  ): WaveletMatrix = {
    // precompute each symbol's block start at the bottom level: descend position 0
    // along the symbol's bit path (standard wavelet-matrix rank identity).
    val symStart = new Array[Int](sigma)
    var sym = 0
    while (sym < sigma) {
      var p = 0
      var l = 0
      while (l < numLevels) {
        val bit = (sym >>> (numLevels - 1 - l)) & 1
        val lv = levels(l)
        p = if (bit == 0) lv.rankZeroes(p) else zeros(l) + lv.rankOnes(p)
        l += 1
      }
      symStart(sym) = p
      sym += 1
    }
    new WaveletMatrix(n, numLevels, levels, zeros, symStart)
  }

  def read(in: DataInput): WaveletMatrix = {
    val length = in.readInt()
    val numLevels = in.readInt()
    val sigma = in.readInt()
    val levels = new Array[RankBitVector](numLevels)
    val zeros = new Array[Int](numLevels)
    var l = 0
    while (l < numLevels) {
      levels(l) = RankBitVector.read(in)
      zeros(l) = in.readInt()
      l += 1
    }
    finish(length, numLevels, levels, zeros, sigma)
  }
}
