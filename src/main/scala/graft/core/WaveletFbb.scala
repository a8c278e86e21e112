package graft.core

import java.io.{DataInput, DataOutput}
import scala.collection.mutable

/** Fixed-block-boosting wavelet sequence: the entropy-adaptive rank engine.
  *
  * Same rank/inverseSelect contract as the reference's Huffman-shaped fixed-block
  * boosting wavelet (/root/reference/indices/src/main/java/com/dynatrace/wavelet/
  * WaveletFixedBlockBoosting.java:1010,1305 — itself derived from Karkkainen-Puglisi
  * "Fixed Block Compression Boosting"), with a fresh layout:
  *
  *  - the sequence splits into SUPERBLOCKS (2^16 symbols). Each superblock picks its own
  *    BLOCK size from {512..4096} by an exact cost search: per-block canonical-Huffman
  *    payload bits plus the block's header bytes — small blocks win on locally-skewed
  *    text, large blocks win on uniform text (the "boosting").
  *  - each block encodes its symbols as a block-local canonical-Huffman-shaped wavelet
  *    tree; all node bit-slices of all blocks in a superblock share ONE rank bitvector
  *    (optionally RRR-compressed), so in-node rank is two O(1) rank calls.
  *  - cross-block symbol ranks come from sparse CHECKPOINTS: per superblock and per
  *    present symbol, (blockId, countThroughBlock) pairs only where the symbol occurs
  *    (binary-searched); the same scheme once more at superblock granularity. Absent
  *    symbols therefore cost one failed binary search (the reference's absent-symbol
  *    fast path); single-symbol blocks emit zero payload bits (its single-run fast path).
  *
  * Build is deterministic (heap ties broken by symbol id; canonical codes by (len, sym)).
  */
final class WaveletFbb private (
    val length: Int,
    val sigma: Int,
    private val sbSizeLog: Int,
    // global per-symbol superblock checkpoints: count of sym through superblock id
    private val gSymStart: Array[Int], // sigma+1
    private val gCkId: Array[Int],
    private val gCkCum: Array[Int],
    private val sbs: Array[WaveletFbb.SuperBlock]
) extends SymbolRankSeq {
  import WaveletFbb._

  /** count of `sym` in [0, pos). */
  def rank(pos: Int, sym: Int): Int = {
    if (pos <= 0 || sym < 0 || sym >= sigma) return 0
    val p = math.min(pos, length)
    val sb = p >>> sbSizeLog
    val within = p - (sb << sbSizeLog)
    val prefix = ckLookup(gCkId, gCkCum, gSymStart(sym), gSymStart(sym + 1), sb - 1)
    if (within == 0 || sb >= sbs.length) prefix
    else prefix + sbs(sb).rankLocal(within, sym)
  }

  /** (rankBefore << 16) | symbol of the symbol at `pos`. */
  def inverseSelect(pos: Int): Long = {
    val sb = pos >>> sbSizeLog
    val within = pos - (sb << sbSizeLog)
    val (sym, inSbRank) = sbs(sb).inverseSelectLocal(within)
    val prefix = ckLookup(gCkId, gCkCum, gSymStart(sym), gSymStart(sym + 1), sb - 1)
    ((prefix + inSbRank).toLong << 16) | sym.toLong
  }

  def sizeInBytes: Long =
    16L + 4L * (gSymStart.length + gCkId.length + gCkCum.length) + sbs.map(_.sizeInBytes).sum

  def write(out: DataOutput): Unit = {
    out.writeInt(length)
    out.writeInt(sigma)
    out.writeInt(sbSizeLog)
    writeIntArray(out, gSymStart)
    writeIntArray(out, gCkId)
    writeIntArray(out, gCkCum)
    out.writeInt(sbs.length)
    sbs.foreach(_.write(out))
  }

  override def hashCode: Int = {
    var h = length * 31 + sigma
    h = h * 31 + java.util.Arrays.hashCode(gCkCum)
    sbs.foreach(s => h = h * 31 + s.hash)
    h
  }
}

object WaveletFbb {

  val SuperBlockSizeLog = 16
  private val BlockSizeLogCandidates = Array(9, 10, 11, 12)

  /** Largest checkpoint cum with id <= maxId in [from, until); 0 when none. */
  private def ckLookup(ids: Array[Int], cums: Array[Int], from: Int, until: Int, maxId: Int): Int = {
    var lo = from
    var hi = until // first index with id > maxId
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ids(mid) <= maxId) lo = mid + 1 else hi = mid
    }
    if (lo == from) 0 else cums(lo - 1)
  }

  private def writeIntArray(out: DataOutput, a: Array[Int]): Unit = {
    out.writeInt(a.length)
    var i = 0
    while (i < a.length) { out.writeInt(a(i)); i += 1 }
  }

  private def readIntArray(in: DataInput): Array[Int] = {
    val a = new Array[Int](in.readInt())
    var i = 0
    while (i < a.length) { a(i) = in.readInt(); i += 1 }
    a
  }

  /** One superblock: chosen block size, shared node bit stream, per-block local
    * alphabets + canonical code lengths (codes and trees are DERIVED, not stored),
    * per-block node bit-lengths, and sparse per-symbol block checkpoints.
    */
  private[core] final class SuperBlock(
      val sbLen: Int,
      val blockSizeLog: Int,
      val bits: BitRankSeq,
      val blockSymStart: Array[Int], // numBlocks+1 -> into syms/codeLens
      val syms: Array[Int], // global symbol ids, sorted per block
      val codeLens: Array[Byte],
      val nodeLens: Array[Int], // per block: localSigma-1 node bit lengths, block-major
      val ckSymStart: Array[Int], // per DISTINCT present symbol (sorted) -> ckId/ckCum
      val ckSyms: Array[Int],
      val ckId: Array[Int],
      val ckCum: Array[Int]
  ) {
    private val numBlocks = blockSymStart.length - 1

    // derived (rebuilt on read): canonical codes, per-block trees, node offsets
    private val codes = new Array[Long](syms.length)
    private val blockNodeStart = new Array[Int](numBlocks + 1) // into nodeLeft/Right/Off
    private var nodeLeft: Array[Int] = _
    private var nodeRight: Array[Int] = _
    private var nodeOff: Array[Int] = _ // absolute bit offset of each node slice

    locally {
      var totalNodes = 0
      var b = 0
      while (b < numBlocks) {
        blockNodeStart(b) = totalNodes
        totalNodes += math.max(blockSymStart(b + 1) - blockSymStart(b) - 1, 0)
        b += 1
      }
      blockNodeStart(numBlocks) = totalNodes
      nodeLeft = new Array[Int](totalNodes)
      nodeRight = new Array[Int](totalNodes)
      nodeOff = new Array[Int](totalNodes)
      var bitCursor = 0
      b = 0
      while (b < numBlocks) {
        val symFrom = blockSymStart(b)
        val symTo = blockSymStart(b + 1)
        val ns = blockNodeStart(b)
        assignCanonicalCodes(codeLens, symFrom, symTo, codes)
        // trie over canonical codes; node 0 (relative) is the block root
        var nextNode = 0
        java.util.Arrays.fill(nodeLeft, ns, blockNodeStart(b + 1), 0)
        var s = symFrom
        while (s < symTo) {
          if (symTo - symFrom > 1) {
            var node = 0
            var l = codeLens(s) - 1
            while (l >= 0) {
              val bit = (codes(s) >>> l) & 1L
              if (l == 0) {
                if (bit == 0L) nodeLeft(ns + node) = -(s - symFrom) - 1
                else nodeRight(ns + node) = -(s - symFrom) - 1
              } else {
                val slot = if (bit == 0L) nodeLeft(ns + node) else nodeRight(ns + node)
                val child = if (slot > 0) slot else { nextNode += 1; nextNode }
                if (bit == 0L) nodeLeft(ns + node) = child else nodeRight(ns + node) = child
                node = child
              }
              l -= 1
            }
          }
          s += 1
        }
        // node offsets: sequential slices in node-id order
        var k = ns
        while (k < blockNodeStart(b + 1)) {
          nodeOff(k) = bitCursor
          bitCursor += nodeLens(k)
          k += 1
        }
        b += 1
      }
    }

    /** rank of `sym` in the first `within` symbols of this superblock. */
    def rankLocal(within: Int, sym: Int): Int = {
      val bSize = 1 << blockSizeLog
      val blk = math.min((within - 1) >>> blockSizeLog, numBlocks - 1)
      val inBlk = within - (blk << blockSizeLog)
      // checkpoint prefix over complete blocks [0, blk)
      val ci = java.util.Arrays.binarySearch(ckSyms, sym)
      if (ci < 0) return 0 // absent-symbol fast path: sym never occurs in this superblock
      val prefix = ckLookup(ckId, ckCum, ckSymStart(ci), ckSymStart(ci + 1), blk - 1)
      if (inBlk == 0) return prefix
      // in-block: binary search sym in the block alphabet, descend its code path
      val symFrom = blockSymStart(blk)
      val symTo = blockSymStart(blk + 1)
      var si = java.util.Arrays.binarySearch(syms, symFrom, symTo, sym)
      if (si < 0) return prefix // absent from THIS block
      if (symTo - symFrom == 1) return prefix + math.min(inBlk, blockLen(blk)) // single-run block
      var p = math.min(inBlk, blockLen(blk))
      val ns = blockNodeStart(blk)
      var node = 0
      var l = codeLens(si) - 1
      val code = codes(si)
      while (l >= 0) {
        val off = nodeOff(ns + node)
        val onesBefore = bits.rankOnes(off + p) - bits.rankOnes(off)
        val next =
          if (((code >>> l) & 1L) == 0L) { p = p - onesBefore; nodeLeft(ns + node) }
          else { p = onesBefore; nodeRight(ns + node) }
        if (next < 0) return prefix + p
        node = next
        l -= 1
      }
      prefix + p
    }

    /** (globalSym, rank-of-that-sym before pos within this superblock). */
    def inverseSelectLocal(pos: Int): (Int, Int) = {
      val blk = pos >>> blockSizeLog
      var p = pos - (blk << blockSizeLog)
      val symFrom = blockSymStart(blk)
      val symTo = blockSymStart(blk + 1)
      var si = symFrom
      if (symTo - symFrom > 1) {
        val ns = blockNodeStart(blk)
        var node = 0
        var done = false
        while (!done) {
          val off = nodeOff(ns + node)
          val onesBefore = bits.rankOnes(off + p) - bits.rankOnes(off)
          val next =
            if (bits.access(off + p)) { p = onesBefore; nodeRight(ns + node) }
            else { p = p - onesBefore; nodeLeft(ns + node) }
          if (next < 0) { si = symFrom + (-next - 1); done = true }
          else node = next
        }
      }
      val sym = syms(si)
      val ci = java.util.Arrays.binarySearch(ckSyms, sym)
      val prefix = ckLookup(ckId, ckCum, ckSymStart(ci), ckSymStart(ci + 1), blk - 1)
      (sym, prefix + p)
    }

    private def blockLen(b: Int): Int =
      math.min(1 << blockSizeLog, sbLen - (b << blockSizeLog))

    def sizeInBytes: Long =
      bits.sizeInBytes + 4L * (blockSymStart.length + nodeLens.length + ckSymStart.length +
        ckSyms.length + ckId.length + ckCum.length) + 5L * syms.length + 16

    def hash: Int = {
      var h = sbLen * 31 + blockSizeLog
      h = h * 31 + java.util.Arrays.hashCode(syms)
      h = h * 31 + java.util.Arrays.hashCode(ckCum)
      h * 31 + bits.rankOnes(bitsLen)
    }

    private def bitsLen: Int = bits.numBits

    def write(out: DataOutput): Unit = {
      out.writeInt(sbLen)
      out.writeInt(blockSizeLog)
      BitSeqSerde.write(out, bits)
      writeIntArray(out, blockSymStart)
      out.writeInt(syms.length)
      var i = 0
      while (i < syms.length) { out.writeShort(syms(i)); out.writeByte(codeLens(i).toInt); i += 1 }
      writeIntArray(out, nodeLens)
      writeIntArray(out, ckSymStart)
      writeIntArray(out, ckSyms)
      writeIntArray(out, ckId)
      writeIntArray(out, ckCum)
    }
  }

  private def readSuperBlock(in: DataInput): SuperBlock = {
    val sbLen = in.readInt()
    val blockSizeLog = in.readInt()
    val bits = BitSeqSerde.read(in)
    val blockSymStart = readIntArray(in)
    val nSyms = in.readInt()
    val syms = new Array[Int](nSyms)
    val codeLens = new Array[Byte](nSyms)
    var i = 0
    while (i < nSyms) { syms(i) = in.readShort().toInt; codeLens(i) = in.readByte(); i += 1 }
    new SuperBlock(sbLen, blockSizeLog, bits, blockSymStart, syms, codeLens,
      readIntArray(in), readIntArray(in), readIntArray(in), readIntArray(in), readIntArray(in))
  }

  /** Deterministic Huffman code LENGTHS for `freq` (index = local sym). */
  private def huffmanLengths(freq: Array[Long], n: Int): Array[Byte] = {
    val lens = new Array[Byte](n)
    if (n == 1) return lens // single symbol: zero-length code
    implicit val ord: Ordering[(Long, Int)] = Ordering.Tuple2(Ordering.Long.reverse, Ordering.Int.reverse)
    val heap = mutable.PriorityQueue[(Long, Int)]()
    val left = new Array[Int](n - 1)
    val right = new Array[Int](n - 1)
    var i = 0
    while (i < n) { heap.enqueue((freq(i), -i - 1)); i += 1 }
    var next = 0
    while (heap.size > 1) {
      val (f1, a) = heap.dequeue()
      val (f2, b) = heap.dequeue()
      left(next) = a; right(next) = b
      heap.enqueue((f1 + f2, next))
      next += 1
    }
    val root = heap.dequeue()._2
    def depth(node: Int, d: Int): Unit =
      if (node < 0) lens(-node - 1) = d.toByte
      else { depth(left(node), d + 1); depth(right(node), d + 1) }
    depth(root, 0)
    lens
  }

  /** Canonical code assignment over syms[from,until): sorted by (len, sym-order);
    * `syms` slice is already sorted by symbol id.
    */
  private def assignCanonicalCodes(codeLens: Array[Byte], from: Int, until: Int, codes: Array[Long]): Unit = {
    val idx = (from until until).sortBy(i => (codeLens(i), i))
    var code = 0L
    var prevLen = 0
    idx.foreach { i =>
      val len = codeLens(i)
      code = code << (len - prevLen)
      codes(i) = code
      code += 1
      prevLen = len
    }
  }

  /** Builds over `seq` with values in [0, sigma). `compress` stores each superblock's
    * bit stream RRR-compressed.
    */
  def apply(seq: Array[Int], sigma: Int, compress: Boolean = false): WaveletFbb = {
    val n = seq.length
    val sbSize = 1 << SuperBlockSizeLog
    val numSb = math.max((n + sbSize - 1) >>> SuperBlockSizeLog, 1)

    // global superblock checkpoints
    val gCkIdB = Array.fill(sigma)(new mutable.ArrayBuffer[Int]())
    val gCkCumB = Array.fill(sigma)(new mutable.ArrayBuffer[Int]())
    val gTotal = new Array[Int](sigma)

    val sbs = new Array[SuperBlock](numSb)
    val sbFreq = new Array[Int](sigma) // reused scratch
    var sb = 0
    while (sb < numSb) {
      val sbFrom = sb << SuperBlockSizeLog
      val sbTo = math.min(sbFrom + sbSize, n)
      val sbLen = math.max(sbTo - sbFrom, 0)
      sbs(sb) = buildSuperBlock(seq, sbFrom, sbLen, compress, sbFreq)
      // update global checkpoints for symbols present in this superblock
      var i = sbFrom
      while (i < sbTo) { sbFreq(seq(i)) += 1; i += 1 }
      i = sbFrom
      while (i < sbTo) {
        val s = seq(i)
        if (sbFreq(s) > 0) {
          gTotal(s) += sbFreq(s)
          gCkIdB(s) += sb
          gCkCumB(s) += gTotal(s)
          sbFreq(s) = 0
        }
        i += 1
      }
      sb += 1
    }
    val gSymStart = new Array[Int](sigma + 1)
    var acc = 0
    var s = 0
    while (s < sigma) { gSymStart(s) = acc; acc += gCkIdB(s).length; s += 1 }
    gSymStart(sigma) = acc
    val gCkId = new Array[Int](acc)
    val gCkCum = new Array[Int](acc)
    s = 0
    while (s < sigma) {
      var k = 0
      val base = gSymStart(s)
      while (k < gCkIdB(s).length) { gCkId(base + k) = gCkIdB(s)(k); gCkCum(base + k) = gCkCumB(s)(k); k += 1 }
      s += 1
    }
    new WaveletFbb(n, sigma, SuperBlockSizeLog, gSymStart, gCkId, gCkCum, sbs)
  }

  private def buildSuperBlock(
      seq: Array[Int], sbFrom: Int, sbLen: Int, compress: Boolean, scratch: Array[Int]): SuperBlock = {
    // ---- block-size search: exact payload bits + header bytes per candidate
    var bestLog = BlockSizeLogCandidates(0)
    var bestCost = Long.MaxValue
    BlockSizeLogCandidates.foreach { bLog =>
      val cost = costOfBlockSize(seq, sbFrom, sbLen, bLog, scratch)
      if (cost < bestCost) { bestCost = cost; bestLog = bLog }
    }
    val bLog = bestLog
    val bSize = 1 << bLog
    val numBlocks = math.max((sbLen + bSize - 1) >>> bLog, 1)

    // ---- per-block alphabets, lengths, node lens; per-symbol block checkpoints
    val blockSymStart = new Array[Int](numBlocks + 1)
    val symsB = new mutable.ArrayBuffer[Int]()
    val lensB = new mutable.ArrayBuffer[Byte]()
    val nodeLensB = new mutable.ArrayBuffer[Int]()
    val ckBySym = new mutable.TreeMap[Int, (mutable.ArrayBuffer[Int], mutable.ArrayBuffer[Int])]()
    val runningCount = new mutable.HashMap[Int, Int]()

    // first pass data we keep for the encode pass
    val blockCodes = new Array[Array[Long]](numBlocks)
    val blockLensArr = new Array[Array[Byte]](numBlocks)
    val blockSymsArr = new Array[Array[Int]](numBlocks)
    val blockNodeOffBase = new Array[Int](numBlocks)
    var totalBits = 0L

    var b = 0
    while (b < numBlocks) {
      blockSymStart(b) = symsB.length
      val from = sbFrom + (b << bLog)
      val to = math.min(from + bSize, sbFrom + sbLen)
      val (bsyms, freqs) = blockAlphabet(seq, from, to, scratch)
      val lens = huffmanLengths(freqs, bsyms.length)
      blockSymsArr(b) = bsyms
      blockLensArr(b) = lens
      val codes = new Array[Long](bsyms.length)
      if (bsyms.length > 1) {
        // canonical codes over local indices (bsyms is sorted by symbol id)
        val idx = bsyms.indices.sortBy(i => (lens(i), i))
        var code = 0L
        var prevLen = 0
        idx.foreach { i =>
          code = code << (lens(i) - prevLen)
          codes(i) = code
          code += 1
          prevLen = lens(i)
        }
      }
      blockCodes(b) = codes
      // node bit lengths: occurrences through each internal node
      blockNodeOffBase(b) = nodeLensB.length
      if (bsyms.length > 1) {
        val nodeLen = new Array[Long](bsyms.length - 1)
        // walk a canonical trie identically to SuperBlock's derived construction
        val nodeL = new Array[Int](bsyms.length - 1)
        val nodeR = new Array[Int](bsyms.length - 1)
        var nextNode = 0
        var i = 0
        while (i < bsyms.length) {
          var node = 0
          var l = lens(i) - 1
          while (l >= 0) {
            nodeLen(node) += freqs(i)
            val bit = (codes(i) >>> l) & 1L
            if (l > 0) {
              val slot = if (bit == 0L) nodeL(node) else nodeR(node)
              val child = if (slot > 0) slot else { nextNode += 1; nextNode }
              if (bit == 0L) nodeL(node) = child else nodeR(node) = child
              node = child
            }
            l -= 1
          }
          i += 1
        }
        nodeLen.foreach { nl => nodeLensB += nl.toInt; totalBits += nl }
      }
      // checkpoints + symbol/length tables
      var i = 0
      while (i < bsyms.length) {
        val sym = bsyms(i)
        symsB += sym
        lensB += lens(i)
        val cum = runningCount.getOrElse(sym, 0) + freqs(i).toInt
        runningCount(sym) = cum
        val (ids, cums) = ckBySym.getOrElseUpdate(sym,
          (new mutable.ArrayBuffer[Int](), new mutable.ArrayBuffer[Int]()))
        ids += b
        cums += cum
        i += 1
      }
      b += 1
    }
    blockSymStart(numBlocks) = symsB.length

    // ---- encode pass: write node slices into one shared bit stream
    val builder = new RankBitVector.Builder(math.max(totalBits.toInt, 1))
    var bitCursor = 0
    b = 0
    while (b < numBlocks) {
      val bsyms = blockSymsArr(b)
      if (bsyms.length > 1) {
        val lens = blockLensArr(b)
        val codes = blockCodes(b)
        val numNodes = bsyms.length - 1
        val nodeL = new Array[Int](numNodes)
        val nodeR = new Array[Int](numNodes)
        var nextNode = 0
        var i = 0
        while (i < bsyms.length) {
          var node = 0
          var l = lens(i) - 1
          while (l > 0) {
            val bit = (codes(i) >>> l) & 1L
            val slot = if (bit == 0L) nodeL(node) else nodeR(node)
            val child = if (slot > 0) slot else { nextNode += 1; nextNode }
            if (bit == 0L) nodeL(node) = child else nodeR(node) = child
            node = child
            l -= 1
          }
          i += 1
        }
        val cursors = new Array[Int](numNodes)
        var off = 0
        var k = 0
        while (k < numNodes) {
          cursors(k) = bitCursor + off
          off += nodeLensB(blockNodeOffBase(b) + k)
          k += 1
        }
        val symToLocal = new mutable.HashMap[Int, Int]()
        i = 0
        while (i < bsyms.length) { symToLocal(bsyms(i)) = i; i += 1 }
        val from = sbFrom + (b << bLog)
        val to = math.min(from + (1 << bLog), sbFrom + sbLen)
        var j = from
        while (j < to) {
          val li = symToLocal(seq(j))
          var node = 0
          var l = lens(li) - 1
          val code = codes(li)
          while (l >= 0) {
            val bit = (code >>> l) & 1L
            if (bit != 0L) builder.set(cursors(node))
            cursors(node) += 1
            if (l > 0) node = if (bit == 0L) nodeL(node) else nodeR(node)
            l -= 1
          }
          j += 1
        }
        bitCursor += off
      }
      b += 1
    }

    // flatten checkpoints sorted by symbol
    val ckSyms = ckBySym.keys.toArray
    val ckSymStart = new Array[Int](ckSyms.length + 1)
    var acc = 0
    var ci = 0
    while (ci < ckSyms.length) {
      ckSymStart(ci) = acc
      acc += ckBySym(ckSyms(ci))._1.length
      ci += 1
    }
    ckSymStart(ckSyms.length) = acc
    val ckId = new Array[Int](acc)
    val ckCum = new Array[Int](acc)
    ci = 0
    while (ci < ckSyms.length) {
      val (ids, cums) = ckBySym(ckSyms(ci))
      var k = 0
      val base = ckSymStart(ci)
      while (k < ids.length) { ckId(base + k) = ids(k); ckCum(base + k) = cums(k); k += 1 }
      ci += 1
    }

    new SuperBlock(sbLen, bLog, BitSeqSerde.maybeCompress(builder.result(), compress),
      blockSymStart, symsB.toArray, lensB.toArray, nodeLensB.toArray,
      ckSymStart, ckSyms, ckId, ckCum)
  }

  /** Distinct sorted symbols of seq[from,to) and their frequencies, via a stamped
    * scratch array (no per-block allocation of sigma-sized arrays).
    */
  private def blockAlphabet(seq: Array[Int], from: Int, to: Int, scratch: Array[Int]): (Array[Int], Array[Long]) = {
    val present = new mutable.ArrayBuffer[Int]()
    var i = from
    while (i < to) {
      val s = seq(i)
      if (scratch(s) == 0) present += s
      scratch(s) += 1
      i += 1
    }
    val bsyms = present.toArray
    java.util.Arrays.sort(bsyms)
    val freqs = new Array[Long](bsyms.length)
    i = 0
    while (i < bsyms.length) { freqs(i) = scratch(bsyms(i)).toLong; scratch(bsyms(i)) = 0; i += 1 }
    (bsyms, freqs)
  }

  /** Exact cost in bits of encoding this superblock at block size 2^bLog: Huffman
    * payload + headers (symbol tables 3B, node lens 4B, checkpoints 8B, fixed 8B/block).
    */
  private def costOfBlockSize(seq: Array[Int], sbFrom: Int, sbLen: Int, bLog: Int, scratch: Array[Int]): Long = {
    val bSize = 1 << bLog
    val numBlocks = math.max((sbLen + bSize - 1) >>> bLog, 1)
    var cost = 0L
    var b = 0
    while (b < numBlocks) {
      val from = sbFrom + (b << bLog)
      val to = math.min(from + bSize, sbFrom + sbLen)
      val (bsyms, freqs) = blockAlphabet(seq, from, to, scratch)
      val lens = huffmanLengths(freqs, bsyms.length)
      var i = 0
      while (i < bsyms.length) { cost += freqs(i) * lens(i); i += 1 }
      cost += 64L + bsyms.length * (24L + 64L) + math.max(bsyms.length - 1, 0) * 32L
      b += 1
    }
    cost
  }

  def read(in: DataInput): WaveletFbb = {
    val length = in.readInt()
    val sigma = in.readInt()
    val sbSizeLog = in.readInt()
    val gSymStart = readIntArray(in)
    val gCkId = readIntArray(in)
    val gCkCum = readIntArray(in)
    val sbs = new Array[SuperBlock](in.readInt())
    var i = 0
    while (i < sbs.length) { sbs(i) = readSuperBlock(in); i += 1 }
    new WaveletFbb(length, sigma, sbSizeLog, gSymStart, gCkId, gCkCum, sbs)
  }
}
