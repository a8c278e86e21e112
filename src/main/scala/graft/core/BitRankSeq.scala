package graft.core

import java.io.{DataInput, DataOutput}

/** Common contract of the rank bitvectors backing the FM-Index: plain Rank9
  * (RankBitVector, fast) or RRR-compressed (RrrVector, ~entropy-sized). The reference
  * stores its FM bitvectors RRR-compressed (RrrVector.java); we make the engine a
  * build-time choice: Rank9 for hot in-memory shards, RRR when shard bytes dominate
  * (at 100 TB the shard table's footprint IS the cluster's memory/IO bill).
  */
trait BitRankSeq {
  def numBits: Int
  def access(pos: Int): Boolean
  def rankOnes(pos: Int): Int
  def rankZeroes(pos: Int): Int
  def sizeInBytes: Long
  def write(out: DataOutput): Unit
}

/** Kind-byte-dispatched serde for BitRankSeq (0 = Rank9, 1 = RRR). */
object BitSeqSerde {
  def write(out: DataOutput, bv: BitRankSeq): Unit = bv match {
    case r: RrrVector => out.writeByte(1); r.write(out)
    case r: RankBitVector => out.writeByte(0); r.write(out)
  }

  def read(in: DataInput): BitRankSeq = in.readByte() match {
    case 1 => RrrVector.read(in)
    case _ => RankBitVector.read(in)
  }

  /** Default RRR rank-sample rate (blocks per sample) used by the compressed build. */
  val RrrSampleRate = 16

  def maybeCompress(bv: RankBitVector, compress: Boolean): BitRankSeq =
    if (compress) RrrVector(bv, RrrSampleRate) else bv
}
