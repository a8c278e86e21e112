package graft.core

import java.io.{DataInput, DataOutput}

/** Bit-packed integer vector with caller-tracked variable widths: the caller supplies the
  * bit offset and width on every read/write. Capability parity with
  * /root/reference/indices/src/main/java/com/dynatrace/intsequence/VariableWidthIntVector.java:41-140.
  */
final class VariableWidthIntVector(val numBits: Long, val data: Array[Long]) {

  def this(numBits: Long) = this(numBits, new Array[Long](((numBits + 63) >>> 6).toInt max 1))

  /** Writes `width` low bits of `value` at bit position `pos`. */
  def setValue(pos: Long, value: Long, width: Int): Unit = {
    val mask = Bits.lowMask(width)
    val w = (pos >>> 6).toInt
    val shift = (pos & 63).toInt
    data(w) = (data(w) & ~(mask << shift)) | ((value & mask) << shift)
    val spill = shift + width - 64
    if (spill > 0) {
      data(w + 1) = (data(w + 1) & ~Bits.lowMask(spill)) | ((value & mask) >>> (width - spill))
    }
  }

  /** Reads `width` bits starting at bit position `pos`. */
  def getValue(pos: Long, width: Int): Long = {
    val mask = Bits.lowMask(width)
    val w = (pos >>> 6).toInt
    val shift = (pos & 63).toInt
    val spill = shift + width - 64
    if (spill <= 0) (data(w) >>> shift) & mask
    else ((data(w) >>> shift) | (data(w + 1) << (64 - shift))) & mask
  }

  def write(out: DataOutput): Unit = {
    out.writeLong(numBits)
    out.writeInt(data.length)
    var i = 0
    while (i < data.length) { out.writeLong(data(i)); i += 1 }
  }

  override def hashCode: Int = numBits.toInt + java.util.Arrays.hashCode(data)

  override def equals(o: Any): Boolean = o match {
    case v: VariableWidthIntVector => numBits == v.numBits && java.util.Arrays.equals(data, v.data)
    case _ => false
  }
}

object VariableWidthIntVector {
  def read(in: DataInput): VariableWidthIntVector = {
    val numBits = in.readLong()
    val n = in.readInt()
    val data = new Array[Long](n)
    var i = 0
    while (i < n) { data(i) = in.readLong(); i += 1 }
    new VariableWidthIntVector(numBits, data)
  }
}
