package graft.core

/** Bit-twiddling helpers for the succinct structures.
  *
  * Capability parity with the reference's bit utilities
  * (/root/reference/indices/src/main/java/com/dynatrace/intsequence/Common.java:26,95,169),
  * re-derived from first principles (JDK intrinsics) rather than precomputed mask tables.
  */
object Bits {

  /** Minimum number of bits needed to represent `value` itself (e.g. 7 -> 3, 8 -> 4, 0 -> 1). */
  def minBits(value: Long): Int =
    if (value <= 0L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(value)

  /** Low `width` bits set; width in [0, 64]. */
  @inline def lowMask(width: Int): Long =
    if (width <= 0) 0L else if (width >= 64) -1L else (1L << width) - 1L
}
