package graft.core

/** Burrows-Wheeler transform utilities.
  *
  * Standalone capability parity with
  * /root/reference/indices/src/main/java/com/dynatrace/encoding/BurrowsWheelerTransform.java:43-136
  * (BWT over a sorted-alphabet mapping + the n/r redundancy metric). The FM-Index builds its
  * BWT from its own appearance-order mapping internally.
  */
object Bwt {

  /** BWT from a suffix array: bwt(i) = s(sa(i) - 1), wrapping at 0. */
  def fromSuffixArray(s: Array[Int], sa: Array[Int]): Array[Int] = {
    val n = s.length
    val bwt = new Array[Int](n)
    var i = 0
    while (i < n) {
      val p = sa(i)
      bwt(i) = if (p == 0) s(n - 1) else s(p - 1)
      i += 1
    }
    bwt
  }

  /** BWT of a char text (sorted-alphabet code assignment, sentinel appended).
    * Output is the char sequence of the last column; the sentinel comes out as '\u0000'.
    */
  def transform(text: Array[Char]): Array[Char] = {
    val n = text.length + 1
    val s = new Array[Int](n)
    var i = 0
    while (i < text.length) { s(i) = text(i).toInt + 1; i += 1 }
    s(n - 1) = 0
    val sa = SuffixArrays.saIs(s, 65538)
    val b = fromSuffixArray(s, sa)
    val out = new Array[Char](n)
    i = 0
    while (i < n) { out(i) = if (b(i) == 0) '\u0000' else (b(i) - 1).toChar; i += 1 }
    out
  }

  /** Redundancy metric n/r: length divided by the number of equal-symbol runs.
    * Mirrors computeRedundancyOfText
    * (/root/reference/indices/src/main/java/com/dynatrace/encoding/BurrowsWheelerTransform.java:103-136).
    */
  def redundancy(text: Array[Char]): Double = {
    if (text.isEmpty) return 0.0
    var runs = 1
    var i = 1
    while (i < text.length) {
      if (text(i) != text(i - 1)) runs += 1
      i += 1
    }
    text.length.toDouble / runs
  }
}
