package graft.core

/** Suffix-array construction and plain binary-search queries.
  *
  * The reference delegates construction to an external library (DivSufSort,
  * /root/reference/indices/src/main/java/com/dynatrace/fm/FmIndex.java:329-341); we implement
  * SA-IS (Nong, Zhang, Chan: "Linear Suffix Array Construction by Almost Pure Induced-Sorting",
  * DCC 2009) from scratch. `SuffixArraySearch` mirrors the reference's standalone suffix-array
  * count/locate (/root/reference/indices/src/main/java/com/dynatrace/suffixarray/SuffixArray.java:100-156)
  * and doubles as an independent test oracle for the FM-Index.
  */
object SuffixArrays {

  /** SA-IS. Input values must lie in [0, sigma) and s must END with a unique, smallest
    * sentinel: s(n-1) == 0 and 0 appears nowhere else. Runs in O(n).
    */
  def saIs(s: Array[Int], sigma: Int): Array[Int] = {
    val n = s.length
    require(n > 0, "empty input")
    val sa = new Array[Int](n)
    if (n == 1) { sa(0) = 0; return sa }
    java.util.Arrays.fill(sa, -1)

    // L/S classification; sType(i) == true means suffix i is S-type
    val sType = new Array[Boolean](n)
    sType(n - 1) = true
    var i = n - 2
    while (i >= 0) {
      sType(i) = s(i) < s(i + 1) || (s(i) == s(i + 1) && sType(i + 1))
      i -= 1
    }
    @inline def isLms(j: Int): Boolean = j > 0 && sType(j) && !sType(j - 1)

    val bktSizes = new Array[Int](sigma)
    i = 0
    while (i < n) { bktSizes(s(i)) += 1; i += 1 }
    val bkt = new Array[Int](sigma)
    def bktEnds(): Unit = {
      var sum = 0; var c = 0
      while (c < sigma) { sum += bktSizes(c); bkt(c) = sum; c += 1 }
    }
    def bktStarts(): Unit = {
      var sum = 0; var c = 0
      while (c < sigma) { bkt(c) = sum; sum += bktSizes(c); c += 1 }
    }

    def induce(): Unit = {
      // induce L-type suffixes scanning left-to-right
      bktStarts()
      var j = 0
      while (j < n) {
        val p = sa(j)
        if (p > 0 && !sType(p - 1)) {
          val c = s(p - 1); sa(bkt(c)) = p - 1; bkt(c) += 1
        }
        j += 1
      }
      // induce S-type suffixes scanning right-to-left
      bktEnds()
      j = n - 1
      while (j >= 0) {
        val p = sa(j)
        if (p > 0 && sType(p - 1)) {
          val c = s(p - 1); bkt(c) -= 1; sa(bkt(c)) = p - 1
        }
        j -= 1
      }
    }

    // 1) place LMS suffixes at their bucket ends (arbitrary relative order), induce once
    bktEnds()
    i = 1
    while (i < n) {
      if (isLms(i)) { val c = s(i); bkt(c) -= 1; sa(bkt(c)) = i }
      i += 1
    }
    induce()

    // 2) compact the now-sorted LMS substrings to the front of sa
    var nLms = 0
    i = 0
    while (i < n) {
      val p = sa(i)
      if (isLms(p)) { sa(nLms) = p; nLms += 1 }
      i += 1
    }

    // 3) name LMS substrings (equal substrings share a name)
    java.util.Arrays.fill(sa, nLms, n, -1)
    var name = 0
    var prev = -1
    i = 0
    while (i < nLms) {
      val pos = sa(i)
      var diff = false
      if (prev == -1) diff = true
      else {
        var d = 0
        var done = false
        while (!done) {
          if (s(pos + d) != s(prev + d) || sType(pos + d) != sType(prev + d)) {
            diff = true; done = true
          } else if (d > 0) {
            val lp = isLms(pos + d); val lq = isLms(prev + d)
            if (lp && lq) done = true
            else if (lp != lq) { diff = true; done = true }
            else d += 1
          } else d += 1
        }
      }
      if (diff) { name += 1; prev = pos }
      sa(nLms + pos / 2) = name - 1
      i += 1
    }

    // 4) build the reduced string (LMS names in text order) and solve it
    val s1 = new Array[Int](nLms)
    var j = 0
    i = nLms
    while (i < n) {
      if (sa(i) >= 0) { s1(j) = sa(i); j += 1 }
      i += 1
    }
    val sa1: Array[Int] =
      if (name == nLms) {
        val r = new Array[Int](nLms)
        var k = 0
        while (k < nLms) { r(s1(k)) = k; k += 1 }
        r
      } else saIs(s1, name)

    // 5) final induced sort seeded with LMS suffixes in sorted order
    val lmsPos = new Array[Int](nLms)
    j = 0
    i = 1
    while (i < n) {
      if (isLms(i)) { lmsPos(j) = i; j += 1 }
      i += 1
    }
    java.util.Arrays.fill(sa, -1)
    bktEnds()
    i = nLms - 1
    while (i >= 0) {
      val p = lmsPos(sa1(i))
      val c = s(p)
      bkt(c) -= 1
      sa(bkt(c)) = p
      i -= 1
    }
    induce()
    sa
  }

  /** Naive O(n^2 log n) oracle for tests: sort suffix indices by suffix comparison. */
  def naive(s: Array[Int]): Array[Int] = {
    val n = s.length
    val idx = Array.range(0, n)
    idx.sortWith { (a, b) =>
      var i = a; var j = b
      var res = 0
      while (res == 0 && i < n && j < n) {
        res = Integer.compare(s(i), s(j))
        i += 1; j += 1
      }
      if (res != 0) res < 0 else i == n && j < n
    }
  }
}

/** Plain suffix-array substring search over a text: count and locate by two binary
  * searches (lower/upper interval). Overlapping-match semantics, like the FM-Index.
  */
final class SuffixArraySearch(text: Array[Char]) {
  private val n = text.length
  private val sa: Array[Int] = {
    // map chars to [1, sigma) and append sentinel 0
    val s = new Array[Int](n + 1)
    var i = 0
    while (i < n) { s(i) = text(i).toInt + 1; i += 1 }
    s(n) = 0
    SuffixArrays.saIs(s, 65538)
  }

  /** Compares pattern against suffix sa(row); <0 if pattern sorts before, 0 on prefix match. */
  private def cmp(pattern: Array[Char], row: Int): Int = {
    val start = sa(row)
    var i = 0
    while (i < pattern.length) {
      val ti = start + i
      if (ti >= n) return 1 // suffix exhausted -> suffix is smaller
      val d = Character.compare(pattern(i), text(ti))
      if (d != 0) return d
      i += 1
    }
    0
  }

  private def lowerBound(pattern: Array[Char]): Int = {
    var lo = 0; var hi = n + 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmp(pattern, mid) > 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  private def upperBound(pattern: Array[Char]): Int = {
    var lo = 0; var hi = n + 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmp(pattern, mid) >= 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  def count(pattern: Array[Char]): Int = upperBound(pattern) - lowerBound(pattern)

  /** All match positions, sorted ascending. */
  def locate(pattern: Array[Char]): Array[Int] = {
    val lo = lowerBound(pattern)
    val hi = upperBound(pattern)
    val out = new Array[Int](hi - lo)
    var i = lo
    while (i < hi) { out(i - lo) = sa(i); i += 1 }
    java.util.Arrays.sort(out)
    out
  }
}
