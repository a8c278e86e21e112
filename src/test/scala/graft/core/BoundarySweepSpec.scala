package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** EXHAUSTIVE seed sweep of the three boundary extractions against the char-walk
  * oracles — every position of every corpus, including the corpus-end seeds the
  * reference's random sweeps statistically never reach. Regression lock for the
  * corpus-end defect where the rightward walk returned stray chars (or truncated)
  * when a match abutted the end of the corpus: the reference implementation's
  * end-branch (FmIndex.java:908-916) clobbers an already-found boundary, but its own
  * test oracle (Util.java:167-258) — which these oracles mirror — stops at the
  * boundary there too.
  */
class BoundarySweepSpec extends AnyFunSuite {

  private val fixed = Seq(
    "ab\ncd\n", // trailing boundary: match abutting corpus end
    "ab\ncd", // no trailing boundary: suffix runs to corpus end
    "abcd\nef", // boundary mid-corpus, short tail
    "ab\ncdefghij\n", // seeds within one step-window of the end
    "\nabc\n", // leading boundary
    "x\n" // minimal document
  )

  test("every seed of every corpus x sample rates matches the char-walk oracles") {
    val rnd = new Random(42)
    val randoms = (1 to 40).map { _ =>
      val len = 1 + rnd.nextInt(120)
      (0 until len)
        .map(_ => if (rnd.nextInt(5) == 0) '\n' else ('a' + rnd.nextInt(4)).toChar)
        .mkString
    }.filter(_.contains('\n'))
    var total = 0
    for (text <- fixed ++ randoms; rate <- Seq(1, 2, 4, 8, 16)) {
      val chars = text.toCharArray
      val fm = new FmIndexBuilder().setSampleRate(rate).build(chars)
      val dest = new Array[Char](256)
      for (seed <- chars.indices) {
        val show = text.map(c => if (c == '\n') 'N' else c)
        val nT = fm.extractUntilBoundary(seed, dest, 0, '\n')
        assert(new String(dest, 0, nT) == TestOracles.extractUntilBoundary(chars, seed, '\n'),
          s"two-sided text='$show' rate=$rate seed=$seed")
        val nL = fm.extractUntilBoundaryLeft(seed, dest, 0, '\n')
        assert(new String(dest, 0, nL) == TestOracles.extractUntilBoundaryLeft(chars, seed, '\n'),
          s"left text='$show' rate=$rate seed=$seed")
        val nR = fm.extractUntilBoundaryRight(seed, dest, 0, '\n')
        assert(new String(dest, 0, nR) == TestOracles.extractUntilBoundaryRight(chars, seed, '\n'),
          s"right text='$show' rate=$rate seed=$seed")
        total += 3
      }
    }
    assert(total > 30000, s"sweep too small: $total")
  }
}
