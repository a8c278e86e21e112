package graft.core

import scala.util.Random

/** Naive oracles + deterministic fixtures for differential testing, behaviorally matching
  * the reference's test utilities
  * (/root/reference/indices/src/test/java/com/dynatrace/util/Util.java:111-258) and the
  * HDFS_2k_multichar.log fixture characteristics (2k lines, >2000 distinct chars including
  * multi-byte UTF-8). We synthesize our own corpus with the same properties (seed 42).
  */
object TestOracles {

  val SmallerText: Array[Char] = "aloha what a string this is string is eh".toCharArray

  val LongerText: Array[Char] =
    ("""It was a bright cold day in the lab and the clocks were striking thirteen.
      |The analyst, his chin nuzzled into his coat in an effort to escape the vile
      |wind, slipped quickly through the glass doors, though not quickly enough to
      |prevent a swirl of gritty dust from entering along with him. The hallway smelt
      |of old coffee and fresh solder. At one end of it a colour poster, too large
      |for indoor display, had been tacked to the wall. It depicted simply an
      |enormous dashboard, more than a metre wide: the face of a cluster, heavy
      |with graphs, ruggedly handsome executors and partitions. The analyst made
      |for the stairs. It was no use trying the lift. Even at the best of times it
      |was seldom working, and at present the electric current was cut off during
      |daylight hours. It was part of the economy drive in preparation for
      |Capacity Week. The office was seven flights up, and the analyst, who was
      |thirty-nine and had a varicose ulcer above his right ankle, went slowly,
      |resting several times on the way. On each landing, opposite the lift-shaft,
      |the poster with the enormous dashboard gazed from the wall. It was one of
      |those pictures which are so contrived that the numbers follow you about when
      |you move. THE SHUFFLE IS WATCHING YOU, the caption beneath it ran.
      |""".stripMargin).toCharArray

  /** The corner-case boundary fixture from FmIndexTest.java:379. */
  val BoundaryText: String = "What a string!\nNow this is long, indeed\nBut others could be longer."

  /** Deterministic HDFS-style multichar log corpus: 2000 lines, components, block ids,
    * key=value pairs, and CJK/Thai/Katakana salt (alphabet > 1000 distinct, all < 32767).
    */
  lazy val LogCorpus: String = {
    val rnd = new Random(42)
    val levels = Array("INFO", "WARN", "ERROR", "DEBUG")
    val components = Array(
      "dfs.DataNode$PacketResponder", "dfs.FSNamesystem", "dfs.DataBlockScanner",
      "mapred.TaskTracker", "rpc.Server", "net.NetworkTopology", "ipc.Client",
      "hdfs.StateChange", "security.UserGroupInformation", "util.GSet")
    val words = Array(
      "Received", "block", "of", "size", "from", "terminating", "Verification",
      "succeeded", "for", "ask", "to", "replicate", "Deleting", "added", "stored",
      "PacketResponder", "exception", "while", "serving", "src", "dest")
    val sb = new StringBuilder
    var i = 0
    while (i < 2000) {
      sb.append(f"${81109 + rnd.nextInt(100)}%06d ")
      sb.append(f"${rnd.nextInt(240000)}%06d ")
      sb.append(rnd.nextInt(4000)).append(' ')
      sb.append(levels(rnd.nextInt(levels.length))).append(' ')
      sb.append(components(rnd.nextInt(components.length))).append(": ")
      var w = 0
      val nWords = 4 + rnd.nextInt(10)
      while (w < nWords) {
        rnd.nextInt(6) match {
          case 0 => sb.append("blk_").append(rnd.nextLong())
          case 1 => sb.append("size=").append(rnd.nextInt(1 << 26))
          case 2 => // multichar salt: CJK / Thai / Katakana, all below 32767
            val base = rnd.nextInt(3) match {
              case 0 => 0x4e00 + rnd.nextInt(0x2000)
              case 1 => 0x0e01 + rnd.nextInt(0x3a)
              case _ => 0x30a1 + rnd.nextInt(0x54)
            }
            var k = 0
            val len = 1 + rnd.nextInt(4)
            while (k < len) { sb.append((base + rnd.nextInt(64)).toChar); k += 1 }
          case 3 => sb.append("10.").append(rnd.nextInt(256)).append('.')
            .append(rnd.nextInt(256)).append('.').append(rnd.nextInt(256))
            .append(':').append(rnd.nextInt(65536))
          case _ => sb.append(words(rnd.nextInt(words.length)))
        }
        sb.append(' ')
        w += 1
      }
      sb.append('\n')
      i += 1
    }
    sb.toString
  }

  lazy val LogChars: Array[Char] = LogCorpus.toCharArray

  /** Overlapping-match count of a literal pattern (restart at start+1). */
  def countOverlapping(text: Array[Char], pattern: Array[Char]): Int =
    locateOverlapping(text, pattern).length

  /** Sorted positions of overlapping matches of a literal pattern. */
  def locateOverlapping(text: Array[Char], pattern: Array[Char]): Array[Int] = {
    val t = new String(text)
    val p = new String(pattern)
    val out = scala.collection.mutable.ArrayBuffer[Int]()
    var from = 0
    var idx = t.indexOf(p, from)
    while (idx >= 0) {
      out += idx
      from = idx + 1
      idx = t.indexOf(p, from)
    }
    out.toArray
  }

  /** Slice around `seed` delimited (exclusive) by `boundary` on both sides. */
  def extractUntilBoundary(text: Array[Char], seed: Int, boundary: Char): String = {
    if (text(seed) == boundary) return ""
    val down = new StringBuilder
    var i = seed
    while (i >= 0 && text(i) != boundary) { down.append(text(i)); i -= 1 }
    val up = new StringBuilder
    i = seed + 1
    while (i < text.length && text(i) != boundary) { up.append(text(i)); i += 1 }
    down.reverse.toString + up.toString
  }

  def extractUntilBoundaryLeft(text: Array[Char], seed: Int, boundary: Char): String = {
    if (text(seed) == boundary) return ""
    val down = new StringBuilder
    var i = seed
    while (i >= 0 && text(i) != boundary) { down.append(text(i)); i -= 1 }
    down.reverse.toString
  }

  def extractUntilBoundaryRight(text: Array[Char], seed: Int, boundary: Char): String = {
    if (text(seed) == boundary) return ""
    val up = new StringBuilder
    var i = seed + 1
    while (i < text.length && text(i) != boundary) { up.append(text(i)); i += 1 }
    up.toString
  }

  /** Naive symbol frequency in [0, until). */
  def countPrevOccurrences(sym: Int, seq: Array[Int], until: Int): Int = {
    var c = 0
    var i = 0
    while (i < until) { if (seq(i) == sym) c += 1; i += 1 }
    c
  }
}
