package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** CLI entry: read a UTF-8 file, build the FM-Index, print stats and query results.
  * Capability parity with the reference's runner
  * (/root/reference/indices/src/main/java/com/dynatrace/run/Runner.java:31-52), extended
  * with locate/extract so the whole query surface is drivable from a shell.
  *
  * Usage: FmCli <file> [sampleRate] [pattern ...]   (default sampleRate 32, pattern INFO)
  */
object FmCli {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: FmCli <file> [sampleRate] [pattern ...]")
      sys.exit(2)
    }
    val text = new String(Files.readAllBytes(Paths.get(args(0))), StandardCharsets.UTF_8)
    val sampleRate = if (args.length > 1) args(1).toInt else 32
    val patterns = if (args.length > 2) args.drop(2).toSeq else Seq("INFO")

    val t0 = System.nanoTime()
    val fmi = new FmIndexBuilder().setSampleRate(sampleRate).build(text.toCharArray)
    val buildSec = (System.nanoTime() - t0) / 1e9

    println(s"file=${args(0)} chars=${text.length} alphabet=${fmi.getAlphabetLength} " +
      f"sampleRate=$sampleRate buildSec=$buildSec%.3f " +
      f"throughputMBps=${text.length / 1e6 / buildSec}%.2f serializedBytes=${fmi.serialize().length}")

    for (p <- patterns) {
      val pat = p.toCharArray
      val count = fmi.count(pat)
      val sample = fmi.locateAll(pat).take(5)
      println(s"pattern='$p' count=$count firstLocations=${sample.mkString(",")}")
      sample.headOption.foreach { loc =>
        val stop = math.min(loc + pat.length + 20, text.length)
        println(s"  extract[$loc,$stop)='${fmi.extractString(loc, stop).replace('\n', ' ')}'")
      }
    }
  }
}
