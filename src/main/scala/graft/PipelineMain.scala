package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.{PartitionedTable, SinkRule, Transcripts, TranscriptPipeline}

/** Production entry point (spark-submit):
  *
  *   spark-submit --class graft.PipelineMain <jar> \
  *     --input <transcript table dir | "synthetic:N_CONVS:TURNS"> \
  *     --output <out dir> [--shards 4096] [--sample-rate 16] [--salt-block 4096] \
  *     [--rules sink=pattern,sink=pattern,...] [--raw-lines] [--compress]
  *     [--compress-mode wavelet|all|off]
  *
  * Runs parse -> index -> route -> aggregate and writes per-sink tables, aggregates,
  * window stats and lineage under --output with atomic per-attempt commit markers.
  * Re-running with the same --output resumes: committed shard_ids (from the lineage
  * parquet) are anti-joined away, and a crash in any window leaves only orphan files
  * that readers never see. Cluster size comes from spark-submit (--master / executor
  * settings); nothing here depends on it — shard assignment is a pure function of the
  * data.
  */
object PipelineMain {

  private def parseArgs(args: Array[String]): Map[String, String] = {
    val m = scala.collection.mutable.Map[String, String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--raw-lines" => m += "raw-lines" -> "true"; i += 1
        case "--compress" => m += "compress" -> "true"; i += 1
        case flag if flag.startsWith("--") && i + 1 < args.length =>
          m += flag.drop(2) -> args(i + 1); i += 2
        case other => throw new IllegalArgumentException(s"unexpected argument: $other")
      }
    }
    m.toMap
  }

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val input = opts.getOrElse("input", sys.error("--input required"))
    val output = opts.getOrElse("output", sys.error("--output required"))

    val spark = SparkSession.builder()
      // spark-submit injects spark.master; default to local[*] for direct JVM runs
      .master(sys.props.getOrElse("spark.master", "local[*]"))
      .appName("graft-transcript-pipeline")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rules = opts.get("rules") match {
      case Some(spec) =>
        spec.split(',').toSeq.map { kv =>
          val Array(sink, pattern) = kv.split("=", 2)
          SinkRule(sink, pattern)
        }
      case None => Transcripts.DefaultRules
    }
    val cfg = TranscriptPipeline.Config(
      numShards = opts.getOrElse("shards", "4096").toInt,
      saltBlock = opts.getOrElse("salt-block", "4096").toInt,
      sampleRate = opts.getOrElse("sample-rate", "16").toInt,
      rules = rules,
      // --compress = RRR everywhere; --compress-mode wavelet = RRR nodes + Rank9
      // sample marks (fast locate at most of the size win)
      compression = opts.get("compress-mode").map {
        case "wavelet" => graft.core.FmIndex.CompressWavelet
        case "all" => graft.core.FmIndex.CompressAll
        case "off" => graft.core.FmIndex.NoCompression
        case other => sys.error(s"--compress-mode must be wavelet|all|off, got $other")
      }.getOrElse(
        if (opts.contains("compress")) graft.core.FmIndex.CompressAll
        else graft.core.FmIndex.NoCompression))

    val turns =
      if (input.startsWith("synthetic:")) {
        val parts = input.split(':')
        Transcripts.generate(spark, parts(1).toInt, parts(2).toInt)
      } else if (opts.contains("raw-lines")) {
        Transcripts.parseRawLines(spark, spark.read.text(input))
      } else {
        PartitionedTable.readTranscripts(spark, input)
      }

    val t0 = System.nanoTime()
    val report = TranscriptPipeline.runToSinks(spark, turns, cfg, output)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[pipeline] resumed=${report.resumed} shards=${report.shardsBuilt} " +
      f"turns=${report.turnsIndexed} routed=${report.rowsRouted} " +
      f"seconds=$sec%.1f turns_per_sec=${report.turnsIndexed / sec}%.0f")
    spark.stop()
  }
}
