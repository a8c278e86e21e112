package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Transcripts, TranscriptPipeline}
import java.nio.file.Files

/** Dev tool: per-stage wall times of the transcript pipeline at a given core count, to
  * see where end-to-end throughput goes (parse / shuffle+sort / fm build / route /
  * sinks+aggregates). Usage: runMain graft.PipeProfile [cores] [rawDir]
  */
object PipeProfile {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 8
    val rawDir = if (args.length > 1) args(1) else "/tmp/graft_bench_rawlines_15000x120"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val cfg = TranscriptPipeline.Config(numShards = 512, saltBlock = 2048,
      sampleRate = 16, numPartitionsOpt = Some(128))

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // warm-up
    val w = Transcripts.generate(spark, 8, 40)
    TranscriptPipeline.runToSinks(spark, w, cfg.copy(numShards = cores),
      Files.createTempDirectory("prof_warm").toString)

    val raw = spark.read.parquet(rawDir)
    time("read+count raw")(raw.count())

    val parsed = Transcripts.parseRawLines(spark, raw)
    time("parse only (noop)")(
      parsed.write.format("noop").mode("overwrite").save())

    val turns = Transcripts.parseRawLines(spark, raw)
    val shards = TranscriptPipeline.buildShards(spark, turns, cfg)
    time("parse+shuffle+sort+build")(
      shards.write.format("noop").mode("overwrite").save())

    val shards2 = TranscriptPipeline.buildShards(spark, Transcripts.parseRawLines(spark, raw), cfg)
      .persist()
    time("build (persisted)")(shards2.count())
    val routed = TranscriptPipeline.route(spark, shards2, cfg.rules)
    time("route (noop)")(
      routed.write.format("noop").mode("overwrite").save())
    time("route+enrich+sink parquet") {
      val enriched = TranscriptPipeline.enrich(spark,
        TranscriptPipeline.route(spark, shards2, cfg.rules))
      enriched.repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(Files.createTempDirectory("prof_sink").toString)
    }
    shards2.unpersist()

    time("full runToSinks")(
      TranscriptPipeline.runToSinks(spark, Transcripts.parseRawLines(spark, raw), cfg,
        Files.createTempDirectory("prof_full").toString))
    spark.stop()
  }
}
