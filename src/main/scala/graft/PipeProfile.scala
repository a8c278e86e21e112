package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.{Transcripts, TranscriptPipeline}
import java.nio.file.{Files, Paths}

/** Per-stage wall times + heap peaks of the transcript pipeline at a given core count —
  * where end-to-end throughput and executor memory go (parse / shuffle+sort / fm build /
  * route / sinks+aggregates). local-mode executors share the driver JVM, so the sampled
  * heap peak IS the all-executors working set; divide by cores for a per-executor-core
  * sizing estimate at cluster scale.
  *
  * Usage: runMain graft.PipeProfile [cores] [rawDir] [nConvs] [turnsPerConv]
  *   - rawDir missing on disk -> generated at nConvs x turnsPerConv (defaults 15000x120)
  *   - prints one [profile-json] line with stage seconds, heap peaks and turns/sec
  *     (the scale-evidence artifact recorded in BENCH.md)
  */
object PipeProfile {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 8
    val nConvs = if (args.length > 2) args(2).toInt else 15000
    val turnsPerConv = if (args.length > 3) args(3).toInt else 120
    val rawDir =
      if (args.length > 1) args(1) else s"/tmp/graft_bench_rawlines_${nConvs}x$turnsPerConv"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cfg = TranscriptPipeline.Config(numShards = 512, saltBlock = 2048,
      sampleRate = 16, numPartitionsOpt = Some(128))

    // whole-run heap sampler: per-stage peak = max sample between stage start/stop
    @volatile var stagePeak = 0L
    @volatile var sampling = true
    val sampler = new Thread(() => {
      val rt = Runtime.getRuntime
      while (sampling) {
        stagePeak = math.max(stagePeak, rt.totalMemory() - rt.freeMemory())
        Thread.sleep(25)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    val stages = scala.collection.mutable.LinkedHashMap[String, (Double, Long)]()
    def time[T](name: String)(f: => T): T = {
      stagePeak = 0L
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      val peakMb = stagePeak >> 20
      stages(name) = (sec, peakMb)
      System.err.println(f"[profile] $name%-28s $sec%8.2f s  peakHeap ${peakMb}%6d MB")
      r
    }

    if (!Files.exists(Paths.get(rawDir))) {
      System.err.println(s"[profile] generating $rawDir ($nConvs convs x $turnsPerConv)...")
      val turns = Transcripts.generate(spark, nConvs, turnsPerConv, skewConvs = 4, skewFactor = 25)
      Transcripts.renderRawLines(turns).write.mode("overwrite").parquet(rawDir)
    }

    // warm-up
    val w = Transcripts.generate(spark, 8, 40)
    TranscriptPipeline.runToSinks(spark, w, cfg.copy(numShards = cores),
      Files.createTempDirectory("prof_warm").toString)

    val raw = spark.read.parquet(rawDir)
    val nTurns = raw.count()

    // SPARK_GRAFT_PROFILE_FULL_ONLY=<n>: skip the stage probes and time n
    // back-to-back full runToSinks runs (min-of-n under contention noise).
    // SPARK_GRAFT_PROFILE_STAGES=1 additionally prints per-stage task balance
    // (tasks, sum/max/median task ms) — where stage-tail idling hides.
    sys.env.get("SPARK_GRAFT_PROFILE_FULL_ONLY").map(_.toInt).foreach { n =>
      val stageTimes = new java.util.concurrent.ConcurrentHashMap[Int,
        (String, scala.collection.mutable.ArrayBuffer[Long])]()
      if (sys.env.contains("SPARK_GRAFT_PROFILE_STAGES"))
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val b = stageTimes.computeIfAbsent(e.stageId,
              _ => (e.stageId.toString, scala.collection.mutable.ArrayBuffer.empty[Long]))
            b._2.synchronized { b._2 += e.taskInfo.duration }
          }
        })
      val times = (1 to n).map { i =>
        val out = Files.createTempDirectory(s"prof_full_$i").toString
        val t0 = System.nanoTime()
        TranscriptPipeline.runToSinks(spark, Transcripts.parseRawLines(spark, raw), cfg, out)
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[profile] full run $i: $sec%.2f s")
        if (!stageTimes.isEmpty) {
          import scala.jdk.CollectionConverters._
          stageTimes.asScala.toSeq.sortBy(_._1).foreach { case (sid, (_, ds)) =>
            val s = ds.sorted
            if (s.nonEmpty && s.sum > 500)
              System.err.println(f"[stage] $sid%4d tasks=${s.length}%4d " +
                f"sum=${s.sum}%6d ms max=${s.last}%6d med=${s(s.length / 2)}%5d")
          }
          stageTimes.clear()
        }
        sec
      }
      println(f"""[profile-json] {"cores":$cores,"turns":$nTurns,"fullRuns":${
        times.map(t => f"$t%.2f").mkString("[", ",", "]")},"min":${times.min}%.2f}""")
      sampling = false
      spark.stop()
      return
    }
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

    val full = time("full runToSinks")(
      TranscriptPipeline.runToSinks(spark, Transcripts.parseRawLines(spark, raw), cfg,
        Files.createTempDirectory("prof_full").toString))
    sampling = false
    val fullSec = stages("full runToSinks")._1
    val stageJson = stages.map { case (k, (s, m)) =>
      f""""$k":{"sec":$s%.2f,"peakHeapMb":$m}"""
    }.mkString("{", ",", "}")
    println(
      f"""[profile-json] {"cores":$cores,"turns":$nTurns,"turnsIndexed":${full.turnsIndexed},""" +
        f""""turnsPerSec":${nTurns / fullSec}%.0f,"stages":$stageJson}""")
    spark.stop()
  }
}
