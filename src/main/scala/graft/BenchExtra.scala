package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Per-query profiling harness for optimization work (guide §1.4): times individual
  * catalog queries in isolation with the noop sink, optionally repeating each, and
  * dumps the post-execution `.explain("formatted")` plan to a directory so plan-shape
  * claims are reviewable offline. Bench.scala stays frozen; this main adds evidence,
  * it never replaces the driver's bench.
  *
  * Usage: runMain graft.BenchExtra <repeats> [queryName ...]
  *   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench
  *   SPARK_GRAFT_PLAN_DIR=plans/r06 SPARK_GRAFT_PLAN_TAG=before  -> write plan files
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repeats = if (args.nonEmpty) args(0).toInt else 1
    val wanted = args.drop(1).toSet
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val planTag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm exactly like Bench phase 2
    spark.read.parquet(s"$sfDir/nation.parquet").write.format("noop").mode("overwrite").save()
    spark.range(1 << 20).selectExpr("sum(id) as s").write.format("noop").mode("overwrite").save()

    // SPARK_GRAFT_PROFILE_STAGES=1: per-query task-time accounting — when the
    // wall far exceeds taskSum/cores, the residual is DRIVER-side work
    // (planning, commits, bounded collects, CALL procedures)
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    if (sys.env.contains("SPARK_GRAFT_PROFILE_STAGES"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          taskMs.addAndGet(e.taskInfo.duration)
      })

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted.contains(n) }
    val out = new StringBuilder
    qs.foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      val times = (0 until repeats).map { _ =>
        taskMs.set(0L)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        if (sys.env.contains("SPARK_GRAFT_PROFILE_STAGES"))
          System.err.println(f"[extra-tasks] $name wall=$sec%.2f taskSumSec=${taskMs.get() / 1e3}%.1f")
        sec
      }
      planDir.foreach { pd =>
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save() // execute so AQE final plan exists
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.createDirectories(Paths.get(pd))
        Files.write(Paths.get(pd, s"${name}_$planTag.txt"),
          plan.getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      }
      val ts = times.map(t => f"$t%.3f").mkString("[", ",", "]")
      System.err.println(f"[extra] $name min=${times.min}%.3f all=$ts")
      out.append(s""""$name":{"min":${f"${times.min}%.3f"},"all":$ts},""")
    }
    println("{" + out.toString.stripSuffix(",") + "}")
    spark.stop()
  }
}
