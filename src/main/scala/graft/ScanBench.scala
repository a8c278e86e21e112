package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Manifest-scan vs native-parquet-scan micro-bench: the round-4 acceptance evidence
  * that the DSv2 manifest data table's vectorized read path pays ~the same per-byte
  * decode cost as Spark's built-in parquet scan on the SAME files (round 3's
  * row-at-a-time Group reader was several-fold slower per scanned byte).
  *
  * Setup (untimed): one Hive-partitioned copy of `documents` (strings + longs) and one
  * of `embeddings` (array<float>) at SPARK_GRAFT_SF_DIR, manifest-committed. Timed:
  * min-of-N of the same full-decode aggregate through (a) spark.read.parquet on the
  * directory, (b) the manifest DSv2 table. Prints one JSON line.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.ScanBench"
  */
object ScanBench {

  private def timeMinOf(reps: Int)(body: => Unit): Double = {
    var best = Double.MaxValue
    (0 until reps).foreach { _ =>
      val t0 = System.nanoTime()
      body
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    best
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCAN_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scan-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- setup: identical files for both readers (layout differences must not leak
    // into the comparison), manifest-committed
    val docsDir = Files.createTempDirectory("scanbench_docs").toString
    spark.read.parquet(s"$sfDir/documents.parquet").withColumn("lang_p", col("lang"))
      .write.mode("overwrite").partitionBy("lang_p").parquet(docsDir)
    graft.sources.ManifestTables.commit(docsDir, "lang_p")
    val embDir = Files.createTempDirectory("scanbench_emb").toString
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("label_p", col("label").cast("string"))
      .write.format("graft.sources.ManifestDataSource")
      .option("partcol", "label_p").mode("overwrite").save(embDir)

    def manifest(dir: String) = spark.read.format("graft.sources.ManifestDataSource").load(dir)

    // full string + long decode over every row
    def docAgg(df: org.apache.spark.sql.DataFrame): Unit =
      df.agg(sum(length(col("text"))), sum(col("n_chars")), count(lit(1))).collect()
    // full array decode: every element summed
    def embAgg(df: org.apache.spark.sql.DataFrame): Unit =
      df.agg(sum(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double"))), count(lit(1))).collect()

    // warm both paths (codegen, file-system cache) before timing
    docAgg(spark.read.parquet(docsDir)); docAgg(manifest(docsDir))
    embAgg(spark.read.parquet(embDir)); embAgg(manifest(embDir))

    val docNative = timeMinOf(reps)(docAgg(spark.read.parquet(docsDir)))
    val docManifest = timeMinOf(reps)(docAgg(manifest(docsDir)))
    val embNative = timeMinOf(reps)(embAgg(spark.read.parquet(embDir)))
    val embManifest = timeMinOf(reps)(embAgg(manifest(embDir)))

    println(
      f"""{"metric":"manifest_scan_vs_native","unit":"sec","sf":"$sfDir%s","reps":$reps%d,""" +
        f""""documents":{"native":$docNative%.3f,"manifest":$docManifest%.3f,"ratio":${docManifest / docNative}%.2f},""" +
        f""""embeddings":{"native":$embNative%.3f,"manifest":$embManifest%.3f,"ratio":${embManifest / embNative}%.2f}}""")
    spark.stop()
    // full table copies — delete, or repeated runs fill /tmp (the Bench ENOSPC class)
    Seq(docsDir, embDir).foreach { d =>
      val walk = Files.walk(java.nio.file.Paths.get(d))
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
