package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: materialize one catalog query and its oracle SQL for a manual DuckDB
  * parity check before the driver's gate runs. Usage:
  * `sbt "runMain graft.DumpQuery q51b_ivf_kmeans /root/testdata/sf0.01 /tmp/out"`.
  */
object DumpQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args.take(3)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    SparkEntry.oracleSql.get(name).foreach { sql =>
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/$name.sql"),
        sql.getBytes("UTF-8"))
    }
    spark.stop()
  }
}
