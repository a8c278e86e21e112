package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The DSv2 manifest metadata table and the snapshot-isolated data reader. */
class ManifestSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-manifest-source-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("ERROR") }

  private def freshTable(): String = {
    val out = Files.createTempDirectory("manifest_src").toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("lang_p", col("lang"))
      .write.mode("overwrite").partitionBy("lang_p").parquet(out)
    ManifestTables.commit(out, "lang_p")
    out
  }

  test("DSv2 metadata table lists exactly the committed files with partition values") {
    val out = freshTable()
    val meta = spark.read.format(classOf[ManifestFilesSource].getName).load(out)
    val rows = meta.collect()
    assert(rows.nonEmpty)
    val actualFiles = Files.walk(Paths.get(out)).iterator()
    var expected = 0
    actualFiles.forEachRemaining { p =>
      if (p.toString.endsWith(".parquet") && !p.toString.contains("_manifests")) expected += 1
    }
    assert(rows.length == expected, s"metadata rows ${rows.length} vs files $expected")
    val parts = meta.select("partition").distinct().collect().map(_.getString(0)).toSet
    assert(parts == Set("en", "fr", "es", "de", "zh"))
    // byte sizes come from the real files
    val metaBytes = meta.agg(sum("bytes")).head().getLong(0)
    assert(metaBytes > 0)
  }

  test("column pruning reaches the DSv2 scan (pruned readSchema)") {
    val out = freshTable()
    val meta = spark.read.format(classOf[ManifestFilesSource].getName).load(out)
      .select("bytes")
    val scanLine = meta.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("[bytes#") && !scanLine.contains("partition#"),
      s"scan did not prune columns: $scanLine")
    assert(meta.agg(sum("bytes")).head().getLong(0) > 0)
  }

  test("partition filter pushes into the DSv2 scan and prunes manifest entries") {
    val out = freshTable()
    val meta = spark.read.format(classOf[ManifestFilesSource].getName).load(out)
      .filter(col("partition") === "en")
    val scanLine = meta.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("partitions=en"),
      s"filter not pushed into the source: $scanLine")
    val rows = meta.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[String]("partition") == "en"))
    // IN-list filter too
    val two = spark.read.format(classOf[ManifestFilesSource].getName).load(out)
      .filter(col("partition").isin("en", "fr"))
    assert(two.select("partition").distinct().collect().map(_.getString(0)).toSet
      == Set("en", "fr"))
  }

  test("snapshot isolation: files written after the commit are invisible") {
    val out = freshTable()
    val before = spark.read.format(classOf[ManifestFilesSource].getName).load(out).count()
    val dataBefore = ManifestTables.readData(spark, out, "lang_p").count()
    // stray uncommitted write
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(7)
      .write.mode("overwrite").parquet(s"$out/lang_p=zz")
    val after = spark.read.format(classOf[ManifestFilesSource].getName).load(out).count()
    val dataAfter = ManifestTables.readData(spark, out, "lang_p")
    assert(after == before, "metadata table leaked uncommitted files")
    assert(dataAfter.count() == dataBefore, "data reader leaked uncommitted rows")
    assert(dataAfter.filter(col("lang_p") === "zz").count() == 0)
    // a plain directory read DOES see the stray partition — the manifest is the
    // difference, not parquet itself
    assert(spark.read.parquet(out).filter(col("lang_p") === "zz").count() == 7)
  }

  test("readData restores the partition column and matches the source table") {
    val out = freshTable()
    val got = ManifestTables.readData(spark, out, "lang_p")
      .groupBy("lang_p").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
