package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manifest-DML cost probe at realistic FILE COUNTS (the round-5 "price metadata
  * ops" item): today's oracle gates run on tables of tens of files; this probe
  * grows a manifest table to N data files through the REAL DSv2 append path
  * (batches of 100 files per commit) and measures, at each N:
  *
  *  - per-APPEND commit wall, first-10 vs last-10 average — the O(fresh files +
  *    segment count) claim: if commits re-copied the table's entry list, the last
  *    appends at 10k files would cost ~100x the first (they must stay ~flat);
  *  - scan PLANNING + zero-column count at N files (footer-count path, pruned and
  *    unpruned);
  *  - metadata-only partition DELETE (snapshot edit, no data read);
  *  - merge-on-read positional DELETE via SQL (O(matches) commit);
  *  - equality-delete upsert commit (O(keys), no data file read);
  *  - manifest compaction (rewrite_manifests: the explicitly-paid O(total) fold);
  *  - data-file compaction (bin-pack rewrite of the small files).
  *
  * Rows per file are tiny on purpose: the probe prices METADATA, not decode.
  *
  *   SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.ManifestDmlProbe 100 1000 10000"
  */
object ManifestDmlProbe {

  def main(args: Array[String]): Unit = {
    val sizes = (if (args.nonEmpty) args.toSeq else Seq("100", "1000")).map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-manifest-dml-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val out = sizes.map { n =>
      require(n % 100 == 0, s"file counts are batches of 100, got $n")
      val dir = java.nio.file.Files.createTempDirectory(s"graft_dmlprobe_$n").toString
      val appends = n / 100
      // one commit = 100 files x 50 rows (repartition pins the file count)
      def batch(k: Int) = spark.range(k * 5000L, (k + 1) * 5000L)
        .select(col("id"), (col("id") * 7).as("v"),
          concat(lit("p"), pmod(col("id"), lit(4))).as("part"))
        .repartition(100)
      val commitSecs = (0 until appends).map { k =>
        val df = batch(k)
        df.count() // materialize the plan outside the timed window
        time(df.write.format("graft.sources.ManifestDataSource")
          .option("partcol", "part").mode("append").save(dir))._2
      }
      def avg(xs: Seq[Double]) = xs.sum / xs.length
      // disjoint head/tail windows so growth in per-commit cost is visible even
      // at small append counts
      val window = math.max(1, math.min(10, appends / 2))
      val firstAvg = avg(commitSecs.take(window))
      val lastAvg = avg(commitSecs.takeRight(window))

      // PARTITION EVOLUTION at N files: add_partition_field stamps every live
      // implicit-spec entry with the old spec's registry id — the ONE O(entries)
      // metadata rewrite evolution pays, priced here at realistic file counts;
      // the drop then flips the default back (entries already stamped, so every
      // segment carries by NAME — the O(segments) floor). The rest of the
      // battery runs on the stamped table, exercising the evolved read paths.
      val (_, respecAddSec) = time(
        graft.sources.ManifestMaintenance.addPartitionField(dir, "bucket(8,id)"))
      val (_, respecDropSec) = time(
        graft.sources.ManifestMaintenance.dropPartitionField(dir, "bucket(8,id)"))

      def tbl = spark.read.format("graft.sources.ManifestDataSource").load(dir)
      val (_, countSec) = time(tbl.count())
      val (_, prunedSec) = time(tbl.filter(col("part") === "p1").count())

      val cat = s"graft_dml_$n"
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.ManifestCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
        new java.io.File(dir).getParent)
      val tname = s"$cat.`${new java.io.File(dir).getName}`"
      // merge-on-read positional DELETE (SQL): O(matches) commit
      spark.conf.set("spark.graft.manifest.deleteMode", "merge-on-read")
      val (_, morSec) =
        try time(spark.sql(s"DELETE FROM $tname WHERE id % 997 = 3"))
        finally spark.conf.unset("spark.graft.manifest.deleteMode")
      // a second MoR delete stacks a second positional segment; the
      // position-delete rewrite then folds both into one — metadata-only,
      // O(segments + recorded positions), zero data files opened
      spark.conf.set("spark.graft.manifest.deleteMode", "merge-on-read")
      try spark.sql(s"DELETE FROM $tname WHERE id % 991 = 7")
      finally spark.conf.unset("spark.graft.manifest.deleteMode")
      val (rpdSnap, rpdSec) = time(
        graft.sources.ManifestMaintenance.rewritePositionDeletes(dir))
      require(rpdSnap.isDefined, "two delete segments must fold")
      // equality upsert: one commit carrying keys + fresh files, no data read
      val (_, eqSec) = time {
        spark.range(0L, 500L).select(col("id"), (col("id") * 9).as("v"),
          concat(lit("p"), pmod(col("id"), lit(4))).as("part"))
          .repartition(4)
          .write.format("graft.sources.ManifestDataSource")
          .option("partcol", "part").option("upsertkey", "id")
          .mode("append").save(dir)
      }
      // metadata-only DELETE: snapshot edit, no data file read
      val (_, metaDelSec) = time(spark.sql(s"DELETE FROM $tname WHERE part = 'p3'"))
      // manifest compaction: the explicitly-paid O(total files) segment fold
      val (_, foldSec) = time(graft.sources.ManifestTables.compact(dir))
      // data-file compaction: bin-pack the small files (reads + rewrites data)
      val (_, packSec) = time(
        graft.sources.ManifestMaintenance.compactDataFiles(spark, dir, 8L << 20))
      val filesAfter = graft.sources.ManifestMaintenance.liveDataFiles(dir).length
      System.err.println(f"[dmlprobe] n=$n commit first10=$firstAvg%.3f " +
        f"last10=$lastAvg%.3f respecAdd=$respecAddSec%.2f " +
        f"respecDrop=$respecDropSec%.2f count=$countSec%.2f pruned=$prunedSec%.2f " +
        f"morDel=$morSec%.2f rewritePosDel=$rpdSec%.2f eqUpsert=$eqSec%.2f " +
        f"metaDel=$metaDelSec%.2f " +
        f"fold=$foldSec%.2f pack=$packSec%.2f filesAfter=$filesAfter")
      n -> Map(
        "commit_first10_avg" -> firstAvg, "commit_last10_avg" -> lastAvg,
        "respec_add" -> respecAddSec, "respec_drop" -> respecDropSec,
        "count_star" -> countSec, "pruned_count" -> prunedSec,
        "mor_delete" -> morSec, "rewrite_posdel" -> rpdSec, "eq_upsert" -> eqSec,
        "meta_delete" -> metaDelSec, "manifest_fold" -> foldSec,
        "data_compact" -> packSec)
    }
    val json = out.map { case (n, m) =>
      s""""$n": {${m.toSeq.sortBy(_._1).map { case (k, v) => f""""$k": $v%.3f""" }.mkString(", ")}}"""
    }.mkString(", ")
    println(s"""{"metric":"manifest_dml_probe","unit":"sec","sizes":{$json}}""")
    spark.stop()
  }
}
