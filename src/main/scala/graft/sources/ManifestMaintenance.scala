package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Data-file COMPACTION for manifest tables — the `rewrite_data_files` analog to
  * `ManifestTables.compact`'s `rewrite_manifests`. The small-file problem is the
  * canonical failure mode of streaming/append-heavy tables at scale: a 100 TB table
  * fed by per-micro-batch commits accumulates millions of KB-sized parquet files,
  * and every scan pays one footer open + one InputPartition per file. Compaction
  * bin-packs small files of the SAME partition into consolidated files and publishes
  * the swap as one atomic snapshot edit:
  *
  *  - files are packed greedily, in manifest order, into bins of at most
  *    `targetBytes`; only bins holding >= 2 files are rewritten (a lone small file
  *    or any file already near target size is carried unchanged);
  *  - each bin is read through Spark WITH THE AUTHORITATIVE table schema, so a bin
  *    spanning pre- and post-ALTER files materializes the evolved columns (nulls
  *    for legacy rows) — compaction and schema evolution compose;
  *  - the rewritten snapshot is published with the same optimistic-concurrency CAS
  *    as every other commit; concurrent APPENDS are preserved (their entries are
  *    re-read on each attempt), while a concurrent OVERWRITE/DELETE that removed
  *    any source file ABORTS the compaction (publishing would resurrect deleted
  *    rows — Iceberg's serializable-validation rule), cleaning up its output;
  *  - old snapshots still reference the original small files (time travel is
  *    untouched); the physical bytes are reclaimed later by `expireSnapshots` +
  *    `removeOrphans`, the same lifecycle as overwrite and DELETE.
  *
  * Reference behavior: dynatrace-oss/index4j has no table maintenance surface; this
  * follows the published Iceberg/Delta OPTIMIZE design (bin-pack rewrite + snapshot
  * swap) re-expressed on this repo's manifest layout.
  */
object ManifestMaintenance {

  /** Live data files of the current snapshot: (relative path, bytes, joined
    * partition value) — the public maintenance view (file counts before/after
    * compaction, fragmentation monitoring) without exposing manifest internals.
    */
  def liveDataFiles(dir: String): Seq[(String, Long, String)] =
    ManifestTables.readSnapshot(dir, None).map(e => (e.path, e.bytes, e.partition))

  /** One rewritten bin: the source entries it replaces and the replacement entry. */
  private case class Rewrite(sources: Seq[ManifestTables.Entry], replacement: ManifestTables.Entry)

  /** Bin-packs and rewrites small data files; returns the new snapshot id, or None
    * when no partition holds a packable bin (the table is left untouched — no
    * snapshot is published). `targetBytes` is both the pack bound and the "already
    * big enough" cutoff.
    */
  def compactDataFiles(spark: SparkSession, dir: String, targetBytes: Long): Option[Int] = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val partCols = ManifestTables.readPartitionSpec(dir)
    val schema = ManifestDataSource.tableSchema(dir)
    require(schema.nonEmpty, s"no committed schema under $dir — nothing to compact")
    val dataSchema = StructType(schema.filterNot(f => partCols.exists(_.name == f.name)))
    val planRefs = ManifestTables.readSnapshotRefs(dir, None)
    val entries = ManifestTables.entriesOf(dir, planRefs)
    // merge-on-read: positional deletes APPLY during the rewrite (a compaction that
    // copied deleted rows into the replacement would resurrect them) and their
    // segments fold away once no live file references them
    val deleted = ManifestTables.deletedPositions(dir, planRefs)

    // pack per partition, in manifest order (stable, deterministic given a snapshot);
    // a file with recorded deletes always packs (even alone): folding the delete is
    // itself the maintenance win
    val rewrites: Seq[Rewrite] = entries.groupBy(_.partition).toSeq.sortBy(_._1)
      .flatMap { case (joined, es) =>
        packBins(es, targetBytes)
          .filter(bin => bin.length >= 2 || bin.exists(e => deleted.contains(e.path)))
          .map { bin =>
            Rewrite(bin, rewriteBin(spark, dir, partCols, dataSchema, joined, bin, deleted))
          }
      }
    if (rewrites.isEmpty) return None

    val replaced: Map[String, ManifestTables.Entry] =
      rewrites.flatMap(r => r.sources.map(e => e.path -> r.replacement)).toMap
    def cleanup(): Unit = rewrites.foreach { r =>
      try Files.deleteIfExists(Paths.get(dir, r.replacement.path))
      catch { case _: Exception => }
    }

    // CAS publication: re-read per attempt so concurrent appends survive; abort if
    // any source file left the table meanwhile (overwrite/delete raced us)
    var attempt = 0
    while (true) {
      val refs = ManifestTables.readSnapshotRefs(dir, None)
      val current = ManifestTables.entriesOf(dir, refs)
      val present = current.map(_.path).toSet
      if (!replaced.keysIterator.forall(present.contains)) {
        cleanup()
        return None // a concurrent overwrite/DELETE removed a source file
      }
      // serializable validation: a positional delete committed AFTER the bins were
      // read would be silently undone if its target file was rewritten from the
      // stale read — abort and let the caller re-run on the fresh state
      val newDels = refs.deletes.filterNot(planRefs.deletes.contains)
      if (newDels.exists(d => ManifestTables.readDeleteSegment(dir, d)
          .keysIterator.exists(replaced.contains))) {
        cleanup()
        return None
      }
      // each source entry collapses into its bin's replacement, emitted once at the
      // position of the bin's FIRST file; everything else carries unchanged
      val emitted = scala.collection.mutable.HashSet.empty[String]
      val newEntries = current.flatMap { e =>
        replaced.get(e.path) match {
          case None => Some(e)
          case Some(rep) => if (emitted.add(rep.path)) Some(rep) else None
        }
      }
      val seg = ManifestTables.writeSegment(dir, newEntries)
      // delete segments fold away once every path they reference left the table
      // (their positions were APPLIED in the rewrites); segments still touching a
      // live (un-rewritten) file carry forward
      val livePaths = newEntries.map(_.path).toSet
      val liveDels = refs.deletes.filter(d =>
        ManifestTables.readDeleteSegment(dir, d).keysIterator.exists(livePaths.contains))
      // pin the target id from the refs already read: a concurrent commit must
      // claim this same id first, failing our CAS (a fresh latest-id read here
      // could silently absorb a commit our entry list never saw)
      val next = refs.snapshot + 1
      if (ManifestTables.tryWriteSnapshotRefs(dir, ManifestTables.readPartitionColumn(dir),
          Nil, Seq(seg), next,
          partTypes = ManifestTables.readPartitionTypes(dir), schemaDdl = refs.schemaDdl,
          deletes = liveDels)) {
        return Some(next)
      }
      attempt += 1
      if (attempt >= 64) { // same bound as the write path: fail loudly, never hang
        cleanup()
        throw new IllegalStateException(s"compaction on $dir lost the snapshot race $attempt times")
      }
      Thread.sleep(math.min(1000L, 20L * attempt) +
        java.util.concurrent.ThreadLocalRandom.current().nextLong(1, 20))
    }
    None // unreachable
  }

  /** SORT-ORDER CLUSTERING rewrite (`rewrite_data_files` with a sort order — the
    * Z-order-lite half of the data-skipping story): every partition's rows are
    * globally re-sorted on `sortCols` and re-landed as ~`targetBytes` files with
    * DISJOINT key ranges, so the per-file min/max stats the scan prunes on become
    * maximally selective. Ingest order rarely matches query order — a table
    * appended by arrival time answers id/time-range queries by opening every
    * file; after clustering, a 1%-of-keyspace predicate opens ~1% of the files.
    * The new files are written by Spark (range repartition + in-partition sort),
    * so their stats derive from the parquet FOOTERS ([[ManifestStats.fromFooter]]);
    * positional deletes apply during the read and fold away; the swap publishes
    * under the same CAS + serializable validation as compaction. Returns the new
    * snapshot id, or None when the table is empty or a concurrent commit
    * invalidated the rewrite.
    */
  def clusterBy(spark: SparkSession, dir: String, sortCols: Seq[String],
      targetBytes: Long): Option[Int] = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    require(sortCols.nonEmpty, "clusterBy needs at least one sort column")
    val partCols = ManifestTables.readPartitionSpec(dir)
    val schema = ManifestDataSource.tableSchema(dir)
    require(schema.nonEmpty, s"no committed schema under $dir — nothing to cluster")
    val dataSchema = StructType(schema.filterNot(f => partCols.exists(_.name == f.name)))
    sortCols.foreach { c =>
      require(dataSchema.fieldNames.contains(c),
        s"sort column '$c' is not a data column of ${dataSchema.simpleString}")
    }
    val planRefs = ManifestTables.readSnapshotRefs(dir, None)
    val entries = ManifestTables.entriesOf(dir, planRefs)
    if (entries.isEmpty) return None
    val deleted = ManifestTables.deletedPositions(dir, planRefs)

    // one rewrite group per partition: all its files -> N range-disjoint files
    val groups: Seq[(Seq[ManifestTables.Entry], Seq[ManifestTables.Entry])] =
      entries.groupBy(_.partition).toSeq.sortBy(_._1).map { case (joined, es) =>
        (es, rewriteClustered(spark, dir, partCols, dataSchema, joined, es, deleted,
          sortCols, targetBytes))
      }
    val sourceToGroup: Map[String, Int] = groups.zipWithIndex.flatMap {
      case ((srcs, _), g) => srcs.map(_.path -> g) }.toMap
    val allSources = sourceToGroup.keySet
    def cleanup(): Unit = groups.foreach(_._2.foreach { e =>
      try Files.deleteIfExists(Paths.get(dir, e.path)) catch { case _: Exception => }
    })

    var attempt = 0
    while (true) {
      val refs = ManifestTables.readSnapshotRefs(dir, None)
      val current = ManifestTables.entriesOf(dir, refs)
      if (!allSources.subsetOf(current.map(_.path).toSet)) {
        cleanup(); return None // concurrent overwrite/DELETE retracted a source
      }
      val newDels = refs.deletes.filterNot(planRefs.deletes.contains)
      if (newDels.exists(d => ManifestTables.readDeleteSegment(dir, d)
          .keysIterator.exists(allSources.contains))) {
        cleanup(); return None // a delete we did not apply landed on a source
      }
      val emitted = scala.collection.mutable.HashSet.empty[Int]
      val newEntries = current.flatMap { e =>
        sourceToGroup.get(e.path) match {
          case None => Seq(e)
          case Some(g) => if (emitted.add(g)) groups(g)._2 else Nil
        }
      }
      val seg = ManifestTables.writeSegment(dir, newEntries)
      val livePaths = newEntries.map(_.path).toSet
      val liveDels = refs.deletes.filter(d =>
        ManifestTables.readDeleteSegment(dir, d).keysIterator.exists(livePaths.contains))
      val next = refs.snapshot + 1 // pin from the refs already read (CAS ordering rule)
      if (ManifestTables.tryWriteSnapshotRefs(dir, ManifestTables.readPartitionColumn(dir),
          Nil, Seq(seg), next,
          partTypes = ManifestTables.readPartitionTypes(dir), schemaDdl = refs.schemaDdl,
          deletes = liveDels)) {
        return Some(next)
      }
      attempt += 1
      if (attempt >= 64) {
        cleanup()
        throw new IllegalStateException(s"clusterBy on $dir lost the snapshot race $attempt times")
      }
      Thread.sleep(math.min(1000L, 20L * attempt) +
        java.util.concurrent.ThreadLocalRandom.current().nextLong(1, 20))
    }
    None // unreachable
  }

  /** One partition's clustered rewrite: global range sort into ~targetBytes
    * files; per-file stats from the written parquet footers.
    */
  private def rewriteClustered(spark: SparkSession, dir: String,
      partCols: Seq[ManifestTables.PartCol], dataSchema: StructType, joined: String,
      files: Seq[ManifestTables.Entry], deleted: Map[String, Array[Long]],
      sortCols: Seq[String], targetBytes: Long): Seq[ManifestTables.Entry] = {
    import org.apache.spark.sql.functions.col
    val uid = java.util.UUID.randomUUID().toString
    val tmpOut = s"$dir/_compact_tmp/$uid"
    val s2 = rewriteSession(spark)
    val nOut = math.max(1, math.ceil(files.map(_.bytes).sum.toDouble / targetBytes).toInt)
    readFilesWithDeletes(s2, dir, dataSchema, files, deleted)
      .repartitionByRange(nOut, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.parquet(tmpOut)
    val w = Files.list(Paths.get(tmpOut))
    val parts = try {
      val it = w.iterator(); val b = Seq.newBuilder[Path]
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if (n.startsWith("part-") && n.endsWith(".parquet")) b += p
      }
      b.result().sortBy(_.getFileName.toString)
    } finally w.close()
    val fields = dataSchema.fields.map(f => (f.name, f.dataType)).toSeq
    val out = parts.zipWithIndex.map { case (p, k) =>
      val rel = partitionDirOf(partCols, joined) + s"cluster-$uid-$k.parquet"
      val target = Paths.get(dir, rel)
      Files.createDirectories(target.getParent)
      Files.move(p, target, StandardCopyOption.ATOMIC_MOVE)
      ManifestTables.Entry(rel, Files.size(target), joined, snapshot = -1,
        stats = ManifestStats.fromFooter(target.toString, fields,
          ManifestDataSource.hadoopConf()))
    }
    deleteRecursively(Paths.get(dir, "_compact_tmp", uid))
    out
  }

  /** Greedy in-order packing: a file at or above the target forms its own bin. */
  private def packBins(es: Seq[ManifestTables.Entry], targetBytes: Long)
      : Seq[Seq[ManifestTables.Entry]] = {
    val bins = scala.collection.mutable.ArrayBuffer.empty[Vector[ManifestTables.Entry]]
    var cur = Vector.empty[ManifestTables.Entry]
    var curBytes = 0L
    es.foreach { e =>
      if (e.bytes >= targetBytes) {
        if (cur.nonEmpty) { bins += cur; cur = Vector.empty; curBytes = 0L }
        bins += Vector(e)
      } else if (cur.nonEmpty && curBytes + e.bytes > targetBytes) {
        bins += cur; cur = Vector(e); curBytes = e.bytes
      } else {
        cur :+= e; curBytes += e.bytes
      }
    }
    if (cur.nonEmpty) bins += cur
    bins.toSeq
  }

  /** Reads one bin with the authoritative data schema and lands it as ONE parquet
    * file inside the partition's directory (unique name; a crash strands only an
    * unreferenced file that removeOrphans reclaims). Spark writes the file so the
    * layout is exactly what the vectorized read path expects; timestamps are forced
    * to INT64 micros (the manifest schema mapping) rather than Spark's INT96 legacy
    * default.
    */
  /** Deletes-aware read of a set of committed files with the authoritative data
    * schema: positional deletes apply DURING the read via the native scan's
    * `_metadata.row_index` — files with deletes read one-at-a-time (positions are
    * per-file), clean files batch together. Shared by compaction and clustering:
    * any maintenance rewrite that skipped this would resurrect deleted rows.
    */
  private def readFilesWithDeletes(s2: SparkSession, dir: String, dataSchema: StructType,
      files: Seq[ManifestTables.Entry],
      deleted: Map[String, Array[Long]]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val (withDels, clean) = files.partition(e => deleted.get(e.path).exists(_.nonEmpty))
    val cleanDf =
      if (clean.isEmpty) None
      else Some(s2.read.schema(dataSchema).parquet(clean.map(e => s"$dir/${e.path}"): _*))
    val delDfs = withDels.map { e =>
      val poss = deleted(e.path).map(java.lang.Long.valueOf).toSeq
      s2.read.schema(dataSchema).parquet(s"$dir/${e.path}")
        .withColumn("__graft_ri", col("_metadata.row_index"))
        .filter(!col("__graft_ri").isin(poss: _*))
        .drop("__graft_ri")
    }
    (cleanDf.toSeq ++ delDfs).reduce(_ unionAll _)
  }

  private def rewriteSession(spark: SparkSession): SparkSession = {
    val s2 = spark.newSession()
    // timestamps forced to INT64 micros (the manifest schema mapping), not
    // Spark's INT96 legacy default
    s2.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    s2
  }

  private def partitionDirOf(partCols: Seq[ManifestTables.PartCol], joined: String): String = {
    val vals = ManifestDataSource.splitPartValues(joined, partCols.length)
    partCols.zip(vals).map { case (pc, v) =>
      s"${pc.name}=${ManifestTables.hiveEscape(v)}/" }.mkString
  }

  private def rewriteBin(spark: SparkSession, dir: String,
      partCols: Seq[ManifestTables.PartCol], dataSchema: StructType,
      joined: String, bin: Seq[ManifestTables.Entry],
      deleted: Map[String, Array[Long]] = Map.empty): ManifestTables.Entry = {
    val uid = java.util.UUID.randomUUID().toString
    val tmpOut = s"$dir/_compact_tmp/$uid"
    val s2 = rewriteSession(spark)
    readFilesWithDeletes(s2, dir, dataSchema, bin, deleted)
      .coalesce(1).write.parquet(tmpOut)
    val part = listOnly(Paths.get(tmpOut), p => {
      val n = p.getFileName.toString
      n.startsWith("part-") && n.endsWith(".parquet")
    })
    val rel = partitionDirOf(partCols, joined) + s"compact-$uid.parquet"
    val target = Paths.get(dir, rel)
    Files.createDirectories(target.getParent)
    Files.move(part, target, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(Paths.get(dir, "_compact_tmp", uid))
    // the compacted file's stats are the MERGE of its inputs' recorded bounds
    // (min of mins, max of maxes) — compaction must not erase data-skipping
    ManifestTables.Entry(rel, Files.size(target), joined, snapshot = -1,
      stats = ManifestStats.merge(bin.map(_.stats),
        dataSchema.fields.map(f => (f.name, f.dataType)).toSeq))
  }

  private def listOnly(dirPath: Path, pred: Path => Boolean): Path = {
    val w = Files.list(dirPath)
    val all = try w.filter(p => pred(p)).toArray(new Array[Path](_)) finally w.close()
    require(all.length == 1, s"expected exactly one part file in $dirPath, got ${all.length}")
    all.head
  }

  private def deleteRecursively(p: Path): Unit = {
    if (!Files.exists(p)) return
    val w = Files.walk(p)
    try w.sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(f => Files.deleteIfExists(f))
    finally w.close()
  }
}
