package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, MessageType, PrimitiveType, Type}
import org.apache.parquet.schema.LogicalTypeAnnotation.{DateLogicalTypeAnnotation, StringLogicalTypeAnnotation, TimestampLogicalTypeAnnotation, TimeUnit}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{
  BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo,
  SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 DATA table over a manifest-committed parquet directory — the sibling
  * of ManifestFilesSource that serves the rows themselves (the Iceberg data-path
  * analog; round 2 shipped only the `.files` metadata table), READ AND WRITE:
  *
  *  - the snapshot is PINNED AT PLAN TIME: the committed file list resolves once on the
  *    driver and ships inside the InputPartitions, so a commit landing mid-query (or
  *    between a task and its retry) can never mix snapshots, and stray uncommitted
  *    files in the directory are invisible;
  *  - ONE InputPartition PER FILE — scan parallelism scales with the snapshot, and a
  *    partition-value filter (EqualTo / In on the manifest's partition column) prunes
  *    whole files at the manifest before any parquet footer is opened
  *    (SupportsPushDownFilters; the pruned file count is visible in the scan
  *    description and in planInputPartitions().length);
  *  - the partition column is served as a REAL column from the manifest's recorded
  *    (raw, Hive-unescaped) value — never re-derived from file paths;
  *  - column pruning reaches the parquet reader (SupportsPushDownRequiredColumns → a
  *    projected read schema, so unread columns are never decoded; a zero-column scan,
  *    e.g. count(*), reads only footer row counts);
  *  - TIME TRAVEL: `.option("snapshot", N)` pins the scan to committed snapshot N —
  *    overwrites are LOGICAL (files drop out of the manifest, not off disk), so every
  *    historical snapshot stays readable;
  *  - WRITES commit a NEW snapshot atomically (temp + ATOMIC_MOVE): append = previous
  *    entries + this write's files, overwrite = this write's files only. Task writers
  *    land parquet under Hive-style `partCol=value/` dirs; a crashed or speculative
  *    task leaves only orphan files no snapshot references — readers can never see a
  *    torn write, the same isolation property the read path enforces.
  *
  * Usage: `spark.read.format("graft.sources.ManifestDataSource").load(dir)` after a
  * `ManifestTables.commit(dir, partCol)` or a DSv2 write
  * (`df.write.format(...).option("partcol", "lang_p").mode("append"|"overwrite").save(dir)`).
  */
class ManifestDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    // a BRANCH read serves the branch head's own schema (main may have evolved
    // since the fork). Tolerant of a missing branch because the WRITE path's
    // options flow through here too (a branch append onto a not-yet-created
    // branch must reach appendToBranch's loud refusal, not die at inference).
    // The null-path guard runs FIRST: .load() with no dir must produce
    // tableSchema's named error, not an NPE out of the branch probe
    Option(options.get("branch"))
      .filter(_ => options.get("path") != null)
      .filter(ManifestTables.branchExists(options.get("path"), _))
      .foreach { b => return ManifestDataSource.branchSchema(options.get("path"), b) }
    // time travel serves the PINNED snapshot's schema (it may predate an ALTER)
    val base = ManifestDataSource.tableSchema(options.get("path"),
      ManifestDataSource.pinFromOptions(options.get("path"), options))
    // changelog relations additionally expose the change-type column
    if (options.getBoolean("changelog", false))
      base.add(StructField(ManifestDataSource.ChangeCol, StringType, nullable = false))
    else base
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val mergeWrite = Seq("mergeSchema", "mergeschema")
      .exists(k => Option(properties.get(k)).exists(_.toBoolean))
    new ManifestDataTable(properties.get("path"), schema, mergeSchemaWrite = mergeWrite)
  }
  override def supportsExternalMetadata(): Boolean = false
}

object ManifestDataSource {

  // memoized per JVM: every per-file reader and writer calls this (one reader per
  // scanned file, one writer per written file), and both `new Configuration()`
  // (XML default-resource load) and `newHadoopConf()` (deep copy) cost ~10-20 ms —
  // measured r06 at ~22 ms per written file, the dominant cost of a 120-file
  // hidden-partition ingest. All callers treat the returned conf as READ-ONLY;
  // the one site that mutates (the id-resolving reader) copies it first. The
  // sandbox runs on default local-FS hadoop settings, so caching the first
  // session's view is lossless.
  /** Parquet InputFile for a manifest data file: java.nio for local paths (one
    * open, no .crc sidecar, ~10x cheaper per file — see NioParquetIO), Hadoop for
    * anything with a URI scheme.
    */
  private[sources] def parquetInput(path: String): org.apache.parquet.io.InputFile =
    if (NioParquetIO.isLocal(path)) NioParquetIO.input(path)
    else HadoopInputFile.fromPath(new Path(path), hadoopConf())

  /** Parquet OutputFile for a manifest data file (see parquetInput). */
  private[sources] def parquetOutput(path: String): org.apache.parquet.io.OutputFile =
    if (NioParquetIO.isLocal(path)) NioParquetIO.output(path)
    else org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(new Path(path), hadoopConf())

  @volatile private var cachedHadoopConf: Configuration = _
  private[sources] def hadoopConf(): Configuration = {
    val c = cachedHadoopConf
    if (c != null) c
    else {
      val fresh = SparkSession.getActiveSession
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new Configuration())
      cachedHadoopConf = fresh
      fresh
    }
  }

  /** Table schema at a snapshot (latest when None): an ALTER-recorded schema DDL on
    * the snapshot wins (schema evolution — files written before the ALTER null-fill
    * the added columns at read time); otherwise the first committed data file's
    * schema + the manifest's partition columns. Derived on the driver at plan time
    * only. EMPTY before the first commit — the write-path bootstrap (the first DSv2
    * write defines the schema); reads of an uncommitted table fail in newScanBuilder.
    */
  private[sources] def tableSchema(dir: String, snapshot: Option[Int] = None): StructType = {
    require(dir != null, "graft.sources.ManifestDataSource requires .load(<table dir>)")
    val latest = ManifestTables.latestSnapshotId(dir)
    if (latest.isEmpty) return new StructType()
    ManifestTables.readSnapshotRefs(dir, snapshot).schemaDdl.foreach { ddl =>
      return ManifestTables.parseSchema(ddl)
    }
    // the latest snapshot may be legitimately EMPTY (empty overwrite); schemas cannot
    // diverge across snapshots (appends/overwrites enforce equality), so fall back to
    // the newest snapshot that still lists a file. Only the VERIFIABLY-empty case
    // falls through (refs with no inline entries and no segments) — a snapshot whose
    // referenced segment is missing is corruption and must fail loudly here, not be
    // silently served from older data
    // only the PINNED history: a pinned read must derive its schema (and its
    // first-file sample) from snapshots at or before the pin — an overwrite that
    // later redefined the partition spec would otherwise leak its data layout
    // into the time-travel schema (duplicate/mislabeled partition columns)
    val entries = ManifestTables.snapshotIds(dir)
      .filter(id => snapshot.forall(id <= _)).reverseIterator
      .map { id =>
        val refs = ManifestTables.readSnapshotRefs(dir, Some(id))
        if (refs.inline.isEmpty && refs.segments.isEmpty) Nil
        else ManifestTables.readSnapshot(dir, Some(id))
      }
      .find(_.nonEmpty).getOrElse(Nil)
    if (entries.isEmpty) return new StructType()
    schemaFromFirstFile(dir, entries, ManifestTables.readPartitionSpec(dir, snapshot))
  }

  /** Parsed existence-DEFAULT constants of a schema: column name -> the value rows
    * in files that PREDATE the column serve at read time (Iceberg v3 default-values
    * analog). Values are catalyst internals except strings, which travel as java
    * Strings (the map ships inside serializable reader factories). The stored text
    * is a constant-folded literal rendered at ALTER/CREATE time; parsed + cast on
    * the DRIVER, failing loudly on anything non-foldable. A NULL default is plain
    * null-fill — dropped here so map membership means "non-null default".
    */
  private[sources] def existenceDefaults(schema: StructType): Map[String, Any] =
    schema.fields.iterator.flatMap { f =>
      if (!f.metadata.contains(ManifestTables.ExistsDefaultKey)) None
      else {
        // Spark's OWN resolution (the one its parquet reader uses for existence
        // defaults): same literal-text convention as the Literal.sql render side,
        // immune to session parser flags like escapedStringLiterals
        val v = org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
          .getExistenceDefaultValue(f)
        if (v == null) None
        else Some(f.name -> (v match {
          case u: UTF8String => u.toString
          case other => other
        }))
      }
    }.toMap

  /** First data file's parquet footer + the spec's identity partition columns —
    * the ONE schema assembly main-chain and branch reads share. Hidden-transform
    * columns never surface (their SOURCE columns are ordinary data columns
    * already present in the footer fields).
    */
  private def schemaFromFirstFile(dir: String, entries: Seq[ManifestTables.Entry],
      spec: Seq[ManifestTables.PartCol]): StructType = {
    val conf = hadoopConf()
    val reader = ParquetFileReader.open(ManifestDataSource.parquetInput(s"$dir/${entries.head.path}"))
    val fileSchema = try reader.getFileMetaData.getSchema finally reader.close()
    StructType(sparkFields(fileSchema) ++ spec.filter(_.transform.isEmpty)
      .map(pc => StructField(pc.name, sparkTypeOf(pc), nullable = false)))
  }

  /** Branch-read schema: the branch head's carried DDL wins (fork-time evolution
    * state); otherwise the first branch entry's parquet footer + the branch's own
    * partition spec — never main's current schema, which may have evolved since
    * the fork.
    */
  private[sources] def branchSchema(dir: String, name: String): StructType = {
    val refs = ManifestTables.readBranchRefs(dir, name)
    refs.schemaDdl.foreach { ddl => return ManifestTables.parseSchema(ddl) }
    val entries = ManifestTables.entriesOf(dir, refs)
    if (entries.isEmpty) return new StructType() // fork of an empty snapshot
    schemaFromFirstFile(dir, entries, ManifestTables.readBranchPartitionSpec(dir, name))
  }

  /** Narrow partition-value types (the production partition-key set). */
  private[sources] def sparkTypeOf(pc: ManifestTables.PartCol): DataType = pc.tpe match {
    case "string" => StringType
    case "int" => IntegerType
    case "date" => DateType
    case other => throw new IllegalArgumentException(s"unsupported partition type $other")
  }

  /** Equality-delete key types (narrow on purpose: the realistic upsert/erasure
    * keys) and their canonical-string codecs.
    */
  private[sources] def eqTypeNameOf(dt: DataType): String = dt match {
    case LongType => "long"
    case IntegerType => "int"
    case StringType => "string"
    case other => throw new IllegalArgumentException(
      s"unsupported equality-delete key type $other (long|int|string)")
  }

  private[sources] def eqDataTypeOf(ctype: String): DataType = ctype match {
    case "long" => LongType
    case "int" => IntegerType
    case "string" => StringType
    case other => throw new IllegalArgumentException(s"unknown equality-delete key type $other")
  }

  private[sources] def partTypeNameOf(name: String, dt: DataType): String = dt match {
    case StringType => "string"
    case IntegerType => "int"
    case DateType => "date"
    case other => throw new IllegalArgumentException(
      s"partition column '$name' has unsupported type $other (string|int|date)")
  }

  /** `.option("partcol", ...)` grammar: comma-joined tokens, each a plain column
    * NAME (identity) or a hidden transform `bucket(n,col)` / `days(col)` /
    * `truncate(w,col)`. Transform partition columns get deterministic synthetic
    * names (`col_bucketN`, `col_day`, `col_truncW`) that live only in manifests and
    * directory layouts — never in the table schema.
    */
  private[sources] def parsePartColOption(opt: String,
      incoming: StructType): Seq[ManifestTables.PartCol] = {
    val Bucket = """bucket\((\d+)\s*,\s*([A-Za-z_][A-Za-z0-9_]*)\)""".r
    val Days = """days\(([A-Za-z_][A-Za-z0-9_]*)\)""".r
    val Hours = """hours\(([A-Za-z_][A-Za-z0-9_]*)\)""".r
    val Months = """months\(([A-Za-z_][A-Za-z0-9_]*)\)""".r
    val Years = """years\(([A-Za-z_][A-Za-z0-9_]*)\)""".r
    val Trunc = """truncate\((\d+)\s*,\s*([A-Za-z_][A-Za-z0-9_]*)\)""".r
    def srcType(src: String, what: String): DataType = {
      val i = incoming.fieldNames.indexOf(src)
      require(i >= 0, s"$what source column '$src' missing from write schema")
      incoming(i).dataType
    }
    // split on TOP-LEVEL commas only (transform arguments contain commas)
    val tokens = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var depth = 0
      val cur = new StringBuilder
      opt.foreach { c =>
        if (c == ',' && depth == 0) { out += cur.toString; cur.clear() }
        else { if (c == '(') depth += 1 else if (c == ')') depth -= 1; cur += c }
      }
      if (cur.nonEmpty) out += cur.toString
      out.toSeq.map(_.trim).filter(_.nonEmpty)
    }
    val spec = tokens.map {
      case Bucket(n, src) =>
        val dt = srcType(src, "bucket")
        require(Seq(LongType, IntegerType, StringType).contains(dt),
          s"bucket source '$src' must be long|int|string, got $dt")
        ManifestTables.PartCol(s"${src}_bucket$n", "int",
          Some(ManifestTables.PartTransform("bucket", n.toInt, src)))
      case Days(src) =>
        val dt = srcType(src, "days")
        require(dt == TimestampType || dt == TimestampNTZType,
          s"days source '$src' must be a timestamp, got $dt")
        ManifestTables.PartCol(s"${src}_day", "date",
          Some(ManifestTables.PartTransform("days", 0, src)))
      case Hours(src) =>
        val dt = srcType(src, "hours")
        require(dt == TimestampType || dt == TimestampNTZType,
          s"hours source '$src' must be a timestamp, got $dt")
        ManifestTables.PartCol(s"${src}_hour", "int",
          Some(ManifestTables.PartTransform("hours", 0, src)))
      case Months(src) =>
        val dt = srcType(src, "months")
        require(dt == TimestampType || dt == TimestampNTZType,
          s"months source '$src' must be a timestamp, got $dt")
        ManifestTables.PartCol(s"${src}_month", "int",
          Some(ManifestTables.PartTransform("months", 0, src)))
      case Years(src) =>
        val dt = srcType(src, "years")
        require(dt == TimestampType || dt == TimestampNTZType,
          s"years source '$src' must be a timestamp, got $dt")
        ManifestTables.PartCol(s"${src}_year", "int",
          Some(ManifestTables.PartTransform("years", 0, src)))
      case Trunc(w, src) =>
        val dt = srcType(src, "truncate")
        require(dt == StringType, s"truncate source '$src' must be string, got $dt")
        ManifestTables.PartCol(s"${src}_trunc$w", "string",
          Some(ManifestTables.PartTransform("trunc", w.toInt, src)))
      case name =>
        require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
          s"malformed partcol token '$name' " +
            "(name | bucket(n,col) | days(col) | hours(col) | months(col) | " +
            "years(col) | truncate(w,col))")
        ManifestTables.PartCol(name, partTypeNameOf(name, srcType(name, "partition")))
    }
    require(spec.map(_.name).distinct.length == spec.length,
      s"duplicate partition column names in '$opt'")
    spec.filter(_.transform.nonEmpty).foreach { pc =>
      require(!incoming.fieldNames.contains(pc.name),
        s"hidden partition column '${pc.name}' collides with a schema column — rename it")
    }
    spec
  }

  /** Canonical manifest string -> the internal datum InternalRow/ColumnVector carry. */
  private[sources] def internalPartValue(tpe: String, v: String): Any = tpe match {
    case "string" => UTF8String.fromString(v)
    case "int" => v.toInt
    case "date" => java.time.LocalDate.parse(v).toEpochDay.toInt
    case other => throw new IllegalArgumentException(s"unsupported partition type $other")
  }

  /** Canonical manifest string of a pushed partition literal when its runtime type
    * matches the column's declared type — the ONE canonicalization both the
    * planning-time pushdown and runtime (DPP) filtering use; a drifted copy would
    * make the two prune differently with no error.
    */
  private[sources] def canonPartValue(partCols: Seq[ManifestTables.PartCol])(
      colName: String, v: Any): Option[String] =
    partCols.find(_.name == colName).flatMap { pc =>
      (pc.tpe, v) match {
        case ("string", s: String) => Some(s)
        case ("int", i: java.lang.Integer) => Some(i.toString)
        case ("date", d: java.sql.Date) => Some(d.toLocalDate.toString)
        case ("date", d: java.time.LocalDate) => Some(d.toString)
        case _ => None
      }
    }

  /** The per-entry joined partition value -> per-column canonical strings (empty
    * trailing values preserved; single-column tables carry the raw value unjoined).
    */
  private[sources] def splitPartValues(joined: String, n: Int): Seq[String] =
    if (n <= 1) Seq(joined)
    else {
      val parts = joined.split(ManifestTables.PartSep.toString, -1).toSeq
      require(parts.length == n, s"entry partition value has ${parts.length} parts, expected $n")
      parts
    }

  /** Name of the file-provenance METADATA column: `SELECT _file, * FROM t` shows
    * which manifest file each row came from, and the copy-on-write row-level
    * operations use it as the group identifier (runtime group filtering rewrites
    * only files that actually contain matching rows). Served as a per-file
    * constant vector — provenance costs zero decode.
    */
  private[sources] val FileCol = "_file"

  /** Name of the row-POSITION metadata column: a row's ordinal within its data
    * file. `(_file, _pos)` is the stable row identity merge-on-read positional
    * deletes key on (the delta row-level operation's rowId). Serving `_pos`
    * forces the row-mode read path (it is a running counter, not a per-file
    * constant) — only delete-planning scans and explicit provenance queries
    * project it, so the columnar fast path is undisturbed.
    */
  private[sources] val PosCol = "_pos"

  /** Name of the CHANGELOG change-type column ("insert" | "delete"), present only
    * on changelog relations (`.option("changelog", "true")` + `startSnapshot`).
    * Served as a per-InputPartition constant — a whole file's delta rows share one
    * change type, so the column costs zero decode (same mechanism as partition
    * values and `_file`).
    */
  private[sources] val ChangeCol = "_change_type"

  /** External value of a V2 literal (they carry catalyst-internal values:
    * UTF8String, epoch-day Int) -> the canonical manifest string, via the ONE
    * canonicalizer (canonPartValue) that owns the type rules for pushdown, DPP,
    * the writer, and DELETE alike.
    */
  private[sources] def canonV2Literal(partCols: Seq[ManifestTables.PartCol])(
      colName: String, l: org.apache.spark.sql.connector.expressions.Literal[_])
      : Option[String] = {
    val external: Any = (l.dataType(), l.value()) match {
      case (StringType, v) => v.toString
      case (IntegerType, v: java.lang.Integer) => v
      case (DateType, v: java.lang.Integer) =>
        java.time.LocalDate.ofEpochDay(v.longValue())
      case (_, v) => v
    }
    canonPartValue(partCols)(colName, external)
  }

  /** A V2 predicate absorbable as a partition-value bound: `=` or `IN` over ONE
    * partition column with type-matching literal operand(s) -> the column and its
    * allowed canonical values. The SINGLE absorption rule the scan's pushdown and
    * the table's DELETE share — a drifted copy would let DELETE accept a predicate
    * the scan prunes differently.
    */
  private[sources] def partitionBound(partCols: Seq[ManifestTables.PartCol])(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[(String, Set[String])] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    type LV[T] = org.apache.spark.sql.connector.expressions.Literal[T]
    val canon = canonV2Literal(partCols) _
    (p.name(), p.children()) match {
      case ("=", Array(r: NamedReference, l: LV[_])) if r.fieldNames.length == 1 =>
        canon(r.fieldNames.head, l).map(v => (r.fieldNames.head, Set(v)))
      case ("=", Array(l: LV[_], r: NamedReference)) if r.fieldNames.length == 1 =>
        canon(r.fieldNames.head, l).map(v => (r.fieldNames.head, Set(v)))
      case ("IN", children) if children.length >= 2 =>
        children.head match {
          case r: NamedReference if r.fieldNames.length == 1 &&
              children.tail.forall(_.isInstanceOf[LV[_]]) =>
            val canoned = children.tail.map(c => canon(r.fieldNames.head, c.asInstanceOf[LV[_]]))
            if (canoned.forall(_.isDefined)) Some((r.fieldNames.head, canoned.flatten.toSet))
            else None
          case _ => None
        }
      case _ => None
    }
  }

  /** Does an entry's (joined) partition value satisfy every per-column bound?
    * Empty bounds = no constraint = every entry satisfies — which reads as "keep
    * all" on the scan side and "an unconstrained conjunction is TRUE" on the
    * DELETE side; both are the same statement.
    */
  private[sources] def entryWithinBounds(partCols: Seq[ManifestTables.PartCol],
      bounds: Map[String, Set[String]])(e: ManifestTables.Entry): Boolean =
    entryWithinBoundsBy(_ => partCols, bounds)(e)

  /** Partition-EVOLUTION-aware bounds check: each entry's value is read under its
    * OWN spec (ManifestTables.specResolver), and a bound on a column the entry's
    * spec lacks keeps the entry — its files predate the field, their rows may
    * match, and the residual predicate decides. Identity columns exist in every
    * spec (the identity set is immutable under evolution), so identity bounds
    * stay whole-file-exact; hidden-transform bounds only ever REDUCE.
    */
  private[sources] def entryWithinBoundsBy(
      specOf: ManifestTables.Entry => Seq[ManifestTables.PartCol],
      bounds: Map[String, Set[String]])(e: ManifestTables.Entry): Boolean =
    bounds.isEmpty || {
      val pcs = specOf(e)
      val vals = splitPartValues(e.partition, pcs.length)
      pcs.zipWithIndex.forall { case (pc, i) =>
        bounds.get(pc.name).forall(_.contains(vals(i)))
      }
    }

  /** Does an entry's partition value satisfy every DAY-RANGE bound (hidden `days`
    * partitioning: a residual `ts >= T` predicate prunes files whose day lies
    * wholly before T's day)? Bounds are (column name, ">="|"<=", epoch day); a
    * malformed recorded value answers true (never prune on doubt).
    */
  private[sources] def entryWithinDayRanges(partCols: Seq[ManifestTables.PartCol],
      ranges: Seq[(String, String, Long)])(e: ManifestTables.Entry): Boolean =
    entryWithinDayRangesBy(_ => partCols, ranges)(e)

  /** Evolution-aware day-range check — already name-keyed, so an entry whose spec
    * predates the days() field simply finds no index and stays (never prune on a
    * field the file was not routed by).
    */
  private[sources] def entryWithinDayRangesBy(
      specOf: ManifestTables.Entry => Seq[ManifestTables.PartCol],
      ranges: Seq[(String, String, Long)])(e: ManifestTables.Entry): Boolean =
    ranges.isEmpty || {
      val pcs = specOf(e)
      val vals = splitPartValues(e.partition, pcs.length)
      ranges.forall { case (name, op, bound) =>
        val i = pcs.indexWhere(_.name == name)
        if (i < 0) true
        else {
          // the recorded value parses in the transform's OWN unit: a date string
          // for days(), an integer for hours()/months(); malformed -> keep
          // (never prune on doubt)
          val v: Option[Long] =
            try pcs(i).transform.map(_.kind) match {
              case Some("days") => Some(java.time.LocalDate.parse(vals(i)).toEpochDay)
              case Some("hours") | Some("months") | Some("years") => Some(vals(i).toLong)
              case _ => None
            } catch {
              case _: java.time.format.DateTimeParseException => None
              case _: NumberFormatException => None
            }
          v.forall(d =>
            op match { case ">=" => d >= bound; case "<=" => d <= bound; case _ => true })
        }
      }
    }

  /** Canonical partition value a hidden transform maps one SOURCE-column literal
    * to, across every encoding Spark hands us: catalyst-internal V2 literal values
    * (UTF8String, Long micros) and external V1 runtime-filter values (String,
    * java.sql.Timestamp/Instant). None = the value's type doesn't fit the
    * transform — contribute no bound (never prune on doubt).
    */
  private[sources] def transformCanonOf(pc: ManifestTables.PartCol, value: Any): Option[String] = {
    import ManifestTables.PartTransforms._
    pc.transform.flatMap { t =>
      t.kind match {
        case "bucket" => value match {
          case l: java.lang.Long => Some(bucketLong(l.longValue(), t.param).toString)
          case i: java.lang.Integer => Some(bucketLong(i.longValue(), t.param).toString)
          case s: String => Some(bucketString(s, t.param).toString)
          case u: UTF8String => Some(bucketString(u.toString, t.param).toString)
          case _ => None
        }
        case "days" =>
          epochDayOfValue(value).map(d => java.time.LocalDate.ofEpochDay(d).toString)
        case "hours" => epochHourOfValue(value).map(_.toString)
        case "months" => epochMonthOfValue(value).map(_.toString)
        case "years" => epochYearOfValue(value).map(_.toString)
        case "trunc" => value match {
          case s: String => Some(truncString(s, t.param))
          case u: UTF8String => Some(truncString(u.toString, t.param))
          case _ => None
        }
        case _ => None
      }
    }
  }

  /** UTC epoch day of a timestamp literal: catalyst micros (V2), Timestamp/Instant
    * (V1 runtime filters), LocalDateTime (NTZ externals). days() buckets by UTC day
    * on both the write and prune sides, so session timezones never skew pruning.
    */
  private[sources] def epochDayOfValue(v: Any): Option[Long] = v match {
    case l: java.lang.Long => Some(ManifestTables.PartTransforms.epochDayOfMicros(l.longValue()))
    case ts: java.sql.Timestamp => Some(Math.floorDiv(ts.getTime, 86400000L))
    case i: java.time.Instant => Some(Math.floorDiv(i.toEpochMilli, 86400000L))
    case ldt: java.time.LocalDateTime => Some(ldt.toLocalDate.toEpochDay)
    case _ => None
  }

  /** Whole hours since epoch of a timestamp literal (hours() pruning unit). */
  private[sources] def epochHourOfValue(v: Any): Option[Long] = v match {
    case l: java.lang.Long => Some(ManifestTables.PartTransforms.epochHourOfMicros(l.longValue()))
    case ts: java.sql.Timestamp => Some(Math.floorDiv(ts.getTime, 3600000L))
    case i: java.time.Instant => Some(Math.floorDiv(i.toEpochMilli, 3600000L))
    case ldt: java.time.LocalDateTime =>
      Some(Math.floorDiv(ldt.toEpochSecond(java.time.ZoneOffset.UTC), 3600L))
    case _ => None
  }

  /** Months since epoch of a timestamp literal (months() pruning unit). */
  private[sources] def epochMonthOfValue(v: Any): Option[Long] =
    epochDayOfValue(v).map(d =>
      ManifestTables.PartTransforms.monthsSinceEpoch(java.time.LocalDate.ofEpochDay(d)))

  /** Years since epoch of a timestamp literal (years() pruning unit). */
  private[sources] def epochYearOfValue(v: Any): Option[Long] =
    epochDayOfValue(v).map(d =>
      ManifestTables.PartTransforms.yearsSinceEpoch(java.time.LocalDate.ofEpochDay(d)))

  /** `=`/`IN` over a hidden transform's SOURCE column -> exact partition-value
    * bounds on the TRANSFORM column (one per transform fed by that source). The
    * predicate itself stays RESIDUAL — the transform is lossy (bucket collisions,
    * shared truncation prefixes, many timestamps per day), so this only ever
    * REMOVES files that provably hold no matching row.
    */
  private[sources] def hiddenEqBounds(partCols: Seq[ManifestTables.PartCol])(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Seq[(String, Set[String])] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    type LV[T] = org.apache.spark.sql.connector.expressions.Literal[T]
    val bySrc = partCols.filter(_.transform.nonEmpty).groupBy(_.transform.get.src)
    if (bySrc.isEmpty) return Nil
    def boundsOf(col: String, values: Seq[Any]): Seq[(String, Set[String])] =
      bySrc.getOrElse(col, Nil).flatMap { pc =>
        val canoned = values.map(v => transformCanonOf(pc, v))
        // a single untransformable literal voids the whole IN bound for this column
        if (canoned.nonEmpty && canoned.forall(_.isDefined))
          Some(pc.name -> canoned.flatten.toSet)
        else None
      }
    (p.name(), p.children()) match {
      case ("=", Array(r: NamedReference, l: LV[_]))
          if r.fieldNames.length == 1 && l.value() != null =>
        boundsOf(r.fieldNames.head, Seq(l.value()))
      case ("=", Array(l: LV[_], r: NamedReference))
          if r.fieldNames.length == 1 && l.value() != null =>
        boundsOf(r.fieldNames.head, Seq(l.value()))
      case ("IN", children) if children.length >= 2 =>
        children.head match {
          case r: NamedReference if r.fieldNames.length == 1 &&
              children.tail.forall(c => c.isInstanceOf[LV[_]] &&
                c.asInstanceOf[LV[_]].value() != null) =>
            boundsOf(r.fieldNames.head, children.tail.map(_.asInstanceOf[LV[_]].value()).toSeq)
          case _ => Nil
        }
      case _ => Nil
    }
  }

  /** Range comparisons over a time transform's (`days`/`hours`/`months`) timestamp
    * source -> range bounds on the hidden column IN THE TRANSFORM'S OWN UNIT:
    * `ts >= T` prunes files whose unit lies wholly before T's (`>` likewise —
    * rows above T can only live in unit(T) or later), `ts <[=] T` prunes units
    * after T's. Also residual-only, same lossiness rule.
    */
  private[sources] def hiddenDayRanges(partCols: Seq[ManifestTables.PartCol])(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Seq[(String, String, Long)] = {
    import org.apache.spark.sql.connector.expressions.{Expression, NamedReference}
    type LV[T] = org.apache.spark.sql.connector.expressions.Literal[T]
    val timeKinds = Set("days", "hours", "months", "years")
    val dayCols = partCols.filter(_.transform.exists(t => timeKinds.contains(t.kind)))
    if (dayCols.isEmpty) return Nil
    def refOf(e: Expression): Option[String] = e match {
      case r: NamedReference if r.fieldNames.length == 1 => Some(r.fieldNames.head)
      case _ => None
    }
    def unitOf(kind: String, v: Any): Option[Long] = kind match {
      case "days" => epochDayOfValue(v)
      case "hours" => epochHourOfValue(v)
      case "months" => epochMonthOfValue(v)
      case _ => epochYearOfValue(v)
    }
    def mk(col: String, op: String, v: Any): Seq[(String, String, Long)] =
      dayCols.filter(_.transform.get.src == col).flatMap { pc =>
        unitOf(pc.transform.get.kind, v).map { d =>
          val dayOp = op match { case ">" | ">=" => ">="; case _ => "<=" }
          (pc.name, dayOp, d)
        }
      }
    (p.name(), p.children()) match {
      case (op @ ("<" | "<=" | ">" | ">="), Array(a, b)) =>
        (refOf(a), b) match {
          case (Some(c), l: LV[_]) if l.value() != null => mk(c, op, l.value())
          case _ => (a, refOf(b)) match {
            case (l: LV[_], Some(c)) if l.value() != null =>
              val flipped = op match {
                case "<" => ">"; case "<=" => ">="; case ">" => "<"; case ">=" => "<="
              }
              mk(c, flipped, l.value())
            case _ => Nil
          }
        }
      case _ => Nil
    }
  }

  /** The snapshot pin a reader's options request: `snapshot` (id or tag) or
    * `asOfTimestamp` (epoch ms, latest snapshot at or before it); both at once is
    * ambiguous and refused.
    */
  private[sources] def pinFromOptions(dir: String,
      options: CaseInsensitiveStringMap): Option[Int] = {
    val byVersion = Option(options.get("snapshot"))
    val byTime = Option(options.get("asOfTimestamp"))
    val byWap = Option(options.get("wapId"))
    require(byVersion.isEmpty || byTime.isEmpty,
      "set either snapshot or asOfTimestamp, not both")
    require(byWap.isEmpty || (byVersion.isEmpty && byTime.isEmpty),
      "a wapId audit read pins its OWN parent snapshot — do not also set " +
        "snapshot/asOfTimestamp")
    byVersion.map(ManifestTables.resolveVersion(dir, _))
      .orElse(byTime.map(t => ManifestTables.requireTimestampMs(dir, t.toLong)))
      // AUDIT read (WAP): pin the staged write's recorded parent, so the view is
      // "the table as the publish would make it" and stays REPEATABLE even while
      // unrelated commits land between stage and audit. Tolerant of a MISSING
      // staged head because the WRITE path's options flow through here too
      // (inferSchema runs before the stage exists); a typo'd wapId on a read
      // still fails loudly in newScanBuilder's strict readStaged.
      .orElse(byWap.filter(ManifestTables.stagedExists(dir, _))
        .map(ManifestTables.readStagedParent(dir, _)))
  }

  /** An entry's typed partition-value tuple (storage-partitioned-join grouping key). */
  private[sources] def keyDatums(partCols: Seq[ManifestTables.PartCol],
      e: ManifestTables.Entry): Array[Any] = {
    val vals = splitPartValues(e.partition, partCols.length)
    partCols.zipWithIndex.map { case (pc, i) =>
      internalPartValue(pc.tpe, vals(i)) }.toArray
  }

  /** An entry's partition values re-laid-out under the SCAN's spec, so the reader
    * factories (which split by the scan spec's length) serve every file correctly
    * across partition evolution. Identity columns resolve by NAME — the identity
    * set is immutable under evolution, so a missing one is format corruption, not
    * a legal state. Hidden fields the entry's spec lacks serve as "" placeholders:
    * hidden columns are never in the table schema, so no reader ever decodes them.
    * Entries already under the scan spec pass through verbatim.
    */
  private[sources] def normalizePartition(
      specOf: ManifestTables.Entry => Seq[ManifestTables.PartCol],
      scanSpec: Seq[ManifestTables.PartCol])(e: ManifestTables.Entry): String = {
    val pcs = specOf(e)
    if (pcs == scanSpec) e.partition
    else {
      val byName = pcs.map(_.name).zip(splitPartValues(e.partition, pcs.length)).toMap
      scanSpec.map { pc =>
        byName.get(pc.name) match {
          case Some(v) => v
          case None =>
            require(pc.transform.nonEmpty,
              s"identity partition column '${pc.name}' missing from file " +
                s"${e.path}'s spec '${pcs.map(ManifestTables.specTokenOf).mkString(",")}' — " +
                "the identity set is immutable under evolution")
            ""
        }
      }.mkString(ManifestTables.PartSep.toString)
    }
  }

  /** Evolution-aware SPJ key tuple: complete under the scan spec, or EMPTY when
    * the entry's spec lacks any scan-spec field (no honest grouping key exists —
    * and the scan only claims KeyGroupedPartitioning over a single-spec file set,
    * so an empty tuple is never consulted).
    */
  private[sources] def keyDatumsBy(
      specOf: ManifestTables.Entry => Seq[ManifestTables.PartCol],
      scanSpec: Seq[ManifestTables.PartCol])(e: ManifestTables.Entry): Array[Any] = {
    val pcs = specOf(e)
    if (pcs == scanSpec) keyDatums(scanSpec, e)
    else {
      val byName = pcs.map(_.name).zip(splitPartValues(e.partition, pcs.length)).toMap
      if (scanSpec.forall(pc => byName.contains(pc.name)))
        scanSpec.map(pc => internalPartValue(pc.tpe, byName(pc.name))).toArray
      else Array.empty
    }
  }

  /** The file paths already present at `start`, validated against an end snapshot's
    * refs so an incremental read (batch `startSnapshot` option, streaming offset
    * pair) is well-defined: every baseline file must still be referenced at the end
    * (otherwise an overwrite/compaction/row-level rewrite replaced data in the range
    * and a file-level diff would drop or duplicate rows), and the range must carry
    * no NEW merge-on-read delete segments (removed rows would be resurrected).
    * Returns the baseline path set to subtract.
    */
  private[sources] def incrementalBaseline(dir: String, start: Int,
      endRefs: ManifestTables.SnapshotRefs, endPaths: Set[String]): Set[String] = {
    require(start <= endRefs.snapshot,
      s"startSnapshot $start is after the read snapshot ${endRefs.snapshot}")
    // empty range: nothing appended — no guards needed, serve zero files
    if (start == endRefs.snapshot) return endPaths
    val startRefs = ManifestTables.readSnapshotRefs(dir, Some(start))
    require(startRefs.deletes.toSet == endRefs.deletes.toSet &&
        startRefs.eqDeletes.toSet == endRefs.eqDeletes.toSet,
      s"incremental read over ($start, ${endRefs.snapshot}] is not append-only: " +
        "merge-on-read delete segments changed in the range (row removals cannot " +
        "be represented as a file-level delta) — compact first or read full snapshots")
    val baseline = ManifestTables.entriesOf(dir, startRefs).map(_.path).toSet
    val removed = baseline -- endPaths
    require(removed.isEmpty,
      s"incremental read over ($start, ${endRefs.snapshot}] is not append-only: " +
        s"${removed.size} baseline file(s) were replaced or removed in the range " +
        s"(e.g. ${removed.toSeq.sorted.take(3).mkString(", ")}) — an overwrite, " +
        "compaction or row-level rewrite happened; read full snapshots instead")
    baseline
  }

  /** CHANGELOG diff over (start, end]: the baseline path set (same append-only file
    * guard as `incrementalBaseline`) PLUS the net-new merge-on-read deleted
    * positions per file — the rows that left the table in the range. Unlike the
    * plain incremental read, delete-segment GROWTH is consumed (it becomes delete
    * rows), but a segment DISAPPEARING still refuses: only a rewrite (compaction /
    * copy-on-write) folds segments, and rewrites already fail the file guard.
    */
  private[sources] def changelogDiff(dir: String, start: Int,
      endRefs: ManifestTables.SnapshotRefs, endPaths: Set[String],
      endDeleted: Map[String, Array[Long]]): (Set[String], Map[String, Array[Long]]) = {
    require(start <= endRefs.snapshot,
      s"startSnapshot $start is after the read snapshot ${endRefs.snapshot}")
    if (start == endRefs.snapshot) return (endPaths, Map.empty)
    val startRefs = ManifestTables.readSnapshotRefs(dir, Some(start))
    require(startRefs.deletes.toSet.subsetOf(endRefs.deletes.toSet),
      s"changelog read over ($start, ${endRefs.snapshot}] is not representable: " +
        "delete segments vanished in the range (a rewrite folded them) — " +
        "read full snapshots instead")
    // equality deletes carry no positions — surfacing them as delete rows would
    // need a key-match scan of every older file, which is exactly the cost the
    // format avoids; a changelog over an eq-delete range refuses instead
    require(startRefs.eqDeletes.toSet == endRefs.eqDeletes.toSet,
      s"changelog read over ($start, ${endRefs.snapshot}] is not representable: " +
        "equality-delete segments changed in the range (key deletes carry no row " +
        "positions) — compact first or read full snapshots")
    val baseline = ManifestTables.entriesOf(dir, startRefs).map(_.path).toSet
    val removed = baseline -- endPaths
    require(removed.isEmpty,
      s"changelog read over ($start, ${endRefs.snapshot}] is not representable: " +
        s"${removed.size} baseline file(s) were replaced or removed in the range " +
        s"(e.g. ${removed.toSeq.sorted.take(3).mkString(", ")}) — an overwrite, " +
        "compaction or copy-on-write rewrite happened; read full snapshots instead")
    val before = ManifestTables.deletedPositions(dir, startRefs)
    (baseline, newDeletePositions(before, endDeleted))
  }

  /** Per-file positions present in `after` but not `before` — the rows removed in
    * the transition. THE one diff both the changelog fast path and the streaming
    * transition walk use; results stay sorted (readers binary-search them).
    */
  private[sources] def newDeletePositions(before: Map[String, Array[Long]],
      after: Map[String, Array[Long]]): Map[String, Array[Long]] =
    after.flatMap { case (path, poss) =>
      val old = before.get(path).map(_.toSet).getOrElse(Set.empty)
      val added = poss.filterNot(old.contains).sorted
      if (added.isEmpty) None else Some(path -> added)
    }

  /** parquet MessageType -> Spark fields: primitives (long/int/double/float/boolean/
    * string/binary/date/timestamp) plus LIST-of-primitive (the embeddings table's
    * array<float>, standard 3-level layout). Anything else fails loudly rather than
    * mis-reading.
    */
  private def sparkFields(mt: MessageType): Seq[StructField] =
    mt.getFields.asScala.toSeq.map { f =>
      val dt =
        if (f.isPrimitive) primitiveSparkType(f.asPrimitiveType())
        else f.getLogicalTypeAnnotation match {
          case _: LogicalTypeAnnotation.ListLogicalTypeAnnotation =>
            // standard 3-level list: group (LIST) { repeated group list { <element> } }
            val repeated = f.asGroupType().getType(0).asGroupType()
            val element = repeated.getType(0)
            require(element.isPrimitive,
              s"ManifestDataSource supports arrays of primitives; got $f")
            ArrayType(primitiveSparkType(element.asPrimitiveType()),
              containsNull = element.getRepetition != Type.Repetition.REQUIRED)
          case _ =>
            throw new IllegalArgumentException(
              s"ManifestDataSource supports primitive and array-of-primitive schemas; got $f")
        }
      StructField(f.getName, dt, nullable = f.getRepetition != Type.Repetition.REQUIRED)
    }

  private def primitiveSparkType(p: PrimitiveType): DataType =
    p.getPrimitiveTypeName match {
      case INT64 => p.getLogicalTypeAnnotation match {
        case ts: TimestampLogicalTypeAnnotation if ts.getUnit == TimeUnit.MICROS =>
          if (ts.isAdjustedToUTC) TimestampType else TimestampNTZType
        case _ => LongType
      }
      case INT32 => p.getLogicalTypeAnnotation match {
        case _: DateLogicalTypeAnnotation => DateType
        case _ => IntegerType
      }
      case DOUBLE => DoubleType
      case FLOAT => FloatType
      case BOOLEAN => BooleanType
      case BINARY => p.getLogicalTypeAnnotation match {
        case _: StringLogicalTypeAnnotation => StringType
        case _ => BinaryType
      }
      case other =>
        throw new IllegalArgumentException(
          s"ManifestDataSource: unsupported parquet type $other for field ${p.getName}")
    }
}

private[sources] class ManifestDataTable(dir: String, tschema: StructType,
    pinnedSnapshot: Option[Int] = None, mergeSchemaWrite: Boolean = false,
    pinnedBranch: Option[String] = None)
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDeleteV2
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.TruncatableTable {
  require(dir != null, "graft.sources.ManifestDataSource requires .load(<table dir>)")

  /** SQL `TRUNCATE TABLE`: publishes an EMPTY snapshot — a metadata-only commit (no
    * data file read, rewritten, or removed; time travel keeps every pre-truncate
    * snapshot readable; reclamation stays with expireSnapshots/removeOrphans, the
    * overwrite lifecycle). The current schema DDL rides in the snapshot explicitly:
    * a truncated table has no data file left to infer its schema from. Partition
    * spec and column-id registry carry forward, so the next append re-joins the
    * same layout and evolution history. Pending merge-on-read delete segments drop
    * with the rows they applied to.
    */
  override def truncateTable(): Boolean = {
    require(pinnedSnapshot.isEmpty && pinnedBranch.isEmpty,
      "TRUNCATE TABLE is not allowed on a time-travel or branch (VERSION AS OF) relation")
    var attempt = 0
    var done = false
    while (!done) {
      // ONE latest read per attempt (the ALTER discipline): spec, schema, and the
      // CAS target all derive from the same pinned refs, so a concurrent commit
      // can only make the CAS fail and re-enter — never straddle
      val refs = ManifestTables.readSnapshotRefs(dir, None)
      val spec = ManifestTables.readPartitionSpec(dir, Some(refs.snapshot))
      // schema from the SAME pinned snapshot, not from load-time tschema: a
      // concurrent overwrite may have redefined the schema since this relation
      // was resolved, and stamping the stale DDL would silently revert it
      val ddl = refs.schemaDdl.getOrElse(ManifestTables.renderSchema(
        ManifestDataSource.tableSchema(dir, Some(refs.snapshot))))
      done = ManifestTables.tryWriteSnapshotRefs(dir, spec.map(_.name).mkString(","),
        Nil, Nil, refs.snapshot + 1,
        partTypes = spec.map(ManifestTables.typeTokenOf).mkString(","),
        schemaDdl = Some(ddl), colIds = refs.colIds, operation = "truncate")
      if (!done) {
        attempt += 1
        require(attempt < 16, s"TRUNCATE TABLE on $dir lost the snapshot race $attempt times")
        Thread.sleep(20L * attempt +
          java.util.concurrent.ThreadLocalRandom.current().nextLong(1, 20))
      }
    }
    true
  }

  /** `SHOW TBLPROPERTIES` / DESCRIBE surface: format, snapshot ids, and the
    * partition spec in the `partcol` option grammar (paste-able back into a write).
    */
  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    m.put("format", "graft-manifest/parquet")
    ManifestTables.latestSnapshotId(dir).foreach { id =>
      m.put("current-snapshot-id", id.toString)
      val spec = pinnedBranch
        .map(b => ManifestTables.readBranchPartitionSpec(dir, b))
        .getOrElse(ManifestTables.readPartitionSpec(dir, pinnedSnapshot))
      if (spec.nonEmpty)
        m.put("partition-spec", spec.map(ManifestTables.specTokenOf).mkString(","))
    }
    pinnedSnapshot.foreach(id => m.put("pinned-snapshot-id", id.toString))
    pinnedBranch.foreach(b => m.put("pinned-branch", b))
    m
  }

  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = ManifestDataSource.FileCol
        override def dataType(): DataType = StringType
        override def isNullable: Boolean = false
        override def comment(): String =
          "manifest-relative path of the data file this row came from"
      },
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = ManifestDataSource.PosCol
        override def dataType(): DataType = LongType
        override def isNullable: Boolean = false
        override def comment(): String =
          "row position within its data file (merge-on-read delete identity)"
      })

  /** Copy-on-write row-level operations (DELETE/UPDATE/MERGE with arbitrary row
    * predicates): Spark's group-based rewrite reads the affected files through the
    * operation's scan, recomputes their surviving/updated rows plan-side, and this
    * connector swaps exactly those files for the rewritten ones in one atomic
    * snapshot commit. Partition-predicate DELETEs never get here — Spark's
    * OptimizeMetadataOnlyDeleteFromTable routes them back to the metadata-only
    * SupportsDeleteV2 path above.
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(pinnedSnapshot.isEmpty && pinnedBranch.isEmpty,
      "row-level operations are not allowed on a time-travel or branch " +
        "(VERSION AS OF) relation — write to the branch with .option(\"branch\", name)")
    // session opt-in: DELETE/UPDATE as a merge-on-read delta (O(matches) commit,
    // no touched file rewritten — DELETE records positions only, UPDATE records
    // positions + lands replacement rows as ordinary appends) instead of the
    // copy-on-write default; MERGE always copy-on-write (its matched/unmatched
    // split needs the group protocol's cardinality handling)
    import org.apache.spark.sql.connector.write.RowLevelOperation.Command
    def conf(key: String): String = org.apache.spark.sql.SparkSession.active.conf
      .get(key, "copy-on-write")
    val mergeOnRead = (info.command() == Command.DELETE &&
        conf("spark.graft.manifest.deleteMode") == "merge-on-read") ||
      (info.command() == Command.UPDATE &&
        conf("spark.graft.manifest.updateMode") == "merge-on-read")
    () =>
      if (mergeOnRead) new ManifestDeltaOperation(dir, info.command())
      else new ManifestRowLevelOperation(dir, info.command())
  }
  override def name(): String = s"manifest_data($dir)"
  override def schema(): StructType = tschema
  // ACCEPT_ANY_SCHEMA only while BOOTSTRAPPING (no schema yet): Spark's built-in
  // check would reject the first write into an empty table. Once a schema exists the
  // capability is withheld so Spark resolves/coerces writes against it — which is
  // what makes `INSERT INTO catalog.ns.t VALUES (...)` rename positional columns to
  // the table's names; newWriteBuilder still re-checks as defense in depth.
  override def capabilities(): util.Set[TableCapability] = {
    val caps = util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ, TableCapability.TRUNCATE)
    // ...and for an explicit mergeSchema write (path API): Spark's arity check
    // would reject the NEW column before the builder can turn it into an ADD;
    // the builder still requires every existing column to match exactly
    if (tschema.isEmpty || mergeSchemaWrite) caps.add(TableCapability.ACCEPT_ANY_SCHEMA)
    caps
  }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    require(ManifestTables.latestSnapshotId(dir).isDefined,
      s"no committed snapshot under $dir — write or commit first")
    // time travel: .option("snapshot", <id or tag>) or .option("asOfTimestamp",
    // <epoch ms>) — or a catalog-level pin from SQL's VERSION/TIMESTAMP AS OF
    val snapshot =
      ManifestDataSource.pinFromOptions(dir, options).orElse(pinnedSnapshot)
    // incremental read: .option("startSnapshot", <id or tag>) or
    // .option("startTimestamp", <epoch ms> — "everything since that instant")
    // serves only the files APPENDED strictly after that point (Iceberg
    // incremental-scan analog); for a streaming read it is the initial offset
    val byVersion = Option(options.get("startSnapshot"))
    val byTime = Option(options.get("startTimestamp"))
    require(byVersion.isEmpty || byTime.isEmpty,
      "set either startSnapshot or startTimestamp, not both")
    // a startTimestamp predating the table's full retained history means "no
    // baseline" (the delta is the whole table)
    val startSnapshot = byVersion.map(ManifestTables.resolveVersion(dir, _))
      .orElse(byTime.flatMap(t => ManifestTables.resolveStartTimestampMs(dir, t.toLong)))
    // CDC changelog: rows changed in (startSnapshot, snapshot] with a _change_type
    // column — appends surface as inserts, merge-on-read deletions as deletes.
    // A BATCH changelog needs startSnapshot (checked at toBatch); a STREAMING
    // changelog without one starts with a state load and follows changes forever.
    val changelog = options.getBoolean("changelog", false)
    // AUDIT read of a staged (WAP) write: the pinned snapshot is the staged
    // parent (pinFromOptions), and the delta entries ride as EXTRA inline
    // entries of the pinned refs — stamped one sequence past the parent so the
    // parent's equality-delete segments never apply to them (they are logically
    // the next commit). File-diff views are undefined over an unpublished delta,
    // so incremental/changelog reads refuse the combination.
    val stagedExtra: Seq[ManifestTables.Entry] =
      Option(options.get("wapId")).map { w =>
        require(startSnapshot.isEmpty && !changelog,
          "incremental/changelog reads cannot combine with a wapId audit read")
        val st = ManifestTables.readStaged(dir, w)
        st.entries.map(e => e.copy(snapshot = st.parent + 1, seq = st.parent + 1))
      }.getOrElse(Nil)
    // BRANCH read: pin the branch head's refs and spec at plan time (branch
    // snapshot files are immutable, so the pin is race-free). Time travel,
    // audit, incremental, and changelog views are main-chain concepts — the
    // combinations refuse loudly.
    val branchPin: Option[(ManifestTables.SnapshotRefs, Seq[ManifestTables.PartCol])] =
      Option(options.get("branch")).orElse(pinnedBranch).map { b =>
        require(snapshot.isEmpty && startSnapshot.isEmpty && !changelog &&
            stagedExtra.isEmpty,
          "a branch read cannot combine with snapshot/asOfTimestamp/wapId/" +
            "startSnapshot/changelog options")
        (ManifestTables.readBranchRefs(dir, b),
          ManifestTables.readBranchPartitionSpec(dir, b))
      }
    // the PINNED snapshot's own partition spec: an overwrite may have redefined
    // the partitioning since — interpreting old entries with the new spec would
    // mislabel every partition value the time-travel read serves
    // streaming admission control: bound each micro-batch by data files, rows
    // (from the manifest's exact per-entry record counts), and/or bytes (see
    // ManifestMicroBatchStream.getDefaultReadLimit)
    def posLong(name: String): Option[Long] = Option(options.get(name)).map { v =>
      val n = v.toLong
      require(n > 0, s"$name must be positive, got $n")
      n
    }
    val admission = StreamAdmission(
      files = posLong("maxFilesPerTrigger").map(_.toInt),
      rows = posLong("maxRowsPerTrigger"),
      bytes = posLong("maxBytesPerTrigger"))
    new ManifestDataScanBuilder(dir, tschema,
      branchPin.map(_._2).getOrElse(ManifestTables.readPartitionSpec(dir, snapshot)),
      snapshot, startSnapshot = startSnapshot, changelog = changelog,
      streamSkipRewrites = options.getBoolean("streamSkipRewrites", false),
      stagedExtra = stagedExtra, pinnedOverride = branchPin.map(_._1),
      admission = admission)
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // a branch-pinned RELATION (VERSION AS OF '<branch>') is a read view; branch
    // writes go through the writer option, which names its own target chain
    require(pinnedBranch.isEmpty,
      "cannot write to a branch-pinned (VERSION AS OF) relation — append with " +
        ".option(\"branch\", name) instead")
    new ManifestWriteBuilder(dir, tschema, info)
  }

  // ------------------------------------------------ metadata-only DELETE FROM
  // Iceberg's delete-by-partition-predicate analog: when every predicate is an
  // `=`/`IN` bound over partition columns, whole files match or miss (files are
  // partition-homogeneous), so the delete is a SNAPSHOT EDIT — no data file is
  // read, rewritten, or removed. Old snapshots still reference the dropped files
  // (time travel sees pre-delete data); the physical bytes are reclaimed later by
  // expireSnapshots + removeOrphans, the same lifecycle as overwrite. Segments
  // that contain NO matching entry are carried by NAME (never re-read into the new
  // snapshot) — the delete's metadata cost is O(touched segments), not O(table).
  // Anything not expressible as partition bounds is refused via canDeleteWhere, so
  // Spark raises a loud analysis error instead of a silent partial delete.

  private def deleteBounds(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Option[Map[String, Set[String]]] = {
    val partCols = ManifestTables.readPartitionSpec(dir)
    val bound = ManifestDataSource.partitionBound(partCols) _
    predicates.foldLeft(Option(Map.empty[String, Set[String]])) { (acc, p) =>
      acc.flatMap { m =>
        if (p.name() == "ALWAYS_TRUE") Some(m) // unconstrained conjunct: TRUE
        else bound(p).map { case (col, vs) =>
          m.updated(col, m.get(col).map(_ intersect vs).getOrElse(vs))
        }
      }
    }
  }

  override def canDeleteWhere(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Boolean =
    pinnedSnapshot.isEmpty && pinnedBranch.isEmpty && deleteBounds(predicates).isDefined

  override def deleteWhere(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = {
    require(pinnedSnapshot.isEmpty, "cannot DELETE from a time-travel (VERSION AS OF) relation")
    val bounds = deleteBounds(predicates).getOrElse(throw new UnsupportedOperationException(
      s"DELETE on manifest tables supports =/IN predicates over partition columns only; " +
        s"got ${predicates.mkString(", ")}"))
    // optimistic-concurrency publication, same discipline as writes and ALTER
    var attempt = 0
    var done = false
    while (!done) {
      val refs = ManifestTables.readSnapshotRefs(dir, None)
      // the matcher derives from THIS attempt's refs (per-entry spec resolution:
      // a respec racing this loop re-stamps entries and fails our CAS, and the
      // retry must then judge them under their own specs). Bounds are over
      // identity columns only (partitionBound), which every spec carries, so
      // whole-file match/miss semantics hold across evolution.
      val specOf = ManifestTables.specResolver(dir,
        ManifestTables.readPartitionSpec(dir, Some(refs.snapshot)))
      val matches = (e: ManifestTables.Entry) => {
        val ok = ManifestDataSource.entryWithinBoundsBy(specOf, bounds)(e)
        // the evolved bounds check KEEPS an entry on a column its spec lacks —
        // right for scans (may contain matches), lethal for a DELETE (matches
        // means REMOVE). Unreachable while identity columns are immutable under
        // evolution; guarded anyway because the failure mode is silent data loss.
        if (ok) require(bounds.keySet.subsetOf(specOf(e).map(_.name).toSet),
          s"DELETE bound on ${bounds.keySet.mkString(",")} cannot be judged for " +
            s"file ${e.path} (spec lacks the column) — refusing a blind delete")
        ok
      }
      val inlineSurvivors = refs.inline.filterNot(matches)
      // untouched segments carry by NAME; touched ones are rewritten without the
      // matching entries (dropped entirely when nothing survives)
      val perSeg = refs.segments.map { seg =>
        (seg, ManifestTables.readSegmentEntries(dir, seg, refs.snapshot))
      }
      if (inlineSurvivors.length == refs.inline.length &&
          perSeg.forall { case (_, es) => !es.exists(matches) }) {
        return // nothing matched: publish no snapshot, the table is unchanged
      }
      val newSegs = perSeg.map { case (seg, es) =>
        val survivors = es.filterNot(matches)
        if (survivors.length == es.length) Some(seg)
        else if (survivors.isEmpty) None
        else Some(ManifestTables.writeSegment(dir, survivors))
      }.flatten
      // pin the target id from the refs already read (see ManifestReplaceBatchWrite)
      val next = refs.snapshot + 1
      val survivors = inlineSurvivors ++ perSeg.flatMap(_._2).filterNot(matches)
      done = ManifestTables.tryWriteSnapshotRefs(dir, ManifestTables.readPartitionColumn(dir),
        inlineSurvivors, newSegs, next,
        partTypes = ManifestTables.readPartitionTypes(dir), schemaDdl = refs.schemaDdl,
        // a positional segment whose every referenced file this DELETE just removed
        // is dangling — carrying it would pin scans in row mode and block footer
        // aggregates until some compaction happens by (same fold rule as eqDeletes)
        deletes = ManifestTables.livePositionalDeletes(dir, refs.deletes,
          survivors.map(_.path).toSet),
        eqDeletes = ManifestTables.liveEqDeletes(dir, refs.eqDeletes, survivors),
        colIds = refs.colIds, operation = "delete")
      if (!done) {
        attempt += 1
        require(attempt < ManifestBatchWrite.MaxCommitAttempts,
          s"DELETE on $dir lost the snapshot race $attempt times")
        Thread.sleep(math.min(1000L, 20L * attempt) +
          java.util.concurrent.ThreadLocalRandom.current().nextLong(1, 20))
      }
    }
  }
}

private class ManifestDataScanBuilder(dir: String, tschema: StructType,
    partCols: Seq[ManifestTables.PartCol], snapshot: Option[Int],
    rowLevel: Option[ManifestRowLevelOperation] = None,
    startSnapshot: Option[Int] = None, changelog: Boolean = false,
    streamSkipRewrites: Boolean = false,
    stagedExtra: Seq[ManifestTables.Entry] = Nil,
    pinnedOverride: Option[ManifestTables.SnapshotRefs] = None,
    admission: StreamAdmission = StreamAdmission())
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownV2Filters {
  private var required: StructType = tschema
  // per-PARTITION early-stop bound; Spark keeps the global limit (partial pushdown),
  // the scan just stops decoding each file once `limit` rows are out
  private var limit: Option[Int] = None
  // per-partition-column allowed canonical values (intersection of accepted filters)
  private var partitionValues: Map[String, Set[String]] = Map.empty
  private var pushedAgg: Option[(Seq[String], Seq[ManifestAggScan.AggSpec])] = None
  // the snapshot whose refs the aggregate guard VALIDATED (deletes empty): the agg
  // scan pins to it, so a merge-on-read DELETE landing between pushdown and
  // execution can never slip deleted rows into a footer answer
  private var aggValidatedSnapshot: Option[Int] = None

  override def pruneColumns(requiredSchema: StructType): Unit = { required = requiredSchema }

  // ------------------------------------------------------- V2 predicate pushdown
  // V2-ONLY on purpose: Spark's PushDownUtils dispatches on SupportsPushDownFilters
  // BEFORE SupportsPushDownV2Filters, so a builder implementing both never sees a
  // V2 predicate — and only the V2 form carries UserDefinedScalarFunc. Two
  // predicate classes are understood:
  //  1. "="/"IN" on partition columns — the same manifest-level file pruning as V1;
  //  2. `fm_count(shard, 'p') > 0` arriving as a UserDefinedScalarFunc predicate
  //     (the FunctionCatalog-resolved graft.fm_count) over a SHARD-LAYOUT table:
  //     the pattern's fingerprint test prunes candidate files AT THE SCAN, driven
  //     by nothing but the SQL WHERE clause. The predicate itself stays RESIDUAL
  //     (Spark re-evaluates it post-scan), so the pruning is a pure I/O win and
  //     can never change answers.
  private var acceptedV2: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    Array.empty
  // fm_count patterns whose fingerprint test prunes files — applied per-entry by
  // the scan against its pinned snapshot (never resolved against 'latest' here)
  private val fmPats = scala.collection.mutable.ArrayBuffer.empty[String]

  override def pushPredicates(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, UserDefinedScalarFunc}
    type LV[T] = org.apache.spark.sql.connector.expressions.Literal[T]
    def intersect(col: String, vs: Set[String]): Unit =
      partitionValues = partitionValues.updated(col,
        partitionValues.get(col).map(_ intersect vs).getOrElse(vs))
    // partition-column equality/IN -> absorbed (pruned at the manifest); the
    // absorption rule is the shared one DELETE uses too (partitionBound)
    def absorbPartition(
        p: org.apache.spark.sql.connector.expressions.filter.Predicate): Boolean =
      ManifestDataSource.partitionBound(partCols)(p) match {
        case Some((col, vs)) => intersect(col, vs); true
        case None => false
      }
    // fm_count(shard, 'p') > 0 / >= 1 -> fingerprint file pruning (stays residual)
    def fmPattern(
        p: org.apache.spark.sql.connector.expressions.filter.Predicate): Option[String] = {
      def boundOk(name: String, l: LV[_]): Boolean = {
        val b = l.value() match {
          case i: java.lang.Integer => i.longValue()
          case lg: java.lang.Long => lg.longValue()
          case _ => return false
        }
        (name == ">" && b >= 0) || (name == ">=" && b >= 1)
      }
      (p.name(), p.children()) match {
        case (">" | ">=", Array(u: UserDefinedScalarFunc, l: LV[_]))
            if u.canonicalName() == graft.functions.FmCountV2.CanonicalName &&
              boundOk(p.name(), l) =>
          u.children() match {
            case Array(r: NamedReference, pat: LV[_])
                if r.fieldNames.sameElements(Array("shard")) && pat.dataType() == StringType =>
              Some(pat.value().toString)
            case _ => None
          }
        case _ => None
      }
    }
    val absorbed = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.connector.expressions.filter.Predicate]
    val residual = predicates.filter { p =>
      if (absorbPartition(p)) { absorbed += p; false }
      else {
        fmPattern(p).foreach { pattern =>
          if (ShardIndexTable.isShardLayout(partCols)) {
            // recorded as a PER-ENTRY fingerprint test the scan applies against its
            // OWN pinned snapshot's entries — resolving passing hex pairs from the
            // LATEST snapshot here (the round-4 shape) could race a concurrent
            // overwrite or disagree with a VERSION AS OF pin, silently pruning a
            // file the pinned snapshot still serves
            fmPats += pattern
            absorbed += p // visible in explain; ALSO kept residual below
          }
        }
        true
      }
    }
    // data-column comparisons additionally become STATS-PRUNING bounds: they stay
    // residual (Spark re-evaluates them row-by-row — pruning can never change
    // answers), but a file whose recorded min/max provably excludes every row is
    // skipped before its footer ever opens
    statBounds = residual.flatMap(statBoundOf).toSeq
    // HIDDEN-PARTITIONING pruning: predicates on a transform's SOURCE column map
    // through the transform (bucket hash / UTC day / prefix) to bounds on the
    // hidden partition column. They stay residual — lossy transforms can't replace
    // the row filter — so this is pure file pruning, never an answer change. Note
    // aggregate pushdown can never coexist with these bounds: Spark only pushes
    // aggregates when NO residual filters remain, and hidden bounds only arise
    // from residuals.
    residual.foreach { p =>
      ManifestDataSource.hiddenEqBounds(partCols)(p).foreach { case (c, vs) =>
        intersect(c, vs) }
    }
    dayRanges = residual.flatMap(p => ManifestDataSource.hiddenDayRanges(partCols)(p)).toSeq
    acceptedV2 = absorbed.toArray
    residual
  }

  private var statBounds: Seq[ManifestStats.Bound] = Nil
  private var dayRanges: Seq[(String, String, Long)] = Nil

  /** One residual predicate -> a min/max-testable bound, when it is a plain
    * comparison between a single DATA column and non-null literal(s). Anything
    * else (null-safe ops, expressions, nested refs) contributes no bound.
    */
  private def statBoundOf(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[ManifestStats.Bound] = {
    import org.apache.spark.sql.connector.expressions.{Expression, NamedReference}
    type LV[T] = org.apache.spark.sql.connector.expressions.Literal[T]
    def colOf(e: Expression): Option[String] = e match {
      case r: NamedReference if r.fieldNames.length == 1 &&
        !partCols.exists(_.name == r.fieldNames.head) &&
        tschema.fieldNames.contains(r.fieldNames.head) => Some(r.fieldNames.head)
      case _ => None
    }
    def litOf(e: Expression): Option[Any] = e match {
      case l: LV[_] if l.value() != null => Some(l.value())
      case _ => None
    }
    (p.name(), p.children()) match {
      case ("=" | "<" | "<=" | ">" | ">=", Array(a, b)) =>
        (colOf(a), litOf(b)) match {
          case (Some(c), Some(v)) => Some(ManifestStats.Bound(c, p.name(), Seq(v)))
          case _ => (litOf(a), colOf(b)) match {
            case (Some(v), Some(c)) =>
              val flipped = p.name() match {
                case "<" => ">"; case "<=" => ">="; case ">" => "<"; case ">=" => "<="
                case op => op
              }
              Some(ManifestStats.Bound(c, flipped, Seq(v)))
            case _ => None
          }
        }
      case ("IN", children) if children.length >= 2 =>
        colOf(children(0)).flatMap { c =>
          val vs = children.drop(1).flatMap(litOf)
          if (vs.length == children.length - 1) Some(ManifestStats.Bound(c, "in", vs.toSeq))
          else None
        }
      case _ => None
    }
  }

  override def pushedPredicates()
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] = acceptedV2

  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def isPartiallyPushed(): Boolean = true

  /** COUNT(*) / MIN / MAX answered from parquet FOOTER STATISTICS — one output row
    * per file, no data page ever decoded; Spark merges the partials
    * (supportCompletePushDown stays false, so the final aggregate is Spark's).
    * GROUP BY is accepted on partition columns only (each file is
    * partition-homogeneous, so per-file partials are per-group partials). MIN/MAX
    * accepted on primitive numeric/date/timestamp data columns — binary/string
    * footer stats can be truncated by writers, so they stay unpushed.
    */
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min}
    // merge-on-read: footer statistics predate positional AND equality deletes
    // (COUNT would overcount, MIN/MAX might be a deleted row) — compute honestly
    // until compaction folds the deletes away. The validated refs' snapshot id
    // pins the eventual agg scan (see aggValidatedSnapshot).
    // audit (WAP) and branch reads keep aggregates plan-side: the footer-stat
    // scan resolves its file list from the MAIN-chain snapshot refs and would
    // silently answer parent-only / main-only, dropping the delta's rows
    if (stagedExtra.nonEmpty || pinnedOverride.nonEmpty) return false
    val guardRefs = ManifestTables.readSnapshotRefs(dir, snapshot)
    if (guardRefs.deletes.nonEmpty || guardRefs.eqDeletes.nonEmpty) return false
    aggValidatedSnapshot = Some(guardRefs.snapshot)
    // changelog reads keep aggregates plan-side (the footer-stat scan has no
    // change-view path); plain INCREMENTAL reads push fine — the delta is whole
    // appended files, so their footers answer the aggregate exactly
    if (changelog) return false
    def partColOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case f: NamedReference if f.fieldNames.length == 1 &&
          partCols.exists(_.name == f.fieldNames.head) => Some(f.fieldNames.head)
        case _ => None
      }
    // Float/Double are REFUSED for pushed MIN/MAX: parquet-mr's footer statistics
    // propagate NaN through Math.min/max, so a file containing one NaN reports
    // min=NaN — and under Spark's NaN-is-greatest ordering the pushed MIN would
    // silently return NaN instead of the true minimum. The live stats accumulator
    // (ManifestStats.Acc) refuses NaN bounds for data-skipping for the same
    // reason; here the honest answer is to compute the aggregate plan-side.
    def statColOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[(String, DataType)] =
      e match {
        case f: NamedReference if f.fieldNames.length == 1 &&
            !partCols.exists(_.name == f.fieldNames.head) =>
          tschema.fields.find(_.name == f.fieldNames.head).collect {
            case sf if Seq(IntegerType, LongType, BooleanType,
              DateType, TimestampType, TimestampNTZType).contains(sf.dataType) =>
              (sf.name, sf.dataType)
          }
        case _ => None
      }
    // COUNT(c) needs only the footer NULL COUNTS (count = rows - nulls), so any
    // PRIMITIVE data column qualifies — including Float/Double (the NaN hazard is
    // a min/max ordering problem, null counts are untouched) and strings (writer
    // truncation affects bounds, never null counts). Nested columns are refused:
    // their leaf chunks count ELEMENT nulls, not top-level nulls. Partition
    // columns are refused (computed plan-side) — their values never reach a
    // footer chunk.
    def countColOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case f: NamedReference if f.fieldNames.length == 1 &&
            !partCols.exists(_.name == f.fieldNames.head) =>
          tschema.fields.find(_.name == f.fieldNames.head).collect {
            case sf if Seq(IntegerType, LongType, BooleanType, DateType, TimestampType,
              TimestampNTZType, FloatType, DoubleType, StringType).contains(sf.dataType) =>
              sf.name
          }
        case _ => None
      }
    val groupCols = agg.groupByExpressions.toSeq.map { e =>
      partColOf(e).getOrElse(return false)
    }
    val aggs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => ManifestAggScan.AggCountStar
      case c: Count if !c.isDistinct =>
        countColOf(c.column).map(ManifestAggScan.AggCountCol).getOrElse(return false)
      case m: Min => statColOf(m.column).map { case (n, dt) =>
        ManifestAggScan.AggMin(n, dt) }.getOrElse(return false)
      case m: Max => statColOf(m.column).map { case (n, dt) =>
        ManifestAggScan.AggMax(n, dt) }.getOrElse(return false)
      case _ => return false
    }
    pushedAgg = Some((groupCols, aggs))
    true
  }

  override def build(): Scan = pushedAgg match {
    case Some((groupCols, aggs)) =>
      new ManifestAggScan(dir, partCols, partitionValues,
        snapshot.orElse(aggValidatedSnapshot), groupCols, aggs, startSnapshot,
        defaults = ManifestDataSource.existenceDefaults(tschema))
    case None =>
      val scan = new ManifestDataScan(dir, tschema, required, partCols, partitionValues,
        snapshot, limit, rowLevel.isDefined, statBounds, startSnapshot, changelog,
        streamSkipRewrites, fmPatterns = fmPats.toSeq, dayRanges = dayRanges,
        stagedExtra = stagedExtra, pinnedOverride = pinnedOverride,
        admission = admission)
      // the FIRST scan built for a row-level operation is the main rewrite scan
      // (scan planning precedes the group-filter subquery's own scan build); its
      // post-runtime-filter file list is what the replace-write swaps out
      rowLevel.foreach(_.register(scan))
      scan
  }
}

private class ManifestDataScan(dir: String, tschema: StructType, required: StructType,
    partCols: Seq[ManifestTables.PartCol], partitionValues: Map[String, Set[String]],
    snapshot: Option[Int], limit: Option[Int] = None, rowLevel: Boolean = false,
    statBounds: Seq[ManifestStats.Bound] = Nil, startSnapshot: Option[Int] = None,
    changelog: Boolean = false, streamSkipRewrites: Boolean = false,
    fmPatterns: Seq[String] = Nil, dayRanges: Seq[(String, String, Long)] = Nil,
    stagedExtra: Seq[ManifestTables.Entry] = Nil,
    pinnedOverride: Option[ManifestTables.SnapshotRefs] = None,
    admission: StreamAdmission = StreamAdmission())
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  // DPP: equality/IN filters on partition columns arriving AT EXECUTION TIME (from a
  // join's build side) further restrict the file list before planInputPartitions
  private var runtimeValues: Map[String, Set[String]] = Map.empty
  // runtime GROUP filter of a row-level operation: the set of files that actually
  // contain rows matching the DELETE/UPDATE/MERGE condition (In(_file, ...) computed
  // by Spark's group-filter subquery) — only these files are read and rewritten
  private var runtimeFiles: Option[Set[String]] = None

  /** fm_count fingerprint pruning, applied PER ENTRY of this scan's own pinned
    * snapshot: a shard file passes iff every pushed pattern's fingerprint test says
    * the shard MAY contain it (false proves fm_count == 0 for the whole shard).
    * Evaluating against the pinned entries — not the latest snapshot's distinct
    * pairs — keeps time-travel reads and concurrent-overwrite races exact.
    */
  private def fmAllowed(e: ManifestTables.Entry): Boolean =
    fmPatterns.isEmpty || {
      val pcs = specOf(e)
      val vals = ManifestDataSource.splitPartValues(e.partition, pcs.length)
      val i0 = pcs.indexWhere(_.name == ShardIndexTable.HexCols(0))
      val i1 = pcs.indexWhere(_.name == ShardIndexTable.HexCols(1))
      i0 < 0 || i1 < 0 || {
        val fp = ShardIndexTable.parseHexPair(vals(i0), vals(i1))
        fmPatterns.forall(p => graft.functions.AlphaFingerprint.mayContain(fp, p))
      }
    }

  private def allowed(e: ManifestTables.Entry): Boolean =
    ManifestDataSource.entryWithinBoundsBy(specOf, partitionValues)(e) &&
      ManifestDataSource.entryWithinDayRangesBy(specOf, dayRanges)(e) &&
      ManifestDataSource.entryWithinBoundsBy(specOf, runtimeValues)(e) &&
      runtimeFiles.forall(_.contains(e.path)) &&
      ManifestStats.allows(e.stats, statBounds)

  /** The scan's CURRENT file list, all pruning applied — for a row-level operation
    * this is read at commit time (after runtime group filtering narrowed it) and is
    * exactly the set of files the replace-write swaps out.
    */
  private[sources] def effectiveEntries: Seq[ManifestTables.Entry] = pinned.filter(allowed)

  // snapshot pinned at plan time (see class doc) + manifest-level partition pruning
  // on EVERY filtered partition column; an explicit snapshot option = time travel.
  // ONE refs read feeds entries AND deletes: two independent 'latest' reads could
  // straddle a concurrent compaction (new files + empty deletes vs old files +
  // no skip list = resurrected rows)
  private lazy val pinnedRefs: ManifestTables.SnapshotRefs = pinnedOverride.getOrElse {
    val base = ManifestTables.readSnapshotRefs(dir, snapshot)
    // audit read (WAP): the staged delta joins the pinned snapshot's entry list
    // as extra inline entries — every downstream view (pruning, stats, deletes,
    // size estimate) then serves "the table as the publish would make it".
    // BRANCH reads bypass the main chain entirely (pinnedOverride): the branch
    // head's refs were resolved race-free at plan time.
    if (stagedExtra.isEmpty) base else base.copy(inline = base.inline ++ stagedExtra)
  }
  /** INCREMENTAL read (`startSnapshot` option): the paths already present at the
    * start snapshot, subtracted from the pinned file list — "rows appended strictly
    * after snapshot S". Only well-defined over an APPEND-ONLY history, so the read
    * refuses loudly if any baseline file vanished (an overwrite/compaction/DELETE
    * replaced data in the range) or delete-segment activity happened in the range
    * (merge-on-read removed rows — a file-level diff would resurrect them).
    */
  private lazy val changeDiff: (Set[String], Map[String, Array[Long]]) =
    startSnapshot match {
      case None => (Set.empty, Map.empty)
      case Some(s0) =>
        // changelog consumes delete-segment growth as delete rows; the plain
        // incremental read refuses it (a file-level delta can't represent removals).
        // The already-materialized pinned entry/delete views feed the diff, so
        // planning reads each manifest artifact once.
        val endPaths = pinnedAll.map(_.path).toSet
        if (changelog)
          ManifestDataSource.changelogDiff(dir, s0, pinnedRefs, endPaths, pinnedDeletes)
        else
          (ManifestDataSource.incrementalBaseline(dir, s0, pinnedRefs, endPaths), Map.empty)
    }
  private def baselinePaths: Set[String] = changeDiff._1
  /** changelog only: per-file positions newly deleted IN (start, end] — the rows
    * that left the table in the range (served as _change_type='delete' rows).
    */
  private def rangeDeletes: Map[String, Array[Long]] = changeDiff._2
  private lazy val pinnedAll: Seq[ManifestTables.Entry] =
    ManifestTables.entriesOf(dir, pinnedRefs)
  /** Per-entry partition-spec resolution (partition evolution): specid-0 entries
    * read under THIS scan's pinned spec — the pinned refs' unstamped entries are
    * laid out under it by the stamping invariant (see Entry.specId).
    */
  private lazy val specOf: ManifestTables.Entry => Seq[ManifestTables.PartCol] =
    ManifestTables.specResolver(dir, partCols)
  /** Do ALL files of this scan share the pinned spec? KeyGroupedPartitioning (SPJ)
    * is only claimed then — a spec-straddling file set has no honest common
    * grouping key over transform fields old files were never routed by.
    */
  private lazy val specUniform: Boolean = pinnedAll.forall(e => specOf(e) == partCols)
  private lazy val pinned: Seq[ManifestTables.Entry] =
    pinnedAll
      .filter(e => !baselinePaths.contains(e.path))
      .filter(ManifestDataSource.entryWithinBoundsBy(specOf, partitionValues))
      .filter(ManifestDataSource.entryWithinDayRangesBy(specOf, dayRanges))
      .filter(fmAllowed)
  // merge-on-read positional deletes of the SAME pinned snapshot: data-file path ->
  // sorted deleted positions, applied by the readers
  private lazy val pinnedDeletes: Map[String, Array[Long]] =
    ManifestTables.deletedPositions(dir, pinnedRefs)
  /** Merge-on-read EQUALITY deletes of the pinned snapshot, key columns RESOLVED
    * to their CURRENT names through the column-id registry (a rename landing after
    * the delete must not orphan it); a delete keyed on a dropped column refuses
    * loudly (its rows could no longer be addressed).
    */
  private lazy val pinnedEqDels: Seq[ManifestTables.EqDelete] =
    ManifestTables.resolvedEqDeletes(dir, pinnedRefs)
  /** Equality deletes applicable to one file: those sequenced strictly AFTER it. */
  private def applicableEq(e: ManifestTables.Entry): Seq[ManifestTables.EqDelete] =
    pinnedEqDels.filter(d => ManifestTables.seqOf(e) < d.seq)
  private lazy val eqRowMode: Boolean =
    pinnedEqDels.nonEmpty && pinned.exists(e => applicableEq(e).nonEmpty)
  /** Delete-segment refs this scan planned against — a row-level replace commit
    * compares them with commit-time refs to detect a concurrent merge-on-read
    * DELETE it would otherwise silently undo.
    */
  private[sources] def planningDeleteRefs: Seq[String] = pinnedRefs.deletes
  /** Equality-delete refs at planning time (same conflict rule). */
  private[sources] def planningEqDeleteRefs: Seq[String] = pinnedRefs.eqDeletes
  override def readSchema(): StructType = required
  override def toBatch: Batch = {
    require(!changelog || startSnapshot.isDefined,
      "a batch changelog read needs .option(\"startSnapshot\", <id or tag>) — the " +
        "version the changes are relative to (a STREAM may omit it: the initial " +
        "batch is then a state load of inserts)")
    this
  }

  /** Post-pruning byte size from the manifest's recorded file sizes — this is what
    * lets Catalyst AUTO-BROADCAST a small (or well-pruned) manifest table in a join:
    * without reported statistics a DSv2 relation defaults to "huge" and every join
    * shuffles both sides.
    */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong = {
        // a changelog's delete view also produces rows (a delete-only range is
        // NOT empty) — count the touched baseline files' bytes as an upper bound
        // so a delete-heavy changelog never mis-reports ~1 byte and gets broadcast
        val deleteBytes =
          if (!changelog || rangeDeletes.isEmpty) 0L
          else pinnedAll.filter(e => baselinePaths.contains(e.path) &&
            rangeDeletes.contains(e.path)).map(_.bytes).sum
        java.util.OptionalLong.of(math.max(1L, pinned.map(_.bytes).sum + deleteBytes))
      }
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
    }

  /** A row-level operation's scan filters on `_file` alone (the group identifier —
    * Spark's runtime group filtering then rewrites only files containing matches);
    * ordinary scans filter on partition columns (dynamic partition pruning).
    * Only columns the scan actually OUTPUTS are advertised — Spark's
    * PartitionPruning rule resolves these refs against the scan's output and
    * throws on a pruned-away column (e.g. `SELECT _file, id` drops lang_p).
    */
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
    val out = required.fieldNames.toSet
    if (rowLevel)
      Array(org.apache.spark.sql.connector.expressions.Expressions.column(
        ManifestDataSource.FileCol)).filter(c => out.contains(ManifestDataSource.FileCol))
    else {
      // hidden transforms advertise their SOURCE column (the one actually in the
      // output): a join-side In(src, ...) runtime filter then prunes through the
      // transform — bucket-level DPP. Safe because DPP only reduces the file list;
      // the join itself still evaluates the real equality on every row.
      val names = partCols.map(pc => pc.transform.map(_.src).getOrElse(pc.name))
        .distinct.filter(out.contains)
      names.map(org.apache.spark.sql.connector.expressions.Expressions.column).toArray
    }
  }

  /** Runtime (dynamic partition pruning / row-level group) filters: same
    * canonicalization as the planning-time path; unparseable predicates are ignored
    * (they only ever REDUCE the file list — correctness never depends on them).
    */
  override def filter(filters: Array[Filter]): Unit = {
    def canon(colName: String, v: Any): Option[String] =
      ManifestDataSource.canonPartValue(partCols)(colName, v)
    def intersectFiles(vs: Set[String]): Unit =
      runtimeFiles = Some(runtimeFiles.map(_ intersect vs).getOrElse(vs))
    def intersectValues(col: String, vs: Set[String]): Unit =
      runtimeValues = runtimeValues.updated(col,
        runtimeValues.get(col).map(_ intersect vs).getOrElse(vs))
    // runtime values on a hidden transform's SOURCE column prune through the
    // transform: every value must map (one unmappable value voids the bound —
    // the file list must stay a superset of the true answer)
    def hiddenIntersect(c: String, vs: Seq[Any]): Unit =
      partCols.filter(_.transform.exists(_.src == c)).foreach { pc =>
        val canoned = vs.map(v => ManifestDataSource.transformCanonOf(pc, v))
        if (canoned.nonEmpty && canoned.forall(_.isDefined))
          intersectValues(pc.name, canoned.flatten.toSet)
      }
    filters.foreach {
      case EqualTo(c, v: String) if c == ManifestDataSource.FileCol =>
        intersectFiles(Set(v))
      case In(c, vs) if c == ManifestDataSource.FileCol =>
        intersectFiles(vs.collect { case s: String => s }.toSet)
      case EqualTo(c, v) =>
        canon(c, v).foreach(s => intersectValues(c, Set(s)))
        if (v != null) hiddenIntersect(c, Seq(v))
      case In(c, vs) =>
        val canoned = vs.flatMap(v => canon(c, v))
        if (canoned.length == vs.length && vs.nonEmpty) intersectValues(c, canoned.toSet)
        if (vs.nonEmpty && !vs.contains(null)) hiddenIntersect(c, vs.toSeq)
      case _ =>
    }
  }

  private def keyDatumsOf(e: ManifestTables.Entry): Array[Any] =
    ManifestDataSource.keyDatumsBy(specOf, partCols)(e)

  /** The entry's partition string in the SCAN spec's layout — what the reader
    * factories (constant partition vectors, split by the scan spec) consume.
    */
  private def normPartOf(e: ManifestTables.Entry): String =
    ManifestDataSource.normalizePartition(specOf, partCols)(e)

  override def planInputPartitions(): Array[InputPartition] = {
    // changelog inserts NET OUT rows both appended and deleted in the range: a
    // file that didn't exist at start has only range-new deletions, so the pinned
    // snapshot's full skip list IS the net-out list for it
    val inserts = pinned.filter(allowed)
      .map(e => ManifestDataInputPartition(s"$dir/${e.path}", e.path, normPartOf(e),
        if (partCols.isEmpty) Array.empty else keyDatumsOf(e),
        pinnedDeletes.getOrElse(e.path, Array.emptyLongArray),
        changeType = if (changelog) "insert" else "",
        eqDels = applicableEq(e)): InputPartition)
    if (!changelog) return inserts.toArray
    // delete rows: baseline files whose positions were newly deleted in the range —
    // the reader emits ONLY those positions, with their pre-delete column values
    val deletes = pinnedAll
      .filter(e => baselinePaths.contains(e.path) && rangeDeletes.contains(e.path))
      .filter(allowed) // the ONE pruning predicate — insert and delete views agree
      .map(e => ManifestDataInputPartition(s"$dir/${e.path}", e.path, normPartOf(e),
        if (partCols.isEmpty) Array.empty else keyDatumsOf(e),
        changeType = "delete", emitOnly = rangeDeletes(e.path)): InputPartition)
    (inserts ++ deletes).toArray
  }

  /** STORAGE-PARTITIONED JOINS: the scan reports KeyGroupedPartitioning over the
    * partition columns (each InputPartition carries its typed partition-value tuple
    * via HasPartitionKey), so two manifest tables partitioned the same way join
    * WITHOUT any shuffle when spark.sql.sources.v2.bucketing.enabled is set — the
    * DSv2 analog of bucketed co-located joins. HIDDEN transform columns report
    * their V2 TRANSFORM over the source column (`bucket(4, user_id)`): for a
    * catalog-loaded table Spark binds it through ManifestCatalog's FunctionCatalog
    * (canonical names match across tables, so two bucket(4)-partitioned tables
    * joined on the SOURCE key shuffle NOTHING — Iceberg's bucket-SPJ story); a
    * path-based load has no function catalog, so Spark's own resolution declines
    * the partitioning and plans a plain shuffle — conservative, never wrong.
    */
  override def outputPartitioning(): org.apache.spark.sql.connector.read.partitioning.Partitioning =
    // a changelog scan mixes insert and delete views of one range — it stays a
    // plain read and never claims key-grouped storage partitioning; a
    // spec-STRADDLING file set (partition evolution mid-table) likewise — files
    // predating a transform field have no grouping key under it, so claiming
    // KeyGroupedPartitioning would co-locate nothing honestly (plain shuffle
    // until compaction rewrites the stragglers under the current spec)
    if (partCols.isEmpty || changelog || !specUniform)
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
        pinned.count(allowed))
    else {
      import org.apache.spark.sql.connector.expressions.{Expression, Expressions}
      val exprs: Seq[Expression] = partCols.map { pc =>
        pc.transform match {
          case None => Expressions.identity(pc.name)
          case Some(t) => t.kind match {
            case "bucket" => Expressions.bucket(t.param, t.src)
            case "days" => Expressions.days(t.src)
            case "hours" => Expressions.hours(t.src)
            case "months" => Expressions.months(t.src)
            case "years" => Expressions.years(t.src)
            case _ => Expressions.apply("truncate",
              Expressions.literal(Int.box(t.param)), Expressions.column(t.src))
          }
        }
      }
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        exprs.toArray, pinned.filter(allowed).map(_.partition).distinct.size)
    }
  override def createReaderFactory(): PartitionReaderFactory = {
    // serializable projection spec: (name, dataType) of required fields + the
    // partition-column spec for typed constant columns. Spark requires every
    // partition of ONE scan to agree on columnar-vs-row, so ANY pending
    // positional delete puts the whole scan in row mode (honest trade: tables
    // carry deletes only until compaction folds them)
    val fields = required.fields.map(f => (f.name, f.dataType))
    // changelog delete parts emit selected positions row-by-row, so any range with
    // delete activity puts the whole scan in row mode (same all-partitions-agree
    // rule as pending deletes); pending EQUALITY deletes likewise (readers must
    // decode the key column and filter)
    new ManifestDataReaderFactory(fields, partCols, limit,
      forceRows = pinnedDeletes.nonEmpty || eqRowMode ||
        (changelog && rangeDeletes.nonEmpty),
      colIds = pinnedRefs.colIds, bounds = statBounds,
      defaults = ManifestDataSource.existenceDefaults(tschema))
  }
  override def description(): String = {
    val parts =
      if (partitionValues.isEmpty) "*"
      else partCols.filter(pc => partitionValues.contains(pc.name))
        .map(pc => s"${pc.name}=${partitionValues(pc.name).toSeq.sorted.mkString("|")}")
        .mkString(",")
    s"manifest_data($dir, partitions=$parts, " +
      s"files=${pinned.size}, snapshot=${snapshot.map(_.toString).getOrElse("latest")})"
  }

  /** STREAMING SOURCE (Iceberg incremental-append streaming-read analog): offsets
    * are snapshot ids, each micro-batch reads exactly the files appended in
    * (startOffset, endOffset] — O(delta) work per batch, never a rescan. Exactly-once
    * end to end falls out of Spark's offset log plus the manifest's immutable
    * snapshots: a replayed batch re-plans the same snapshot range and therefore the
    * same files. Append-only history is enforced per planned range (same guards as
    * the batch `startSnapshot` option); time-travel pins can't stream.
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(snapshot.isEmpty,
      "a time-travel (snapshot/VERSION AS OF) relation is immutable — it cannot " +
        "be read as a stream; use .option(\"startSnapshot\", n) for the initial offset")
    require(stagedExtra.isEmpty && pinnedOverride.isEmpty,
      "wapId audit and branch reads are batch views — the stream follows the " +
        "main snapshot chain; publish or fast-forward first")
    new ManifestMicroBatchStream(dir, required, partCols, partitionValues,
      startSnapshot, statBounds, streamSkipRewrites, changelog, admission)
  }
}

/** Streaming admission-control knobs: per-micro-batch caps on data files, rows
  * (answered from the manifest's exact per-entry record counts), and bytes.
  * All soft — a batch always admits at least one file.
  */
private[sources] case class StreamAdmission(files: Option[Int] = None,
    rows: Option[Long] = None, bytes: Option[Long] = None)

/** A streaming offset: "everything up to and including manifest snapshot N has been
  * consumed, plus the first `pos` path-sorted fresh files of the pure-append span
  * that follows N". -1 = nothing consumed (the first batch serves the whole first
  * snapshot). pos > 0 only ever exists under admission control (maxFiles/maxRows/
  * maxBytesPerTrigger), and only splits pure-append spans — anything else is
  * consumed atomically.
  */
private[sources] case class ManifestStreamOffset(snapshot: Int, pos: Int = 0)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    if (pos == 0) s"""{"snapshot":$snapshot}"""
    else s"""{"snapshot":$snapshot,"pos":$pos}"""
}

private[sources] class ManifestMicroBatchStream(dir: String,
    required: StructType, partCols: Seq[ManifestTables.PartCol],
    partitionValues: Map[String, Set[String]], startSnapshot: Option[Int],
    statBounds: Seq[ManifestStats.Bound], skipRewrites: Boolean = false,
    changelog: Boolean = false, admission: StreamAdmission = StreamAdmission())
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, Offset => StreamOffset}

  override def initialOffset(): StreamOffset =
    ManifestStreamOffset(startSnapshot.getOrElse(-1))

  // Trigger.AvailableNow: the end snapshot is PINNED when the trigger prepares —
  // the run drains exactly the table as it stood then and terminates, no matter
  // what concurrent committers append meanwhile (the native semantics; without
  // this Spark warned and fell back to one unguarded batch)
  @volatile private var availableNowEnd: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(ManifestTables.latestSnapshotId(dir).getOrElse(-1))

  private def currentEnd: StreamOffset =
    ManifestStreamOffset(availableNowEnd.getOrElse(
      ManifestTables.latestSnapshotId(dir).getOrElse(-1)))

  override def latestOffset(): StreamOffset = currentEnd
  // admission control (Iceberg streaming-max-files-per-micro-batch / Delta
  // maxFiles/maxBytesPerTrigger analogs): `.option("maxFilesPerTrigger", n)`,
  // `.option("maxRowsPerTrigger", n)` (rows from the manifest's exact per-entry
  // record counts — an entry without one conservatively exhausts the row budget),
  // and `.option("maxBytesPerTrigger", n)` each bound a micro-batch — at
  // 10^12-turn scale one snapshot may carry thousands of files, and an unbounded
  // batch is a straggler/OOM hazard. All limits are SOFT in Spark's sense: a
  // batch always admits at least one file, so an oversized file still flows.
  // Offsets gain a sub-snapshot `pos` component; only PURE-APPEND spans ever
  // split (a file is an independent unit of an append delta), everything else —
  // rewrites, delete growth, the initial state load — stays atomic so the
  // netting semantics above are untouched.
  override def getDefaultReadLimit: ReadLimit = {
    val ls = admission.files.map(n => ReadLimit.maxFiles(n)).toSeq ++
      admission.rows.map(n => ReadLimit.maxRows(n)).toSeq
    ls match {
      case Nil =>
        // a bytes-only bound has no standard ReadLimit; the walk reads it from
        // `admission` directly, but Spark must still call the budgeted path
        if (admission.bytes.isDefined) ReadLimit.maxFiles(Int.MaxValue)
        else ReadLimit.allAvailable()
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }

  /** (file, row) budgets carried by a ReadLimit; bytes ride on `admission`. */
  private def budgetsOf(limit: ReadLimit): (Option[Int], Option[Long]) = {
    import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadMaxFiles, ReadMaxRows}
    limit match {
      case f: ReadMaxFiles => (Some(f.maxFiles()), None)
      case r: ReadMaxRows => (None, Some(r.maxRows()))
      case c: CompositeReadLimit =>
        (c.getReadLimits.toSeq.collectFirst { case f: ReadMaxFiles => f.maxFiles() },
          c.getReadLimits.toSeq.collectFirst { case r: ReadMaxRows => r.maxRows() })
      case _ => (None, None)
    }
  }

  /** Fresh entries of the span (s, t] IF it is pure-append (no delete-segment
    * change, no file removals, same partition spec — an append can change none of
    * these), path-sorted so a split's file order is deterministic across restarts.
    */
  private def spanFresh(s: Int, t: Int): Option[Seq[ManifestTables.Entry]] = {
    val sRefs = ManifestTables.readSnapshotRefs(dir, Some(s))
    val tRefs = ManifestTables.readSnapshotRefs(dir, Some(t))
    val tEntries = ManifestTables.entriesOf(dir, tRefs)
    val tPaths = tEntries.map(_.path).toSet
    val sPaths = ManifestTables.entriesOf(dir, sRefs).map(_.path).toSet
    // spec comparison on the IDENTITY columns only: hidden-field evolution
    // (ADD/DROP PARTITION FIELD) is handled per entry by the spec resolver, so a
    // respec in the span stays streamable; an identity change (overwrite respec)
    // still breaks the span
    val pureAppend = sRefs.deletes.toSet == tRefs.deletes.toSet &&
      sRefs.eqDeletes.toSet == tRefs.eqDeletes.toSet &&
      sPaths.subsetOf(tPaths) &&
      ManifestTables.readPartitionSpec(dir, Some(t)).filter(_.transform.isEmpty) ==
        partCols.filter(_.transform.isEmpty)
    if (pureAppend) Some(tEntries.filterNot(e => sPaths.contains(e.path)).sortBy(_.path))
    else None
  }

  /** The span a mid-span offset sits in: its end id and fresh entries. Offsets only
    * ever split pure-append spans, so anything else here means history was expired
    * or rewritten under a live checkpoint — fail loudly rather than remap positions.
    */
  private def appendSpan(s: Int): (Int, Seq[ManifestTables.Entry]) = {
    val t = ManifestTables.snapshotIds(dir).filter(_ > s).minOption.getOrElse(
      throw new IllegalStateException(
        s"streaming offset splits the span after snapshot $s of $dir, but no later " +
          "snapshot survives — keep snapshots unexpired until streams drain"))
    (t, spanFresh(s, t).getOrElse(throw new IllegalStateException(
      s"streaming offset splits the span ($s, $t] of $dir, but that span is not " +
        "pure-append — offsets can only split append spans; was history expired " +
        "or rewritten under a live checkpoint?")))
  }

  override def latestOffset(start: StreamOffset, limit: ReadLimit): StreamOffset = {
    val so = start.asInstanceOf[ManifestStreamOffset]
    val endSnap = currentEnd.asInstanceOf[ManifestStreamOffset].snapshot
    val (fileB, rowB) = budgetsOf(limit)
    if (fileB.isEmpty && rowB.isEmpty && admission.bytes.isEmpty) return currentEnd
    // the initial state load stays one batch: its per-file plans are coupled by the
    // batch-wide row-mode decision and delete application; bound it with
    // startSnapshot (or stream from an empty/fresh table) instead
    if (so.snapshot < 0) return ManifestStreamOffset(endSnap)
    var cur = so
    var files = fileB.getOrElse(Int.MaxValue)
    var rows = rowB.getOrElse(Long.MaxValue)
    var bytes = admission.bytes.getOrElse(Long.MaxValue)
    var admitted = false
    var done = false
    while (!done && files > 0 && rows > 0 && bytes > 0) {
      ManifestTables.snapshotIds(dir)
        .filter(id => id > cur.snapshot && id <= endSnap).minOption match {
        case None => done = true
        case Some(t) => spanFresh(cur.snapshot, t) match {
          case None =>
            // non-append span: never split — it is consumed ALONE in its own batch
            // (planRange applies the strict/skipRewrites/changelog semantics to it)
            require(cur.pos == 0,
              s"streaming offset sits mid-span after snapshot ${cur.snapshot} of " +
                s"$dir but the span is no longer pure-append — was history " +
                "expired or rewritten under a live checkpoint?")
            if (cur == so) cur = ManifestStreamOffset(t)
            done = true
          case Some(fresh) =>
            var i = cur.pos
            while (!done && i < fresh.size) {
              val e = fresh(i)
              // an entry without a recorded row count conservatively exhausts the
              // row budget (still admitted when it is the batch's first file)
              val r = if (e.rows >= 0) e.rows else Long.MaxValue
              val fits = rows >= r && bytes >= e.bytes
              if (fits || !admitted) {
                files -= 1
                rows = if (r >= rows) 0L else rows - r
                bytes = if (e.bytes >= bytes) 0L else bytes - e.bytes
                admitted = true
                i += 1
                if (files <= 0 || rows <= 0 || bytes <= 0) done = true
              } else done = true
            }
            cur = if (i >= fresh.size) ManifestStreamOffset(t)
              else ManifestStreamOffset(cur.snapshot, i)
        }
      }
    }
    cur
  }

  override def deserializeOffset(json: String): StreamOffset = {
    val m = """"snapshot"\s*:\s*(-?\d+)""".r.findFirstMatchIn(json).getOrElse(
      throw new IllegalArgumentException(s"malformed manifest stream offset: $json"))
    // pos is absent from pre-admission-control checkpoints (and from every clean
    // span boundary since) — missing means 0
    val pos = """"pos"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toInt).getOrElse(0)
    ManifestStreamOffset(m.group(1).toInt, pos)
  }

  /** (entry, net-out deleted positions, emit-only positions, change type,
    * applicable equality deletes) — turned into InputPartitions only once the
    * BATCH-WIDE row-mode decision is known (Spark requires every partition of one
    * batch to agree columnar-vs-row).
    */
  private type Planned = (ManifestTables.Entry, Array[Long], Array[Long], String,
    Seq[ManifestTables.EqDelete])
  private val NoPos = Array.emptyLongArray
  private val NoEq = Nil: Seq[ManifestTables.EqDelete]
  private def insertCT = if (changelog) "insert" else ""

  override def planInputPartitions(start: StreamOffset, end: StreamOffset)
      : Array[InputPartition] = {
    val so = start.asInstanceOf[ManifestStreamOffset]
    val eo = end.asInstanceOf[ManifestStreamOffset]
    if (eo.snapshot < 0 || eo.snapshot < so.snapshot ||
        (eo.snapshot == so.snapshot && eo.pos <= so.pos)) return Array.empty
    if (so.pos == 0 && eo.pos == 0) return build(planRange(so.snapshot, eo.snapshot))
    // sub-snapshot (rate-limited) offsets: [rest of the head span] ++ [full middle
    // range] ++ [first eo.pos files of the tail span]. Partial spans exist only on
    // pure-append transitions (latestOffset never splits anything else), so the
    // slices are plain inserts with no deletes to apply.
    def slices(s: Int, from: Int, until: Int): Seq[Planned] = {
      val (_, fresh) = appendSpan(s)
      require(until <= fresh.size,
        s"streaming offset points past the ${fresh.size}-file span after snapshot " +
          s"$s of $dir — was history rewritten under a live checkpoint?")
      fresh.slice(from, until).map(e => (e, NoPos, NoPos, insertCT, NoEq))
    }
    val buf = Seq.newBuilder[Planned]
    if (so.snapshot == eo.snapshot) buf ++= slices(so.snapshot, so.pos, eo.pos)
    else {
      var mid0 = so.snapshot
      if (so.pos > 0) {
        val (t, fresh) = appendSpan(so.snapshot)
        buf ++= fresh.drop(so.pos).map(e => (e, NoPos, NoPos, insertCT, NoEq))
        mid0 = t
      }
      if (mid0 < eo.snapshot) buf ++= planRange(mid0, eo.snapshot)
      if (eo.pos > 0) buf ++= slices(eo.snapshot, 0, eo.pos)
    }
    build(buf.result())
  }

  private def planRange(s0: Int, s1: Int): Seq[Planned] = {
    // the stream resolved its partition spec ONCE at start; an overwrite that
    // REDEFINED the identity layout mid-stream would make this batch parse the
    // new layout's partition values under the old one (garbage values or a crash
    // mid-batch, well beyond skipRewrites' documented lossiness) — refuse loudly.
    // Hidden-field evolution (ADD/DROP PARTITION FIELD) is exempt: entries
    // self-describe through the per-entry spec resolver, so the stream rides
    // through a respec without a restart.
    val endSpec = ManifestTables.readPartitionSpec(dir, Some(s1))
    require(endSpec.filter(_.transform.isEmpty) == partCols.filter(_.transform.isEmpty),
      s"partition spec of $dir changed mid-stream (stream started under " +
        s"'${partCols.map(ManifestTables.specTokenOf).mkString(",")}', snapshot $s1 " +
        s"records '${endSpec.map(ManifestTables.specTokenOf).mkString(",")}') — " +
        "restart the stream to adopt the new layout")
    val endRefs = ManifestTables.readSnapshotRefs(dir, Some(s1))
    val endEntries = ManifestTables.entriesOf(dir, endRefs)
    // initial offset -1 is a STATE load of the end snapshot, not a transition:
    // pending merge-on-read deletes (positional AND equality) APPLY — removed rows
    // must not enter the stream; a changelog stream serves the state as insert rows
    if (s0 < 0) {
      val dels = ManifestTables.deletedPositions(dir, endRefs)
      val eq = ManifestTables.eqDeletesOf(dir, endRefs)
      return endEntries.map(e =>
        (e, dels.getOrElse(e.path, NoPos), NoPos, insertCT,
          eq.filter(d => ManifestTables.seqOf(e) < d.seq)))
    }
    val planned: Seq[Planned] =
      try {
        val endPaths = endEntries.map(_.path).toSet
        if (changelog) {
          // CDC: appends -> insert rows (net of range-internal deletions — an
          // in-range file's deletions are all range-new, so the end snapshot's
          // positions ARE its net-out list), delete growth -> delete rows
          val endDels = ManifestTables.deletedPositions(dir, endRefs)
          val (baseline, rangeDels) =
            ManifestDataSource.changelogDiff(dir, s0, endRefs, endPaths, endDels)
          // guard proved eq deletes unchanged in range; files appended in the range
          // sequence after every pre-range eq delete, so none applies
          endEntries.filterNot(e => baseline.contains(e.path)).map(e =>
            (e, endDels.getOrElse(e.path, NoPos), NoPos, "insert", NoEq)) ++
            endEntries.filter(e =>
              baseline.contains(e.path) && rangeDels.contains(e.path)).map(e =>
              (e, NoPos, rangeDels(e.path), "delete", NoEq))
        } else {
          val baseline =
            ManifestDataSource.incrementalBaseline(dir, s0, endRefs, endPaths)
          endEntries.filterNot(e => baseline.contains(e.path))
            .map(e => (e, NoPos, NoPos, "", NoEq))
        }
      } catch {
        case _: IllegalArgumentException if skipRewrites => transitionWalk(s0, s1)
        case e: IllegalArgumentException =>
          throw new IllegalArgumentException(e.getMessage +
            "; a stream can resume past this with .option(\"streamSkipRewrites\", " +
            "true) — a plain stream then skips every non-append snapshot (rewritten " +
            "files AND row removals never enter it), a changelog stream skips only " +
            "true rewrites (delete growth still arrives as delete rows)", e)
      }
    planned
  }

  /** The skipRewrites recovery path: walk the surviving snapshot ids in (s0, s1]
    * per transition. A plain stream emits only PURE-APPEND transitions' fresh
    * files (Iceberg's skip-overwrite/skip-delete semantics); a CHANGELOG stream
    * additionally represents delete-segment growth as delete rows — and a
    * merge-on-read UPDATE commit (files + deletes at once) as its insert/delete
    * pair — so only true REWRITES (file removals) skip. Events NET over the
    * whole range exactly like the single-shot fast path (a micro-batch is
    * unordered, so an un-netted insert+delete pair for one row would let a
    * deletes-first consumer resurrect it): a row both appended and deleted
    * inside the range emits nothing, delete rows emit only for rows the stream
    * could have delivered (the s0 baseline), and deletions of a SKIPPED
    * rewrite's files drop (their rows never streamed). Skip mode is therefore
    * LOSSY around rewrites by construction — a rewrite severs file/position
    * identity, so a later delete of a rewritten copy cannot retract the
    * original insert (spec-pinned); exact replicas must re-sync from a full
    * snapshot after a skipped rewrite. The strict default refuses the range
    * instead. Files appended in a
    * clean transition are emitted from THAT snapshot even if a later in-range
    * rewrite replaced them (snapshots are immutable; keep them unexpired until
    * streams drain). Expiry gaps merge adjacent transitions — a merged hop that
    * mixes an append with a rewrite is skipped whole.
    */
  private def transitionWalk(s0: Int, s1: Int): Seq[Planned] = {
    val ids = ManifestTables.snapshotIds(dir).filter(id => id > s0 && id <= s1).sorted
    val startRefs = ManifestTables.readSnapshotRefs(dir, Some(s0))
    val s0Entries = ManifestTables.entriesOf(dir, startRefs)
    val s0Paths = s0Entries.map(_.path).toSet
    var prevPaths = s0Paths
    // equality-delete activity folds into the skip rule like any other
    // non-append: its row removals carry no positions, so a transition that grows
    // eq deletes is skipped whole (documented-lossy, same as rewrites)
    var prevDelNames = startRefs.deletes.toSet ++ startRefs.eqDeletes
    var prevDels: Map[String, Array[Long]] =
      if (changelog) ManifestTables.deletedPositions(dir, startRefs) else Map.empty
    // accumulated over the walk, netted at the end
    val entryOf = scala.collection.mutable.Map[String, ManifestTables.Entry]()
    s0Entries.foreach(e => entryOf(e.path) = e)
    val inserted = scala.collection.mutable.LinkedHashMap[String, ManifestTables.Entry]()
    val insertDels = scala.collection.mutable.Map[String, Vector[Long]]()   // net-out
    val baselineDels = scala.collection.mutable.Map[String, Vector[Long]]() // delete rows
    var prevEqNames = startRefs.eqDeletes.toSet
    for (id <- ids) {
      val refs = ManifestTables.readSnapshotRefs(dir, Some(id))
      val entries = ManifestTables.entriesOf(dir, refs)
      val paths = entries.map(_.path).toSet
      val delNames = refs.deletes.toSet ++ refs.eqDeletes
      val eqNames = refs.eqDeletes.toSet
      val filesGrew = prevPaths.subsetOf(paths)
      if (!changelog) {
        if (filesGrew && delNames == prevDelNames)
          entries.filterNot(e => prevPaths.contains(e.path))
            .foreach(e => inserted(e.path) = e)
      } else if (filesGrew && prevDelNames.subsetOf(delNames) && eqNames == prevEqNames) {
        entries.foreach(e => entryOf(e.path) = e)
        entries.filterNot(e => prevPaths.contains(e.path))
          .foreach(e => inserted(e.path) = e)
        val dels = ManifestTables.deletedPositions(dir, refs)
        ManifestDataSource.newDeletePositions(prevDels, dels).foreach {
          case (path, poss) =>
            if (s0Paths.contains(path))
              baselineDels(path) = baselineDels.getOrElse(path, Vector.empty) ++ poss
            else if (inserted.contains(path))
              insertDels(path) = insertDels.getOrElse(path, Vector.empty) ++ poss
            // else: the file came from a SKIPPED rewrite — its rows never
            // streamed, so their deletion emits nothing
        }
        prevDels = dels
      } else if (changelog) {
        // rewrite transition skipped: reset the delete baseline to this snapshot
        prevDels = ManifestTables.deletedPositions(dir, refs)
      }
      prevPaths = paths
      prevDelNames = delNames
      prevEqNames = eqNames
    }
    inserted.values.toSeq.map(e =>
      (e, insertDels.get(e.path).map(_.sorted.toArray).getOrElse(NoPos), NoPos,
        insertCT, NoEq)) ++
      baselineDels.toSeq.sortBy(_._1).map { case (path, poss) =>
        (entryOf(path), NoPos, poss.sorted.toArray, "delete", NoEq) }
  }

  private def build(planned: Seq[Planned]): Array[InputPartition] = {
    // a stream plans entries from MANY snapshots, so specid-0 entries resolve
    // under the spec of the snapshot they were read from (sound by the respec
    // stamping invariant — see ManifestTables.mainChainSpecResolver)
    val specOf = ManifestTables.mainChainSpecResolver(dir)
    val kept = planned
      .filter { case (e, _, _, _, _) =>
        ManifestDataSource.entryWithinBoundsBy(specOf, partitionValues)(e) }
      .filter { case (e, _, _, _, _) => ManifestStats.allows(e.stats, statBounds) }
    // batch-uniform row mode, decided over the SURVIVING partitions: deletes
    // confined to pruned-away files must not tax the rest of the batch
    val rowMode = kept.exists(p => p._2.nonEmpty || p._3.nonEmpty || p._5.nonEmpty)
    kept.map { case (e, dels, only, ct, eq) =>
      ManifestDataInputPartition(s"$dir/${e.path}", e.path,
        ManifestDataSource.normalizePartition(specOf, partCols)(e),
        if (partCols.isEmpty) Array.empty
        else ManifestDataSource.keyDatumsBy(specOf, partCols)(e),
        deleted = dels, changeType = ct, emitOnly = only,
        rowMode = rowMode, eqDels = eq): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val fields = required.fields.map(f => (f.name, f.dataType))
    // factory-level forceRows stays off: batches that carry deleted/emitOnly
    // positions (initial state loads, changelog delete views) flip to row mode
    // via the PER-PARTITION rowMode flag that build() sets batch-uniformly —
    // remove that flag and columnar readers would silently ignore the positions
    new ManifestDataReaderFactory(fields, partCols, None, forceRows = false,
      colIds = ManifestTables.readSnapshotRefs(dir, None).colIds, bounds = statBounds,
      defaults = ManifestDataSource.existenceDefaults(
        ManifestDataSource.tableSchema(dir, None)))
  }

  override def commit(end: StreamOffset): Unit = () // snapshots are immutable; nothing to release
  override def stop(): Unit = ()
}

private case class ManifestDataInputPartition(file: String, relPath: String,
    partition: String, keyDatums: Array[Any] = Array.empty,
    deleted: Array[Long] = Array.emptyLongArray,
    changeType: String = "", emitOnly: Array[Long] = Array.emptyLongArray,
    rowMode: Boolean = false,
    eqDels: Seq[ManifestTables.EqDelete] = Nil)
    extends InputPartition with org.apache.spark.sql.connector.read.HasPartitionKey {
  // typed partition-value tuple — the grouping key for storage-partitioned joins
  override def partitionKey(): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(keyDatums)
}

private[sources] object ManifestAggScan {
  sealed trait AggSpec extends Serializable
  case object AggCountStar extends AggSpec
  /** COUNT(col): rows minus footer null counts — no bounds, no page decodes. */
  case class AggCountCol(col: String) extends AggSpec
  case class AggMin(col: String, dt: DataType) extends AggSpec
  case class AggMax(col: String, dt: DataType) extends AggSpec
}

/** One pre-merged aggregate partial computed ENTIRELY from manifest metadata on the
  * driver — no file, no footer, nothing opened on an executor. `values` align with
  * the scan's agg specs, already in catalyst-internal form (Long/Int/null).
  */
private case class ManifestMetaAggInputPartition(partition: String, values: Array[Any])
    extends InputPartition

/** Pushed-aggregate scan: ONE row per committed file, computed from the parquet
  * footer only (row counts + per-column-chunk min/max statistics) — a full-table
  * COUNT(*)/MIN/MAX costs O(files) footer reads and zero page decodes, the same
  * answer path Iceberg/parquet metadata-only queries take. Spark performs the final
  * merge of the per-file partials (partial pushdown).
  *
  * MANIFEST-METADATA fast path on top: entries whose manifest row carries an exact
  * row count and V2 stats records (exact null counts + exact bounds — the 5th-field
  * marker, see ManifestStats) answer their partial WITHOUT any footer open; those
  * partials pre-merge per partition tuple on the driver into ONE synthetic input
  * partition per group, so COUNT/MIN/MAX over a fully V2-written table costs
  * O(manifest read) total — Iceberg's record_count / null_value_counts / bounds
  * metadata aggregation — while legacy or stat-refused entries (pre-feature
  * segments, NaN/over-long-string bounds, pre-ADD columns) keep the per-file
  * footer path and Spark's final merge combines the two streams exactly.
  */
private class ManifestAggScan(dir: String, partCols: Seq[ManifestTables.PartCol],
    partitionValues: Map[String, Set[String]], snapshot: Option[Int],
    groupCols: Seq[String], aggs: Seq[ManifestAggScan.AggSpec],
    startSnapshot: Option[Int] = None, defaults: Map[String, Any] = Map.empty)
    extends Scan with Batch {
  import ManifestAggScan._

  private lazy val pinnedRefs = ManifestTables.readSnapshotRefs(dir, snapshot)
  private lazy val pinned: Seq[ManifestTables.Entry] = {
    val refs = pinnedRefs
    val entries = ManifestTables.entriesOf(dir, refs)
    // incremental aggregate: a delta is WHOLE appended files (guards enforce it),
    // so footer statistics over exactly those files answer "count/min/max of
    // everything since snapshot S" without opening a single data page
    val baseline = startSnapshot match {
      case None => Set.empty[String]
      case Some(s0) => ManifestDataSource.incrementalBaseline(
        dir, s0, refs, entries.map(_.path).toSet)
    }
    // evolution-aware: prune each entry under its own spec, then re-lay its
    // partition values out under the scan spec — the factory and the per-tuple
    // pre-merge below both split by the scan spec's length. Two specs' files
    // sharing an identity tuple may pre-merge into separate partial rows (hidden
    // "" placeholder vs a routed value); Spark's final agg re-merges them by the
    // emitted group VALUES, so answers never move.
    val specOf = ManifestTables.specResolver(dir, partCols)
    entries
      .filter(e => !baseline.contains(e.path))
      .filter(ManifestDataSource.entryWithinBoundsBy(specOf, partitionValues))
      .map(e => e.copy(partition = ManifestDataSource.normalizePartition(specOf, partCols)(e)))
  }

  // scan output contract (positional): groupBy columns first, then one column per
  // aggregate — count as long, min/max in the column's own type
  override def readSchema(): StructType = {
    val g = groupCols.map { n =>
      val pc = partCols.find(_.name == n).get
      StructField(n, ManifestDataSource.sparkTypeOf(pc), nullable = false)
    }
    val a = aggs.map {
      case AggCountStar => StructField("count(*)", LongType, nullable = false)
      case AggCountCol(c) => StructField(s"count($c)", LongType, nullable = false)
      case AggMin(c, dt) => StructField(s"min($c)", dt)
      case AggMax(c, dt) => StructField(s"max($c)", dt)
    }
    StructType(g ++ a)
  }
  override def toBatch: Batch = this

  // name the requested column had when a given entry's stats were recorded: the
  // record rides under the WRITE-TIME name; the column-id registry's name history
  // resolves it (unambiguous — name reuse after a drop is rejected at ALTER time)
  @transient private lazy val nameHistory: Map[String, Seq[String]] =
    pinnedRefs.colIds.map(ManifestTables.parseColIds).getOrElse(Nil)
      .filterNot(_.dropped).map(c => c.current -> c.names).toMap

  /** This entry's per-agg partial from manifest metadata alone, or None when any
    * agg needs a footer (no recorded row count, no V2 record for the column,
    * unusable '?' bounds). Values are raw Longs (finalized per-type at pre-merge).
    */
  private def metaPartial(e: ManifestTables.Entry): Option[Array[Any]] = {
    if (e.rows < 0) return None // pre-feature entry: rows unknown -> footer
    lazy val recs = ManifestStats.parseRecs(e.stats)
    def recOf(c: String): Option[ManifestStats.Rec] =
      nameHistory.getOrElse(c, Seq(c)).flatMap(recs.get).headOption
    val out = new Array[Any](aggs.length)
    var i = 0
    while (i < aggs.length) {
      aggs(i) match {
        case AggCountStar => out(i) = java.lang.Long.valueOf(e.rows)
        case AggCountCol(c) => recOf(c) match {
          // the 5th field is an exact tally by construction wherever it exists
          case Some(r) if r.nulls.isDefined =>
            out(i) = java.lang.Long.valueOf(e.rows - r.nulls.get)
          case _ => return None
        }
        case AggMin(c, _) => recOf(c) match {
          // nulls presence = V2 exactness marker: 4-field records can be merged
          // bounds (prune-safe but possibly stale after a delete removed the
          // extreme row) and must never answer an aggregate
          case Some(r) if r.nulls.isDefined && r.mn.isEmpty => out(i) = null // all-null file
          case Some(r) if r.nulls.isDefined && r.kind == 'l' && r.mn != "?" =>
            out(i) = java.lang.Long.valueOf(r.mn.toLong)
          case _ => return None
        }
        case AggMax(c, _) => recOf(c) match {
          case Some(r) if r.nulls.isDefined && r.mx.isEmpty => out(i) = null
          case Some(r) if r.nulls.isDefined && r.kind == 'l' && r.mx != "?" =>
            out(i) = java.lang.Long.valueOf(r.mx.toLong)
          case _ => return None
        }
      }
      i += 1
    }
    Some(out)
  }

  /** (pre-merged metadata partials per partition tuple, entries needing footers). */
  @transient private lazy val metaSplit
      : (Seq[ManifestMetaAggInputPartition], Seq[ManifestTables.Entry]) = {
    val tagged = pinned.map(e => (e, metaPartial(e)))
    val footer = tagged.collect { case (e, None) => e }
    val meta = tagged.collect { case (e, Some(p)) => (e.partition, p) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (part, ps) =>
        val merged = new Array[Any](aggs.length)
        aggs.indices.foreach { i =>
          val vs = ps.map(_._2(i))
          merged(i) = aggs(i) match {
            case AggCountStar | AggCountCol(_) =>
              java.lang.Long.valueOf(vs.map(_.asInstanceOf[java.lang.Long].longValue).sum)
            case a =>
              val nn = vs.collect { case l: java.lang.Long => l.longValue }
              if (nn.isEmpty) null // every V2 file in the group is all-null
              else {
                val v = a match {
                  case AggMin(_, _) => nn.min
                  case _ => nn.max
                }
                // finalize to the column's catalyst-internal type
                a match {
                  case AggMin(_, IntegerType | DateType) | AggMax(_, IntegerType | DateType) =>
                    java.lang.Integer.valueOf(v.toInt)
                  case _ => java.lang.Long.valueOf(v)
                }
              }
          }
        }
        ManifestMetaAggInputPartition(part, merged)
      }
    (meta, footer)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (meta, footer) = metaSplit
    val files = footer
      .map(e => ManifestDataInputPartition(s"$dir/${e.path}", e.path, e.partition): InputPartition)
    val all = (meta ++ files).toArray[InputPartition]
    // GLOBAL aggregation over zero files must still yield count 0 (Spark's final agg
    // over an empty partial set would report null); one synthetic all-null/zero
    // partial row keeps the semantics exact. Grouped aggregation over zero files is
    // correctly empty.
    if (all.isEmpty && groupCols.isEmpty)
      Array(ManifestDataInputPartition("", "", ""))
    else all
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestAggReaderFactory(partCols, groupCols, aggs, pinnedRefs.colIds, defaults)
  override def description(): String = {
    val a = aggs.map {
      case AggCountStar => "count(*)"
      case AggCountCol(c) => s"count($c)"
      case AggMin(c, _) => s"min($c)"
      case AggMax(c, _) => s"max($c)"
    }
    val footerN = metaSplit._2.size
    s"manifest_data_agg($dir, pushed=[${a.mkString(",")}], " +
      s"group=[${groupCols.mkString(",")}], files=${pinned.size}, " +
      s"metaFiles=${pinned.size - footerN}, footerFiles=$footerN, " +
      s"metaGroups=${metaSplit._1.size})"
  }
}

private class ManifestAggReaderFactory(partCols: Seq[ManifestTables.PartCol],
    groupCols: Seq[String], aggs: Seq[ManifestAggScan.AggSpec],
    colIds: Option[String] = None, defaults: Map[String, Any] = Map.empty)
    extends PartitionReaderFactory {
  import ManifestAggScan._

  // same id/name-history resolution as the data reader: footer chunks of a
  // pre-rename file carry the OLD physical name
  @transient private lazy val colIdReg: Seq[ManifestTables.ColId] =
    colIds.map(ManifestTables.parseColIds).getOrElse(Nil)
  @transient private lazy val idOf: Map[String, Int] =
    colIdReg.filterNot(_.dropped).map(c => c.current -> c.id).toMap
  @transient private lazy val historyOf: Map[String, Seq[String]] =
    colIdReg.filterNot(_.dropped).map(c => c.current -> c.names).toMap

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    // driver-pre-merged metadata partial: nothing to open, emit the row as-is
    partition match {
      case m: ManifestMetaAggInputPartition =>
        return new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = !emitted
          override def get(): InternalRow = {
            emitted = true
            val partVals = ManifestDataSource.splitPartValues(m.partition, partCols.length)
            val g = groupCols.map { n =>
              val i = partCols.indexWhere(_.name == n)
              ManifestDataSource.internalPartValue(partCols(i).tpe, partVals(i))
            }
            InternalRow.fromSeq(g ++ m.values.toSeq)
          }
          override def close(): Unit = ()
        }
      case _ => ()
    }
    val p = partition.asInstanceOf[ManifestDataInputPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = !emitted
      override def get(): InternalRow = {
        emitted = true
        if (p.file.isEmpty) {
          // synthetic empty-table partial: count 0, min/max null (see planInputPartitions)
          return InternalRow.fromSeq(aggs.map {
            case AggCountStar => 0L
            case AggCountCol(_) => 0L
            case _ => null
          })
        }
        val in = ManifestDataSource.parquetInput(p.file)
        val reader = ParquetFileReader.open(in)
        val (rowCount, stats, counts) = try {
          val blocks = reader.getFooter.getBlocks.asScala.toSeq
          val rc = blocks.map(_.getRowCount).sum
          // per-column merged (min, max) across row groups; None when any chunk
          // lacks usable stats (then the answer cannot come from the footer — fail
          // loudly rather than silently mis-aggregate)
          val fileFields = reader.getFooter.getFileMetaData.getSchema.getFields.asScala.toSeq
          val fileHasIds = fileFields.exists(_.getId != null)
          // requested column -> this file's physical name: by FIELD ID, else name
          // history (pre-rename files carry the old name); None = the column did
          // not exist when this file was written (all its rows are null here), so
          // the per-file MIN/MAX partial is null — not an error
          def localNameOf(c: String): Option[String] = {
            val viaId = if (!fileHasIds) None
              else idOf.get(c).flatMap(id => fileFields.find(f =>
                f.getId != null && f.getId.intValue == id).map(_.getName))
            val viaName = fileFields.map(_.getName).find(historyOf.getOrElse(c, Seq(c)).contains)
            viaId orElse viaName
          }
          val wanted = aggs.collect { case AggMin(c, _) => c; case AggMax(c, _) => c }.distinct
          val merged = wanted.map { c =>
            localNameOf(c) match {
              // pre-ADD file: every row serves the column's existence DEFAULT when
              // one is declared (so min = max = default), else all rows are null
              case None => c -> (defaults.getOrElse(c, null): Any,
                defaults.getOrElse(c, null): Any)
              case Some(local) =>
                val chunks = blocks.map { b =>
                  b.getColumns.asScala.find(_.getPath.toDotString == local).getOrElse(
                    throw new IllegalStateException(s"column $c ($local) missing from ${p.file}"))
                }
                val sts = chunks.map(_.getStatistics)
                require(sts.forall(s => s != null && !s.isEmpty),
                  s"parquet footer statistics unavailable for column $c in ${p.file} — " +
                    "cannot serve the pushed aggregate from metadata")
                val nonNull = sts.filter(_.hasNonNullValue)
                lazy val ord: Ordering[Any] = scala.math.Ordering.comparatorToOrdering(
                  nonNull.head.comparator.asInstanceOf[java.util.Comparator[Any]])
                val mn = if (nonNull.isEmpty) null
                  else nonNull.map(_.genericGetMin.asInstanceOf[Any]).min(ord)
                val mx = if (nonNull.isEmpty) null
                  else nonNull.map(_.genericGetMax.asInstanceOf[Any]).max(ord)
                c -> (mn, mx)
            }
          }.toMap
          // COUNT(col) partials: per row group, rows minus the chunk's null count —
          // null counts are exact writer-side tallies, valid even where min/max
          // bounds are refused (NaN floats, truncated strings)
          val wantedCounts = aggs.collect { case AggCountCol(c) => c }.distinct
          val nonNullCounts = wantedCounts.map { c =>
            localNameOf(c) match {
              // pre-ADD file: all rows serve the (non-null) existence default when
              // one is declared, else the column is all null here
              case None => c -> (if (defaults.contains(c)) rc else 0L)
              case Some(local) =>
                val nulls = blocks.map { b =>
                  val chunk = b.getColumns.asScala.find(_.getPath.toDotString == local)
                    .getOrElse(throw new IllegalStateException(
                      s"column $c ($local) missing from ${p.file}"))
                  val s = chunk.getStatistics
                  require(s != null && s.isNumNullsSet,
                    s"parquet footer null counts unavailable for column $c in ${p.file} — " +
                      "cannot serve the pushed COUNT from metadata")
                  s.getNumNulls
                }.sum
                c -> (rc - nulls)
            }
          }.toMap
          (rc, merged, nonNullCounts)
        } finally reader.close()

        val partVals = ManifestDataSource.splitPartValues(p.partition, partCols.length)
        def datum(v: Any, dt: DataType): Any = v match {
          case null => null
          case other => dt match {
            // Number, not Long/Double: a pre-widening file's footer carries the
            // NARROW boxed type (Integer under a bigint column) — upcast losslessly
            case LongType | TimestampType | TimestampNTZType =>
              other.asInstanceOf[java.lang.Number].longValue()
            case IntegerType | DateType => other.asInstanceOf[java.lang.Integer].intValue()
            case DoubleType => other.asInstanceOf[java.lang.Number].doubleValue()
            case FloatType => other.asInstanceOf[java.lang.Float].floatValue()
            case BooleanType => other.asInstanceOf[java.lang.Boolean].booleanValue()
            case o => throw new IllegalStateException(s"unreachable stat type $o")
          }
        }
        val g = groupCols.map { n =>
          val i = partCols.indexWhere(_.name == n)
          ManifestDataSource.internalPartValue(partCols(i).tpe, partVals(i))
        }
        val a = aggs.map {
          case AggCountStar => rowCount
          case AggCountCol(c) => counts(c)
          case AggMin(c, dt) => datum(stats(c)._1, dt)
          case AggMax(c, dt) => datum(stats(c)._2, dt)
        }
        InternalRow.fromSeq(g ++ a)
      }
      override def close(): Unit = ()
    }
  }
}

/** Read-time upcasting view over a decoded vector: serves a WIDENED table type
  * (bigint over an int32 file, double over a float file) without copying — the
  * scan-time half of metadata-only type widening. Only the wide accessor is ever
  * invoked (codegen reads by the scan's declared type); the child vector is owned
  * and closed by the parquet reader, so close() here is a no-op.
  */
private[sources] final class WideningColumnVector(
    child: org.apache.spark.sql.vectorized.ColumnVector, target: DataType)
  extends org.apache.spark.sql.vectorized.ColumnVector(target) {
  override def close(): Unit = ()
  override def hasNull: Boolean = child.hasNull
  override def numNulls: Int = child.numNulls
  override def isNullAt(i: Int): Boolean = child.isNullAt(i)
  override def getLong(i: Int): Long = child.getInt(i).toLong
  override def getDouble(i: Int): Double = child.getFloat(i).toDouble
  private def refuse(what: String): Nothing = throw new UnsupportedOperationException(
    s"$what on a widened ${target.simpleString} vector")
  override def getBoolean(i: Int): Boolean = refuse("getBoolean")
  override def getByte(i: Int): Byte = refuse("getByte")
  override def getShort(i: Int): Short = refuse("getShort")
  override def getInt(i: Int): Int = refuse("getInt")
  override def getFloat(i: Int): Float = refuse("getFloat")
  override def getDecimal(i: Int, precision: Int, scale: Int): org.apache.spark.sql.types.Decimal =
    refuse("getDecimal")
  override def getUTF8String(i: Int): UTF8String = refuse("getUTF8String")
  override def getBinary(i: Int): Array[Byte] = refuse("getBinary")
  override def getArray(i: Int): org.apache.spark.sql.vectorized.ColumnarArray = refuse("getArray")
  override def getMap(i: Int): org.apache.spark.sql.vectorized.ColumnarMap = refuse("getMap")
  override def getChild(i: Int): org.apache.spark.sql.vectorized.ColumnVector = refuse("getChild")
}

private class ManifestDataReaderFactory(fields: Array[(String, DataType)],
    partCols: Seq[ManifestTables.PartCol], limit: Option[Int] = None,
    forceRows: Boolean = false, colIds: Option[String] = None,
    bounds: Seq[ManifestStats.Bound] = Nil,
    defaults: Map[String, Any] = Map.empty)
    extends PartitionReaderFactory {

  /** Existence-DEFAULT constant a column absent from a (pre-ALTER) file serves
    * instead of null. String defaults travel as java Strings (the factory ships to
    * executors); converted to UTF8String here, at use.
    */
  private def defaultDatum(n: String): Any = defaults.get(n) match {
    case Some(s: String) => UTF8String.fromString(s)
    case Some(v) => v
    case None => null
  }

  // column-id registry views (rename/drop evolution): current name -> field id,
  // and current name -> full name history (for id-less legacy/maintenance files)
  @transient private lazy val colIdReg: Seq[ManifestTables.ColId] =
    colIds.map(ManifestTables.parseColIds).getOrElse(Nil)
  @transient private lazy val idOf: Map[String, Int] =
    colIdReg.filterNot(_.dropped).map(c => c.current -> c.id).toMap
  @transient private lazy val historyOf: Map[String, Seq[String]] =
    colIdReg.filterNot(_.dropped).map(c => c.current -> c.names).toMap

  private def partNames = partCols.map(_.name).toSet
  // per-file CONSTANT fields: partition columns, the _file provenance column, and
  // the changelog _change_type (one file view's delta rows share one change type)
  private def constNames =
    partNames + ManifestDataSource.FileCol + ManifestDataSource.ChangeCol
  // _pos is neither constant nor stored: the row reader counts it
  private def dataFields = fields.filter(f =>
    !constNames.contains(f._1) && f._1 != ManifestDataSource.PosCol)
  private def hasPos = fields.exists(_._1 == ManifestDataSource.PosCol)
  private def tpeOf(name: String): String = partCols.find(_.name == name).get.tpe

  /** Typed internal value of constant column `name` for one input partition
    * (a partition value, the file's manifest-relative path for `_file`, or the
    * partition's change type for changelog reads).
    */
  private def partDatum(p: ManifestDataInputPartition, name: String): Any = {
    if (name == ManifestDataSource.FileCol) return UTF8String.fromString(p.relPath)
    if (name == ManifestDataSource.ChangeCol) return UTF8String.fromString(p.changeType)
    val vals = ManifestDataSource.splitPartValues(p.partition, partCols.length)
    ManifestDataSource.internalPartValue(tpeOf(name), vals(partCols.indexWhere(_.name == name)))
  }

  /** Residual data-column bounds as one parquet FilterPredicate over THIS file's
    * local column names — the row-group-skipping input. Only exact, total-ordered
    * physical types participate: INT32/INT64 and BINARY-string (UTF8 binary order
    * matches Spark's string order); float/double stay out (NaN breaks bound
    * ordering — the same refusal as the stats layer) and widened columns stay out
    * (narrow physical type under a wide literal). A bound that references a column
    * this file lacks (pre-ADD) or cannot convert simply drops — under-filtering is
    * always safe because every bound is Spark-residual.
    */
  private def rowGroupPredicate(resolve: Map[String, String], widen: Set[String],
      fileFields: Seq[org.apache.parquet.schema.Type])
      : Option[org.apache.parquet.filter2.predicate.FilterPredicate] = {
    import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
    import org.apache.parquet.io.api.Binary
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    def ofLong(local: String, op: String, vs: Seq[Any]): Option[FilterPredicate] = {
      val c = FilterApi.longColumn(local)
      val conv = vs.map {
        case l: java.lang.Long => l
        case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue)
        case _ => return None
      }
      op match {
        case "=" => Some(FilterApi.eq(c, conv.head))
        case "in" => conv.map(v => FilterApi.eq(c, v): FilterPredicate)
          .reduceOption(FilterApi.or)
        case "<" => Some(FilterApi.lt(c, conv.head))
        case "<=" => Some(FilterApi.ltEq(c, conv.head))
        case ">" => Some(FilterApi.gt(c, conv.head))
        case ">=" => Some(FilterApi.gtEq(c, conv.head))
        case _ => None
      }
    }
    def ofInt(local: String, op: String, vs: Seq[Any]): Option[FilterPredicate] = {
      val c = FilterApi.intColumn(local)
      val conv = vs.map {
        case i: java.lang.Integer => i
        case _ => return None
      }
      op match {
        case "=" => Some(FilterApi.eq(c, conv.head))
        case "in" => conv.map(v => FilterApi.eq(c, v): FilterPredicate)
          .reduceOption(FilterApi.or)
        case "<" => Some(FilterApi.lt(c, conv.head))
        case "<=" => Some(FilterApi.ltEq(c, conv.head))
        case ">" => Some(FilterApi.gt(c, conv.head))
        case ">=" => Some(FilterApi.gtEq(c, conv.head))
        case _ => None
      }
    }
    def ofBinary(local: String, op: String, vs: Seq[Any]): Option[FilterPredicate] = {
      val c = FilterApi.binaryColumn(local)
      val conv = vs.map {
        case u: UTF8String => Binary.fromConstantByteArray(u.getBytes)
        case s: String => Binary.fromString(s)
        case _ => return None
      }
      op match {
        case "=" => Some(FilterApi.eq(c, conv.head))
        case "in" => conv.map(v => FilterApi.eq(c, v): FilterPredicate)
          .reduceOption(FilterApi.or)
        case "<" => Some(FilterApi.lt(c, conv.head))
        case "<=" => Some(FilterApi.ltEq(c, conv.head))
        case ">" => Some(FilterApi.gt(c, conv.head))
        case ">=" => Some(FilterApi.gtEq(c, conv.head))
        case _ => None
      }
    }
    def predOf(b: ManifestStats.Bound): Option[FilterPredicate] = {
      if (b.values.isEmpty || widen.contains(b.col)) return None
      val local = resolve.get(b.col).getOrElse(return None)
      val ft = fileFields.find(_.getName == local).getOrElse(return None)
      if (!ft.isPrimitive) return None
      val sparkType = fields.collectFirst { case (n, dt) if n == b.col => dt }
      (ft.asPrimitiveType.getPrimitiveTypeName, sparkType) match {
        case (PrimitiveTypeName.INT64, Some(LongType | TimestampType | TimestampNTZType)) =>
          ofLong(local, b.op, b.values)
        case (PrimitiveTypeName.INT32, Some(IntegerType | DateType)) =>
          ofInt(local, b.op, b.values)
        case (PrimitiveTypeName.BINARY, Some(StringType)) =>
          ofBinary(local, b.op, b.values)
        case _ => None
      }
    }
    bounds.flatMap(predOf).reduceOption(FilterApi.and)
  }

  /** COLUMNAR reads whenever any data column is projected: each file is decoded by
    * Spark's own VectorizedParquetRecordReader into ColumnarBatches (dictionary-aware,
    * page-at-a-time, nested-list capable), so the manifest scan pays the same
    * per-byte decode cost as a native parquet scan instead of the several-fold
    * row-at-a-time Group-API tax; Spark's ColumnarToRow then runs inside whole-stage
    * codegen. Zero-data-column scans (count(*), partition-only) stay row-based on
    * footer counts — no page is read at all, which beats any columnar decode.
    */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    // rowMode is a PER-BATCH uniform flag (a streaming initial load applying
    // pending deletes); batch scans keep using the factory-level forceRows —
    // either way every partition of one scan/batch answers identically
    dataFields.nonEmpty && !hasPos && !forceRows &&
      !partition.asInstanceOf[ManifestDataInputPartition].rowMode &&
      partition.asInstanceOf[ManifestDataInputPartition].eqDels.isEmpty

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val p = partition.asInstanceOf[ManifestDataInputPartition]
    val df = dataFields
    // the vectorized reader produces columns in FILE-schema order (filtered to the
    // requested names) with partition columns appended last; the scan contract is
    // `fields` order — read the footer to learn file order, then permute vectors
    val in = ManifestDataSource.parquetInput(p.file)
    val footerReader = ParquetFileReader.open(in)
    val fileSchema = try footerReader.getFileMetaData.getSchema finally footerReader.close()
    val fileFields = fileSchema.getFields.asScala.toSeq
    val fileHasIds = fileFields.exists(_.getId != null)
    // requested data column -> the FILE-LOCAL field name serving it: by FIELD ID
    // when both sides carry ids (rename-proof — the Iceberg resolution), else by
    // the column's name HISTORY (id-less legacy and Spark-written maintenance
    // files; unambiguous because name reuse is rejected at ALTER time).
    // Unresolved -> constant null (schema evolution's null-fill).
    val resolve: Map[String, String] = df.flatMap { case (n, _) =>
      val viaId =
        if (!fileHasIds) None
        else idOf.get(n).flatMap(id => fileFields.find(f =>
          f.getId != null && f.getId.intValue == id).map(_.getName))
      // name-history fallback runs even when the file carries ids: the reuse ban
      // makes a historical name unambiguous, and legacy files may carry ids in
      // odd positions (e.g. list ELEMENT ids from older writers)
      val viaName = {
        val hist = historyOf.getOrElse(n, Seq(n))
        fileFields.map(_.getName).find(hist.contains)
      }
      (viaId orElse viaName).map(n -> _)
    }.toMap
    val wantedLocal = resolve.values.toSet
    val readCols = fileFields.map(_.getName).filter(wantedLocal).toArray
    // type widening (int->bigint / float->double ALTERs): a pre-widening file keeps
    // its narrow PHYSICAL type — decode it natively, then serve the scan's wide type
    // through an upcasting vector view (Iceberg's type-promotion read rule); an
    // INT32/FLOAT column requested as long/double can only arise from such an ALTER
    val widen: Set[String] = {
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
      df.flatMap { case (n, dt) =>
        resolve.get(n).flatMap { loc =>
          val ft = fileFields.find(_.getName == loc).get
          if (!ft.isPrimitive) None
          else (ft.asPrimitiveType.getPrimitiveTypeName, dt) match {
            case (PrimitiveTypeName.INT32, LongType) => Some(n)
            case (PrimitiveTypeName.FLOAT, DoubleType) => Some(n)
            case _ => None
          }
        }
      }.toSet
    }
    // schema evolution: requested data columns ABSENT from this (pre-ALTER) file are
    // served as constant nulls through initBatch's appended-constant mechanism —
    // exactly how Spark's native scan serves partition values, so the null columns
    // cost no decode and stay columnar
    val present = resolve.keySet
    val missing = df.filter { case (n, _) => !present.contains(n) }
    if (readCols.isEmpty) return constantBatchReader(p, missing)
    val reader = new org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC", /*useOffHeap=*/ false, /*capacity=*/ 4096)
    var ok = false
    try {
      rowGroupPredicate(resolve, widen, fileFields) match {
        case None =>
          reader.initialize(p.file, java.util.Arrays.asList(readCols: _*))
        case Some(pred) =>
          // ROW-GROUP SKIPPING (the within-file layer under the manifest's
          // file-level stats pruning): initialize through the split+context path —
          // Spark's own production parquet-pushdown wiring — so parquet's
          // row-group filter applies the predicate at STATISTICS, DICTIONARY, and
          // BLOOMFILTER levels before any page is decoded. The bounds are
          // Spark-residual (re-evaluated row-by-row above the scan), so a kept
          // row group's non-matching rows are filtered there — skipping is a pure
          // I/O win and can never change answers.
          val conf = new org.apache.hadoop.conf.Configuration(ManifestDataSource.hadoopConf())
          conf.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
            classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport].getName)
          // the exact five schema-interpretation flags the convenience initialize
          // hardcodes (read semantics must be identical on both init paths; the
          // schema converter requires them PRESENT, no defaults)
          locally {
            import org.apache.spark.sql.internal.SQLConf
            Seq(SQLConf.PARQUET_BINARY_AS_STRING, SQLConf.PARQUET_INT96_AS_TIMESTAMP,
              SQLConf.CASE_SENSITIVE, SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED,
              SQLConf.LEGACY_PARQUET_NANOS_AS_LONG)
              .foreach(e => conf.setBoolean(e.key, false))
          }
          // whole row groups only: page-level column-index filtering stays off —
          // its partial-page row indexes are machinery this scan does not need
          conf.setBoolean(org.apache.parquet.hadoop.ParquetInputFormat
            .COLUMN_INDEX_FILTERING_ENABLED, false)
          // requested catalyst schema = the clipped FILE schema converted: the
          // identical column set/order/physical types the convenience init uses
          val clipped = new org.apache.parquet.schema.MessageType("graft_read",
            fileFields.filter(f => wantedLocal(f.getName)).asJava)
          val sparkReq = new org.apache.spark.sql.execution.datasources.parquet
            .ParquetToSparkSchemaConverter(conf).convert(clipped)
          conf.set(org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport
            .SPARK_ROW_REQUESTED_SCHEMA, sparkReq.json)
          org.apache.parquet.hadoop.ParquetInputFormat.setFilterPredicate(conf, pred)
          // the OLD-API FileSplit (it extends the mapreduce one): the reader base
          // downcasts to it internally
          val split = new org.apache.hadoop.mapred.FileSplit(
            new Path(p.file), 0, in.getLength, Array.empty[String])
          val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(conf,
            new org.apache.hadoop.mapreduce.TaskAttemptID())
          reader.initialize(split, ctx)
      }
      // appended constants, in `fields` order: projected partition columns (typed
      // values) then missing data columns (nulls); initBatch appends them after the
      // data columns in exactly the order given here
      val presentParts = fields.collect { case (n, dt) if constNames.contains(n) => (n, dt) }
      val appended = presentParts ++ missing
      val partSchema = StructType(appended.map { case (n, dt) =>
        StructField(n, dt, nullable = !constNames.contains(n)) })
      val partRow: InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          appended.map { case (n, _) =>
            if (constNames.contains(n)) partDatum(p, n) else defaultDatum(n) })
      reader.initBatch(partSchema, partRow)
      val localIdx = readCols.zipWithIndex.toMap
      val colIdx: Map[String, Int] = resolve.map { case (out, loc) => out -> localIdx(loc) }
      val appendedPos = appended.map(_._1).zipWithIndex.toMap
      val perm: Array[Int] =
        fields.map { case (n, _) =>
          if (colIdx.contains(n)) colIdx(n) else readCols.length + appendedPos(n) }
      val identity = perm.sameElements(perm.indices) && widen.isEmpty
      ok = true
      new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
        private var permuted: org.apache.spark.sql.vectorized.ColumnarBatch = _
        private var served = 0L
        // pushed limit: stop decoding this file once enough rows are out (batch
        // granularity — Spark's global limit trims the overshoot)
        override def next(): Boolean =
          limit.forall(served < _) && reader.nextBatch()
        override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = {
          val rb = reader.resultBatch()
          served += rb.numRows()
          if (identity) rb
          else {
            // the reader reuses its vectors across batches — build the permuted view
            // once, only the row count changes per batch (widened columns wrap in
            // the upcasting view at the same point)
            if (permuted == null)
              permuted = new org.apache.spark.sql.vectorized.ColumnarBatch(
                fields.zipWithIndex.map { case ((n, dt), j) =>
                  val src = rb.column(perm(j))
                  if (widen.contains(n)) new WideningColumnVector(src, dt)
                  else src
                }, rb.numRows())
            permuted.setNumRows(rb.numRows())
            permuted
          }
        }
        override def close(): Unit = reader.close()
      }
    } finally if (!ok) reader.close()
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ManifestDataInputPartition]
    // equality deletes require decoding the key column — footer-count shortcuts
    // would overcount, so eq-carrying files always take the key-checking reader
    if (p.eqDels.nonEmpty) deleteAwareRowReader(p)
    else if (dataFields.isEmpty && !hasPos && p.deleted.isEmpty && p.emitOnly.isEmpty)
      emptyProjectionReader(p)
    // (a clean file in a deletes-carrying scan takes the same row wrapper with an
    // empty skip list — correctness identical, columnar returns after compaction)
    else if (dataFields.isEmpty) syntheticPositionReader(p)
    else deleteAwareRowReader(p)
  }

  /** Zero-data-column projection over a file with deletes and/or a projected
    * `_pos`: positions are IMPLICIT (0..rowCount), so rows synthesize from the
    * footer count + per-file constants, skipping deleted positions — still no
    * page decoded.
    */
  private def syntheticPositionReader(p: ManifestDataInputPartition)
      : PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var total: Long = -1
      private var pos: Long = -1
      private var delIdx = 0
      private var emitted = 0L
      private val posIdx = fields.indexWhere(_._1 == ManifestDataSource.PosCol)
      private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        fields.map { case (n, _) =>
          if (n == ManifestDataSource.PosCol) null else partDatum(p, n) }: Array[Any])
      private var emitIdx = 0
      override def next(): Boolean = {
        if (limit.exists(emitted >= _)) return false
        // changelog delete view: positions are EXPLICIT (the range's deleted
        // positions) — emit exactly those, no footer read needed
        if (p.emitOnly.nonEmpty) {
          if (emitIdx >= p.emitOnly.length) return false
          pos = p.emitOnly(emitIdx); emitIdx += 1
          if (posIdx >= 0) row.update(posIdx, pos)
          emitted += 1
          return true
        }
        if (total < 0) {
          val in = ManifestDataSource.parquetInput(p.file)
          val r = ParquetFileReader.open(in)
          total = try r.getRecordCount finally r.close()
        }
        pos += 1
        while (delIdx < p.deleted.length && p.deleted(delIdx) < pos) delIdx += 1
        while (pos < total && delIdx < p.deleted.length && p.deleted(delIdx) == pos) {
          pos += 1
          while (delIdx < p.deleted.length && p.deleted(delIdx) < pos) delIdx += 1
        }
        if (pos >= total) return false
        if (posIdx >= 0) row.update(posIdx, pos)
        emitted += 1
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }

  /** Data-column read over a file with deletes and/or a projected `_pos`: the
    * COLUMNAR reader still does the decoding (same vectorized path), this wrapper
    * walks its batches row-by-row, tracks the absolute file position, skips
    * deleted positions, and appends `_pos` when projected. Only deleted files and
    * explicit `_pos` scans pay the row-mode tax — clean files stay columnar.
    */
  private def deleteAwareRowReader(p: ManifestDataInputPartition)
      : PartitionReader[InternalRow] = {
    val innerBase = fields.filter(_._1 != ManifestDataSource.PosCol)
    // equality deletes: the key column(s) decode even when unprojected — appended
    // to the inner read, consulted for filtering, never copied to the output
    val eqExtras = p.eqDels.map(d => (d.column, ManifestDataSource.eqDataTypeOf(d.ctype)))
      .distinct.filterNot { case (n, _) => innerBase.exists(_._1 == n) }
    val innerFields = innerBase ++ eqExtras
    // defaults thread through: an equality delete keyed on a defaulted column must
    // see the DEFAULT (not null) for rows in files that predate the column
    val inner = new ManifestDataReaderFactory(innerFields, partCols, None,
      colIds = colIds, defaults = defaults).createColumnarReader(p)
    val eqChecks: Array[InternalRow => Boolean] = p.eqDels.map { d =>
      val ord = innerFields.indexWhere(_._1 == d.column)
      d.ctype match {
        case "long" =>
          val set = d.values.map(_.toLong).toSet
          (r: InternalRow) => !r.isNullAt(ord) && set.contains(r.getLong(ord))
        case "int" =>
          val set = d.values.map(_.toInt).toSet
          (r: InternalRow) => !r.isNullAt(ord) && set.contains(r.getInt(ord))
        case _ =>
          // probe with UTF8String's own equals/hashCode: a per-row
          // UTF8String -> String copy in this hot loop is pure GC pressure
          val set = d.values.map(UTF8String.fromString).toSet
          (r: InternalRow) => !r.isNullAt(ord) && set.contains(r.getUTF8String(ord))
      }
    }.toArray
    val posIdx = fields.indexWhere(_._1 == ManifestDataSource.PosCol)
    // output ordinal -> inner batch ordinal (identity until posIdx, then shifted)
    val srcIdx = fields.indices.filter(_ != posIdx).toArray
    val types = innerFields.map(_._2)
    new PartitionReader[InternalRow] {
      private var batch: org.apache.spark.sql.vectorized.ColumnarBatch = _
      private var rowIt: java.util.Iterator[org.apache.spark.sql.catalyst.InternalRow] = _
      private var pos: Long = -1
      private var delIdx = 0
      private var emitted = 0L
      private val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(fields.length)
      override def next(): Boolean = {
        if (limit.exists(emitted >= _)) return false
        while (true) {
          if (rowIt != null && rowIt.hasNext) {
            val r = rowIt.next()
            pos += 1
            // changelog delete view: keep ONLY the range's deleted positions
            // (sorted — binary search), stopping the file walk entirely once the
            // last one is out; otherwise skip the scan's deleted positions
            if (p.emitOnly.nonEmpty && pos > p.emitOnly.last) return false
            val dead =
              if (p.emitOnly.nonEmpty)
                java.util.Arrays.binarySearch(p.emitOnly, pos) < 0
              else {
                while (delIdx < p.deleted.length && p.deleted(delIdx) < pos) delIdx += 1
                delIdx < p.deleted.length && p.deleted(delIdx) == pos
              }
            if (!dead && !eqChecks.exists(_(r))) {
              var i = 0
              while (i < srcIdx.length) {
                val o = srcIdx(i)
                out.update(o, if (r.isNullAt(i)) null else r.get(i, types(i)))
                i += 1
              }
              if (posIdx >= 0) out.update(posIdx, pos)
              emitted += 1
              return true
            }
          } else {
            if (!inner.next()) return false
            batch = inner.get()
            rowIt = batch.rowIterator()
          }
        }
        false
      }
      override def get(): InternalRow = out
      override def close(): Unit = inner.close()
    }
  }

  /** Every projected field is a constant for this file (partition values, plus data
    * columns the file predates — schema evolution's null-fill): batches of constant
    * vectors sized from the footer row count, no page decoded.
    */
  private def constantBatchReader(p: ManifestDataInputPartition,
      missing: Array[(String, DataType)])
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.ConstantColumnVector
    val capacity = 4096
    val missingNames = missing.map(_._1).toSet
    val vectors = fields.map { case (n, dt) =>
      val v = new ConstantColumnVector(capacity, dt)
      val datum = if (missingNames.contains(n)) defaultDatum(n) else partDatum(p, n)
      (dt, datum) match {
        case (_, null) => v.setNull()
        case (StringType, s: UTF8String) => v.setUtf8String(s)
        case (IntegerType, i: Int) => v.setInt(i)
        case (DateType, d: Int) => v.setInt(d)
        case (LongType, l: Long) => v.setLong(l)
        case (FloatType, f: Float) => v.setFloat(f)
        case (DoubleType, d: Double) => v.setDouble(d)
        case (BooleanType, b: Boolean) => v.setBoolean(b)
        case (t, d) => throw new IllegalStateException(s"unsupported constant $t=$d")
      }
      v: org.apache.spark.sql.vectorized.ColumnVector
    }
    val batch = new org.apache.spark.sql.vectorized.ColumnarBatch(vectors)
    new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
      private var remaining: Long = -1
      override def next(): Boolean = {
        if (remaining < 0) {
          val in = ManifestDataSource.parquetInput(p.file)
          val r = ParquetFileReader.open(in)
          remaining = try r.getRecordCount finally r.close()
          limit.foreach(l => remaining = math.min(remaining, l.toLong))
        }
        if (remaining <= 0) false
        else {
          batch.setNumRows(math.min(capacity.toLong, remaining).toInt)
          remaining -= batch.numRows()
          true
        }
      }
      override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = batch
      override def close(): Unit = batch.close()
    }
  }

  /** Zero data columns requested (count(*) / partition-column-only reads): row count
    * comes from the footer; no page is decoded. Every projected field is a (typed)
    * partition constant.
    */
  private def emptyProjectionReader(p: ManifestDataInputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var remaining: Long = -1
      private val row =
        InternalRow.fromSeq(fields.toSeq.map { case (n, _) => partDatum(p, n) })
      override def next(): Boolean = {
        if (remaining < 0) {
          val in = ManifestDataSource.parquetInput(p.file)
          val r = ParquetFileReader.open(in)
          remaining = try r.getRecordCount finally r.close()
          limit.foreach(l => remaining = math.min(remaining, l.toLong))
        }
        remaining -= 1
        remaining >= 0
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }

}

// ------------------------------------------------------------------------- write path

private class ManifestWriteBuilder(dir: String, tschema: StructType, info: LogicalWriteInfo,
    stagedReplace: Boolean = false, stagedPartTokens: Option[String] = None,
    stagedDdl: Option[String] = None, stagedOp: Option[String] = None,
    stagedRequireFresh: Boolean = false, onCommitted: () => Unit = () => ())
    extends WriteBuilder with SupportsTruncate {
  private var replace = false
  // mode("overwrite") arrives as truncate(): the manifest REPLACES its entry list —
  // the old files stay on disk (time travel keeps every snapshot readable)
  override def truncate(): WriteBuilder = { replace = true; this }

  override def build(): Write = {
    // a STAGED create/replace (StagingTableCatalog CTAS/RTAS) always writes with
    // replace semantics — the staged table is logically brand new, so Spark hands
    // the query over as a plain append; the spec and declared DDL come from the
    // stage call, not from write options (which WAP/branch can therefore not use)
    if (stagedReplace) {
      replace = true
      require(Option(info.options.get("wapId")).isEmpty &&
          Option(info.options.get("branch")).isEmpty,
        "a staged CREATE/REPLACE TABLE write cannot combine with wapId/branch options")
    }
    val incoming = info.schema()
    // the metadata/changelog column names are RESERVED: a data column named
    // _file/_pos/_change_type would commit fine and then read back as the per-file
    // constant / row counter instead of its stored values — reject at write time,
    // never corrupt silently (materializing a changelog read into a table must
    // rename or drop _change_type first)
    Seq(ManifestDataSource.FileCol, ManifestDataSource.PosCol,
        ManifestDataSource.ChangeCol).foreach { r =>
      require(!incoming.fieldNames.contains(r),
        s"'$r' is a reserved metadata column name on manifest tables")
    }
    // partition SPEC: comma-joined tokens — a plain NAME (identity partitioning,
    // the column is a real partition column) or a HIDDEN transform `bucket(n,col)` /
    // `days(col)` / `truncate(w,col)` whose source stays a stored data column;
    // multi-column layouts nest Hive dirs in spec order
    // a BRANCH append joins the BRANCH's table state: its spec, its schema, its
    // column-id registry — main may have respec'd or evolved since the fork.
    // Tolerant filter (an unknown branch still reaches appendToBranch's loud
    // refusal rather than dying on a half-validated layout here).
    val branchTarget = Option(info.options.get("branch"))
      .filter(ManifestTables.branchExists(dir, _))
    // a STAGED create/replace's spec is authoritative — empty means UNPARTITIONED,
    // never "inherit the replaced table's layout" (REPLACE TABLE without
    // PARTITIONED BY must drop the old partitioning, exactly like Iceberg)
    val partSpec: Seq[ManifestTables.PartCol] = if (stagedReplace) {
      stagedPartTokens.map(ManifestDataSource.parsePartColOption(_, incoming)).getOrElse(Nil)
    } else {
      val opt = Option(info.options.get("partcol")).getOrElse("")
      val recorded = branchTarget
        .map(b => ManifestTables.readBranchPartitionSpec(dir, b))
        .getOrElse(
          if (ManifestTables.latestSnapshotId(dir).isDefined)
            ManifestTables.readPartitionSpec(dir)
          else Nil)
      val fromOpt =
        if (opt.isEmpty) Nil else ManifestDataSource.parsePartColOption(opt, incoming)
      // an APPEND must match the recorded spec (its files join an existing
      // layout); an OVERWRITE replaces every file, so it may REDEFINE the spec —
      // Iceberg's REPLACE TABLE semantics (old snapshots stay readable through
      // time travel with their own layout)
      if (!replace && fromOpt.nonEmpty && recorded.nonEmpty)
        require(fromOpt == recorded,
          s"table records partition columns '${recorded.map(ManifestTables.specTokenOf).mkString(",")}', " +
            s"write asked '${fromOpt.map(ManifestTables.specTokenOf).mkString(",")}'")
      if (fromOpt.nonEmpty) fromOpt else recorded
    }
    val partCol = partSpec.map(_.name).mkString(",")
    val partColNames = partSpec.map(_.name)
    partSpec.filter(_.transform.isEmpty).foreach { pc =>
      require(incoming.fieldNames.contains(pc.name),
        s"write is missing the partition column '${pc.name}'")
    }
    partSpec.flatMap(_.transform).foreach { t =>
      require(incoming.fieldNames.contains(t.src),
        s"write is missing the hidden-partition source column '${t.src}'")
    }
    val partTypes = partSpec.map(ManifestTables.typeTokenOf)
    // Append compatibility against the AUTHORITATIVE manifest schema, re-read here:
    // the `tschema` this builder was constructed with is the incoming DF's own
    // schema on the path-based write API (Spark hands TableProvider.getTable the
    // frame's schema for writes), so comparing against it would be vacuous — an
    // append missing an ALTER-added column would silently commit. Overwrites are
    // exempt: they legitimately redefine the schema from the incoming data.
    // `.option("mergeSchema", "true")` on an APPEND turns NEW incoming columns
    // into metadata-only ADD COLUMNs inside the same commit (Delta/Iceberg
    // schema-merge): old files null-fill them at read time via the evolution
    // machinery; existing columns must still match exactly (merge is ADDITIVE —
    // a type change stays an ALTER). The new columns land in the commit's
    // published DDL and get fresh registry ids there (this batch's own files
    // resolve them by name history, like every Spark-written maintenance file).
    val mergeSchema = Option(info.options.get("mergeSchema")).exists(_.toBoolean)
    val mergedCols: Seq[StructField] =
      if (!replace) {
        val authoritative = branchTarget
          .map(b => ManifestDataSource.branchSchema(dir, b))
          .getOrElse(ManifestDataSource.tableSchema(dir))
        if (authoritative.isEmpty) Nil
        else {
          val want = authoritative.fields.map(f => (f.name, f.dataType)).toSet
          val got = incoming.fields.map(f => (f.name, f.dataType)).toSet
          if (!mergeSchema) {
            require(want == got,
              s"write schema ${incoming.simpleString} does not match table ${authoritative.simpleString}")
            Nil
          } else {
            require(want.subsetOf(got),
              s"mergeSchema append may only ADD columns: write schema " +
                s"${incoming.simpleString} is missing or retypes columns of " +
                s"table ${authoritative.simpleString}")
            // nullable in the TABLE regardless of the frame: pre-merge files
            // null-fill it (the ALTER ADD rule)
            incoming.fields.toSeq
              .filterNot(f => authoritative.fieldNames.contains(f.name))
              .map(_.copy(nullable = true))
          }
        }
      } else Nil
    val note = Option(info.options.get("commitnote")).getOrElse("")
    // EQUALITY-DELETE UPSERT: `.option("upsertkey", <col>)` on an append makes the
    // commit carry one equality-delete segment over the batch's distinct key values
    // alongside the fresh data files — older rows with those keys vanish at read
    // time, the batch's own rows survive (they carry the same data sequence as the
    // delete), and the WRITE side never opens a data file: the streaming-upsert
    // primitive (Iceberg v2 / Flink CDC equality deletes).
    val upsertKey: Option[(String, DataType)] =
      Option(info.options.get("upsertkey")).map { k =>
        val i = incoming.fieldNames.indexOf(k)
        require(i >= 0, s"upsertkey '$k' is not a column of ${incoming.simpleString}")
        require(!partColNames.contains(k),
          s"upsertkey '$k' must be a data column, not a partition column")
        require(Seq(LongType, IntegerType, StringType).contains(incoming(i).dataType),
          s"upsertkey '$k' must be long|int|string, got ${incoming(i).dataType}")
        (k, incoming(i).dataType)
      }
    // `.option("distribute", "true")` requests CLUSTERED distribution over the
    // partition expressions (Iceberg's write.distribution-mode=hash analog)
    val distribute = Option(info.options.get("distribute")).exists(_.toBoolean)
    // `.option("sortorder", "c1,c2")` requests RANGE distribution + an in-task
    // sort on the named columns (Iceberg write.distribution-mode=range + table
    // sort order): tasks own disjoint sort-key ranges, so data files land with
    // near-disjoint per-file min/max stats AT INGEST — range predicates skip
    // files from the first commit, no clustering rewrite needed.
    val sortOrder: Seq[String] = Option(info.options.get("sortorder"))
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    sortOrder.foreach { c =>
      require(incoming.fieldNames.contains(c),
        s"sortorder column '$c' is not a column of ${incoming.simpleString}")
    }
    // `.option("bloomfilters", "c1,c2")` writes a parquet BLOOM FILTER per row
    // group for the named data columns (Iceberg write.parquet.bloom-filter-enabled
    // analog): the point-lookup complement to min/max stats — equality predicates
    // on high-cardinality unsorted keys (conv_id at 10^12 turns) skip row groups
    // whose bloom provably excludes the value, where range stats cannot help.
    val bloomCols: Seq[String] = Option(info.options.get("bloomfilters"))
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    bloomCols.foreach { c =>
      require(incoming.fieldNames.contains(c),
        s"bloomfilters column '$c' is not a column of ${incoming.simpleString}")
      require(!partColNames.contains(c),
        s"bloomfilters column '$c' is a partition column — partition pruning " +
          "already skips it at the manifest")
    }
    // `.option("rowgroupsize", <bytes>)` bounds parquet row-group size: smaller
    // groups = finer skipping granularity (stats/dictionary/bloom prune per row
    // group), at more footer metadata per file
    val rowGroupBytes: Option[Long] = Option(info.options.get("rowgroupsize")).map { v =>
      val n = v.toLong
      require(n >= 1024, s"rowgroupsize must be >= 1024 bytes, got $n")
      n
    }
    // `.option("wapId", <id>)` stages the append (write-audit-publish): the
    // commit lands as a staged head no reader sees until publish_wap. Stage-only
    // commits are plain appends by construction — the publish path re-applies
    // them with cherry-pick's append-delta rules, which cannot represent an
    // overwrite, an upsert's delete segment, a schema merge, or a commit note's
    // exactly-once dedup — so those combinations refuse loudly here.
    val wapId = Option(info.options.get("wapId"))
    wapId.foreach { w =>
      require(!replace, s"wapId '$w': only appends can stage — overwrite replaces " +
        "the whole table state, which a staged delta cannot represent")
      require(upsertKey.isEmpty, s"wapId '$w' cannot combine with upsertkey — a " +
        "staged delta carries data files only, not delete segments")
      require(mergedCols.isEmpty, s"wapId '$w' cannot combine with mergeSchema — " +
        "evolve the table first, then stage")
      require(note.isEmpty, s"wapId '$w' cannot combine with commitnote — staged " +
        "heads are deduplicated by wap id, not by note")
    }
    // `.option("branch", <name>)` appends onto the named branch's own chain
    // instead of main (Iceberg branch writes). Branch commits are APPEND-ONLY —
    // fastForward republishes them onto main with cherry-pick's append-delta
    // rules, which cannot represent an overwrite, a delete segment, a schema
    // merge, or a note's dedup — so those combinations refuse loudly here.
    val branch = Option(info.options.get("branch"))
    branch.foreach { b =>
      require(wapId.isEmpty, s"branch '$b' cannot combine with wapId — a branch IS " +
        "the multi-commit audit surface; stage onto the branch and fast-forward")
      require(!replace, s"branch '$b': only appends can land on a branch — " +
        "overwrite replaces whole-table state, which fast-forward cannot republish")
      require(upsertKey.isEmpty, s"branch '$b' cannot combine with upsertkey — " +
        "branch commits carry data files only, not delete segments")
      require(mergedCols.isEmpty, s"branch '$b' cannot combine with mergeSchema — " +
        "evolve the main table first, then re-fork")
      require(note.isEmpty, s"branch '$b' cannot combine with commitnote — " +
        "exactly-once notes are a main-chain protocol")
    }
    new ManifestWrite(dir, partSpec, partCol, partTypes.mkString(","), incoming,
      replace, note, upsertKey, distribute, mergedCols, wapId, branch,
      declaredDdl = stagedDdl, stagedOp = stagedOp,
      stagedRequireFresh = stagedRequireFresh, onCommitted = onCommitted,
      sortOrder = sortOrder, bloomCols = bloomCols, rowGroupBytes = rowGroupBytes)
  }
}

/** The append/overwrite Write. With `.option("distribute", "true")` on a
  * PARTITIONED table it requires CLUSTERED distribution over the partition
  * expressions, so Spark shuffles rows until each partition tuple lives in ONE
  * task — one output file per tuple instead of per (task x tuple), THE
  * small-files guard for wide writes at scale (a 1000-task ingest into 400
  * day-bucket partitions would otherwise strand up to 400k tiny files per
  * commit). Identity columns resolve as plain references; hidden transforms
  * resolve through ManifestCatalog's bucket/days/truncate FunctionCatalog
  * entries — which delegate to the writer's own PartTransforms, so the shuffle
  * key IS the file-routing key. Off by default: deliberate small-file layouts
  * (bin-pack fixtures, per-task shard routing) stay exactly as written.
  */
private class ManifestWrite(dir: String, partSpec: Seq[ManifestTables.PartCol],
    partCol: String, partTypes: String, schema: StructType, replace: Boolean,
    note: String, upsertKey: Option[(String, DataType)], distribute: Boolean,
    mergedCols: Seq[StructField] = Nil, wapId: Option[String] = None,
    branch: Option[String] = None, declaredDdl: Option[String] = None,
    stagedOp: Option[String] = None, stagedRequireFresh: Boolean = false,
    onCommitted: () => Unit = () => (), sortOrder: Seq[String] = Nil,
    bloomCols: Seq[String] = Nil, rowGroupBytes: Option[Long] = None)
    extends Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
  import org.apache.spark.sql.connector.expressions.{Expression, Expressions, SortDirection}

  private def v2ExpressionOf(pc: ManifestTables.PartCol): Expression =
    pc.transform match {
      case None => Expressions.column(pc.name)
      case Some(t) => t.kind match {
        case "bucket" => Expressions.bucket(t.param, t.src)
        case "days" => Expressions.days(t.src)
        case "hours" => Expressions.hours(t.src)
        case "months" => Expressions.months(t.src)
        case "years" => Expressions.years(t.src)
        case _ => Expressions.apply("truncate",
          Expressions.literal(Int.box(t.param)), Expressions.column(t.src))
      }
    }

  // sorted writes (Iceberg range distribution + table sort order): partition
  // expressions lead the range key when clustering is ALSO requested (Iceberg's
  // own range-mode key is partition spec then sort order), the named sort
  // columns follow — and every task additionally sorts its rows, so each
  // (task x partition tuple) file covers one narrow, near-disjoint key range
  private def sortExprs: Seq[org.apache.spark.sql.connector.expressions.SortOrder] = {
    val pre = if (distribute && partSpec.nonEmpty)
      partSpec.map(pc => Expressions.sort(v2ExpressionOf(pc), SortDirection.ASCENDING))
    else Nil
    pre ++ sortOrder.map(c =>
      Expressions.sort(Expressions.column(c), SortDirection.ASCENDING))
  }

  override def requiredDistribution(): Distribution =
    if (sortOrder.nonEmpty) Distributions.ordered(sortExprs.toArray)
    else if (!distribute || partSpec.isEmpty) Distributions.unspecified()
    else Distributions.clustered(partSpec.map(v2ExpressionOf).toArray)
  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    if (sortOrder.isEmpty) Array.empty else sortExprs.toArray
  // 0 = no fixed width: the session's shuffle-partition count (and AQE coalescing)
  // decides, so tiny writes don't pay a 1000-way shuffle
  override def requiredNumPartitions(): Int = 0

  override def toBatch: BatchWrite =
    new ManifestBatchWrite(dir, partCol, partTypes, schema, replace, note, upsertKey,
      mergedCols, wapId, branch, declaredDdl, stagedOp, stagedRequireFresh, onCommitted,
      bloomCols = bloomCols, rowGroupBytes = rowGroupBytes)
}

private case class ManifestWriteMessage(files: Seq[(String, Long, String, String, Long)],
    upsertKeys: Seq[String] = Nil)
    extends WriterCommitMessage

private object ManifestBatchWrite {
  /** Commit-race retry bound: with jittered backoff this tolerates minutes of
    * contention before failing loudly (a hung commit loop is worse than a retryable
    * job failure).
    */
  val MaxCommitAttempts = 64
}

private class ManifestBatchWrite(dir: String, partCol: String, partTypes: String,
    schema: StructType, replace: Boolean, note: String = "",
    upsertKey: Option[(String, DataType)] = None,
    mergedCols: Seq[StructField] = Nil,
    wapId: Option[String] = None,
    branch: Option[String] = None,
    declaredDdl: Option[String] = None,
    stagedOp: Option[String] = None,
    stagedRequireFresh: Boolean = false,
    onCommitted: () => Unit = () => (),
    bloomCols: Seq[String] = Nil,
    rowGroupBytes: Option[Long] = None) extends BatchWrite {

  // per-write UID embedded in every data file name: partitionId/taskId are only
  // unique within one application, and a cross-application collision would let a
  // failed task's abort() delete another write's COMMITTED file
  private val writeUid = java.util.UUID.randomUUID().toString.substring(0, 8)

  private val partColNames: Seq[String] = if (partCol.isEmpty) Nil else partCol.split(',').toSeq

  /** Column-id registry this write stamps into its parquet footers and records in
    * the snapshot: a bootstrap/overwrite assigns fresh ids from the incoming
    * schema; an append uses the table's existing registry (rename/drop preserve
    * ids, so a concurrent ALTER cannot change a column's id under us). None keeps
    * the legacy no-ids behavior (unsafe names, or a legacy table that never had
    * ids) — its files resolve by name history.
    */
  private val writeColIds: Option[String] = {
    val dataCols = schema.fields.map(_.name).filterNot(partColNames.contains).toSeq
    if (replace || ManifestTables.latestSnapshotId(dir).isEmpty)
      ManifestTables.colIdsBootstrap(dataCols)
    else branch.filter(ManifestTables.branchExists(dir, _))
      // a branch append stamps the BRANCH's registry into its footers — main may
      // have renamed/added columns since the fork, and those ids belong to main
      .map(b => ManifestTables.readBranchRefs(dir, b).colIds)
      .getOrElse(ManifestTables.readSnapshotRefs(dir, None).colIds)
  }

  private def colIdOf: Map[String, Int] =
    writeColIds.map(ManifestTables.parseColIds(_).filterNot(_.dropped)
      .map(c => c.current -> c.id).toMap).getOrElse(Map.empty)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ManifestWriterFactory(dir, partCol, partTypes, schema.fields.map(f => (f.name, f.dataType)),
      writeUid, colIdOf, upsertKey.map(_._1), bloomCols, rowGroupBytes)

  /** The commit point: ONE atomic snapshot publication makes every task's files
    * visible. Until it lands, nothing the tasks wrote is visible to any reader (the
    * same stray-file isolation the read path enforces); after a crash the orphans are
    * dead weight, not corruption. Optimistic-concurrency loop: if another committer
    * claims the id first, re-read the (new) latest entries and retry on the next id —
    * concurrent appends serialize, neither is lost.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val freshFiles = messages.flatMap {
      case m: ManifestWriteMessage => m.files
      case _ => Nil
    }
    val upsertValues = messages.flatMap {
      case m: ManifestWriteMessage => m.upsertKeys
      case _ => Nil
    }.distinct.toSeq
    // STAGE-ONLY commit (write-audit-publish): the delta lands as a staged head
    // outside the snapshot chain — no CAS loop, because the staged name itself is
    // the create-once claim (a reused wap id is a coordination bug, refused
    // loudly by writeStaged). Sequence numbers stay unassigned: publish_wap
    // stamps the PUBLISHED snapshot's id, exactly like a fresh append, so
    // equality deletes recorded while the write sat staged never retroactively
    // apply to it. The spec check is stage-time UX only — publish re-validates
    // against the live head, catching a respec that lands while staged.
    wapId.foreach { w =>
      val latest = ManifestTables.latestSnapshotId(dir)
      require(latest.isDefined,
        s"wapId '$w': no committed snapshot under $dir — a staged write needs an " +
          "existing table to publish onto; bootstrap with a plain write first")
      // spec read PINNED to the recorded parent: an independent 'latest' spec read
      // could straddle a concurrent respec, recording parent=old + spec=new — the
      // audit read would then interpret the delta's partition values under the
      // parent's OLD spec while the files were laid out under the new one
      val cur = ManifestTables.readPartitionSpec(dir, latest)
      require(cur.map(_.name).mkString(",") == partCol &&
          cur.map(ManifestTables.typeTokenOf).mkString(",") == partTypes,
        s"partition spec of $dir changed concurrently (now " +
          s"'${cur.map(ManifestTables.specTokenOf).mkString(",")}') — this staged " +
          s"write's files were laid out under '$partCol'; rerun the write")
      ManifestTables.writeStaged(dir, w, latest.get, partCol, partTypes,
        freshFiles.map { case (rel, bytes, part, st, rows) =>
          ManifestTables.Entry(rel, bytes, part, 0, st, rows = rows) }.toSeq)
      return
    }
    // BRANCH append: the commit lands on the named branch's own chain — its CAS,
    // its sequence numbering (base + branch id), its spec check — and main never
    // sees it until fastForward (ManifestTables.appendToBranch documents all three)
    branch.foreach { b =>
      ManifestTables.appendToBranch(dir, b, partCol, partTypes,
        freshFiles.map { case (rel, bytes, part, st, rows) =>
          ManifestTables.Entry(rel, bytes, part, 0, st, rows = rows) }.toSeq)
      return
    }
    var done = false
    var attempt = 0
    while (!done) {
      // ORDER MATTERS (exactly-once): pin the target id FIRST, then check the note.
      // Every committer targets latest+1, so a competing publication that lands after
      // this read must claim the same id — our CAS then fails and we re-enter this
      // loop, at which point the winner's note IS visible. Checking the note before
      // reading the id would leave a window where a noted snapshot lands in between
      // and we'd still claim the NEXT id, publishing the batch twice (duplicate rows).
      val latest = ManifestTables.latestSnapshotId(dir)
      val next = latest.map(_ + 1).getOrElse(0)
      // a staged plain CREATE (CTAS) must not swallow a table that appeared
      // between the stage-time existence check and this commit — a CTAS query
      // can run for hours, and its stage-time check goes stale. Checked inside
      // the loop: a concurrent creator claims id 0, our CAS fails, the retry
      // sees the table and refuses. CREATE OR REPLACE stages with
      // stagedRequireFresh=false, so it replaces instead (as asked).
      if (stagedRequireFresh)
        require(latest.isEmpty,
          s"a table appeared at $dir while this CREATE TABLE AS SELECT ran — " +
            "CREATE refuses to replace it; use CREATE OR REPLACE TABLE")
      // an overwrite may REDEFINE the partition spec: an append racing one would
      // republish its builder-time spec over the new layout's segments, silently
      // relabeling every partition value — refuse instead. Checked inside the
      // loop: a respec landing after this read claims our target id, our CAS
      // fails, and the retry re-checks against the new truth.
      if (!replace && latest.isDefined) {
        val cur = ManifestTables.readPartitionSpec(dir) // one snapshot read
        require(cur.map(_.name).mkString(",") == partCol &&
            cur.map(ManifestTables.typeTokenOf).mkString(",") == partTypes,
          s"partition spec of $dir changed concurrently (now " +
            s"'${cur.map(ManifestTables.specTokenOf).mkString(",")}') — this " +
            s"append's files were laid out under '$partCol'; rerun the append")
      }
      if (note.nonEmpty && ManifestTables.hasCommittedNote(dir, note)) {
        done = true
      } else {
        // this write's entries become ONE immutable segment carrying the claimed
        // snapshot id as every file's DATA SEQUENCE (equality-delete ordering), so
        // the segment is (re)written inside the loop — O(fresh files) per rare
        // retry; commit cost stays O(fresh + segment count), never O(table)
        val fresh = freshFiles.map { case (rel, bytes, part, st, rows) =>
          ManifestTables.Entry(rel, bytes, part, 0, st, seq = next, rows = rows) }
        val freshSeg =
          if (fresh.isEmpty) None else Some(ManifestTables.writeSegment(dir, fresh.toSeq))
        // upsert: ONE equality-delete segment over the batch's distinct keys, at
        // the same sequence — applies to every OLDER file, never to this batch's.
        // A bootstrap or overwrite upsert has no older file to apply to: writing
        // the segment anyway would publish it SPENT at birth, pinning scans in row
        // mode and blocking footer aggregates until a compaction folds it.
        val eqSeg = upsertKey.collect {
          case (k, dt) if upsertValues.nonEmpty && !(replace || latest.isEmpty) =>
            ManifestTables.writeEqDeleteSegment(dir, ManifestTables.EqDelete(
              k, ManifestDataSource.eqTypeNameOf(dt), next, upsertValues))
        }
        val prev =
          if (replace || latest.isEmpty) ManifestTables.SnapshotRefs(0, Nil, Nil)
          else ManifestTables.readSnapshotRefs(dir, None)
        // legacy inline entries (full-list ManifestTables.commit bootstraps) are
        // folded into their own segment on the first layered append, so no snapshot
        // ever re-copies them again
        val inlineSeg =
          if (prev.inline.isEmpty) None
          else Some(ManifestTables.writeSegment(dir, prev.inline))
        // an ALTER-recorded schema survives every later append (dropping it would
        // silently revert the table to its oldest file's schema); an overwrite
        // redefines the schema from the incoming data, so it does NOT carry over.
        // mergeSchema appends publish the ADDed columns' widened DDL + fresh
        // registry ids INSIDE this commit — derived from the loop's own `prev`
        // read, so a concurrent ALTER's column is never dropped from the merge
        val (mergedDdl, mergedIds) =
          if (mergedCols.isEmpty || replace || latest.isEmpty)
            // a STAGED create/replace records its declared schema in the same
            // commit (the table may end up with zero data files to infer from);
            // plain overwrites keep redefining the schema from the incoming data
            (if (replace || latest.isEmpty) declaredDdl else prev.schemaDdl,
              if (replace || latest.isEmpty) writeColIds else prev.colIds)
          else {
            val base = ManifestDataSource.tableSchema(dir, Some(prev.snapshot))
            // a concurrent evolution may have added the SAME name: dedup only on
            // type agreement — silently dropping a type-conflicted add would
            // commit THIS batch's files with a physical type contradicting the
            // published DDL (a read-time landmine, not an error)
            val adds = mergedCols.filterNot { c =>
              base.fields.find(_.name == c.name) match {
                case None => false
                case Some(existing) =>
                  require(existing.dataType == c.dataType,
                    s"mergeSchema column '${c.name}' was added concurrently with type " +
                      s"${existing.dataType.simpleString}, this batch wrote " +
                      s"${c.dataType.simpleString} — conflicting evolution; rerun the append")
                  true
              }
            }
            val ddl = Some(ManifestTables.renderSchema(StructType(base.fields ++ adds)))
            val ids = prev.colIds.map { s =>
              var reg = ManifestTables.parseColIds(s)
              adds.foreach { c =>
                // the ALTER rules, verbatim: historic-name reuse is ambiguous for
                // id-less files; unsafe names stay unregistered (and then refuse
                // rename/drop later, same as ALTER ADD)
                require(!reg.exists(r => r.names.contains(c.name)),
                  s"mergeSchema column '${c.name}' was used before (renamed or " +
                    "dropped) — reuse would be ambiguous; pick a fresh name")
                if (c.name.matches(ManifestTables.SafeColName))
                  reg = reg :+ ManifestTables.ColId(
                    (reg.map(_.id) :+ 0).max + 1, dropped = false, Seq(c.name))
              }
              ManifestTables.renderColIds(reg)
            }
            (ddl, ids)
          }
        done = ManifestTables.tryWriteSnapshotRefs(dir, partCol, Nil,
          prev.segments ++ inlineSeg ++ freshSeg, next, note, partTypes,
          schemaDdl = mergedDdl, deletes = prev.deletes,
          eqDeletes = prev.eqDeletes ++ eqSeg,
          colIds = mergedIds,
          operation = stagedOp.getOrElse(
            if (replace) "overwrite" else if (eqSeg.nonEmpty) "upsert" else "append"))
      }
      if (!done) {
        // losers back off (jittered, capped at ~1 s) instead of spinning O(files)
        // re-reads; sustained contention past the cap fails the job loudly rather
        // than hanging a 512-task streaming fan-in forever
        attempt += 1
        require(attempt < ManifestBatchWrite.MaxCommitAttempts,
          s"manifest commit to $dir lost the snapshot race $attempt times — " +
            "sustained contention; rerun or reduce concurrent committers")
        val sleepMs = math.min(1000L, 10L << math.min(attempt, 7)) / 2 +
          java.util.concurrent.ThreadLocalRandom.current().nextLong(1, 16)
        Thread.sleep(sleepMs)
      }
    }
    // a staged (StagingTableCatalog) write observes this: the batch commit WAS the
    // atomic publication, so commitStagedChanges must not publish a second snapshot
    onCommitted()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // best-effort cleanup; an aborted write's files were never referenced anyway
    messages.foreach {
      case ManifestWriteMessage(files, _) => files.foreach { case (rel, _, _, _, _) =>
        try java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, rel))
        catch { case _: Exception => }
      }
      case _ =>
    }
  }
}

/** COPY-ON-WRITE row-level operation (DELETE/UPDATE/MERGE with arbitrary row
  * predicates) — the group-based rewrite protocol:
  *
  *  1. Spark's analysis rewrites the command into ReplaceData over this operation's
  *     scan; the condition's partition conjuncts push down as usual (file pruning at
  *     the manifest);
  *  2. the runtime group filter (a subquery over the same table computing
  *     `DISTINCT _file` of rows MATCHING the condition) narrows the scan to files
  *     that actually contain matches — `filterAttributes` is `_file` here, so whole
  *     untouched files never read or rewrite;
  *  3. the plan recomputes the surviving/updated rows of those files and this
  *     write lands them as fresh files, committing ONE atomic snapshot that swaps
  *     exactly the scanned files for the rewritten ones (segments without replaced
  *     entries carry by name);
  *  4. serializable validation: if a concurrent commit removed any file this
  *     operation rewrote, the commit FAILS loudly instead of resurrecting rows.
  *
  * The scan registered first is the main rewrite scan (operation scan planning runs
  * before the group-filter subquery is even created); its post-runtime-filter file
  * list, read at commit time, is the replaced set. A no-match operation (empty scan,
  * zero replacement rows) publishes nothing.
  */
private[sources] class ManifestRowLevelOperation(dir: String,
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command)
    extends org.apache.spark.sql.connector.write.RowLevelOperation {
  import org.apache.spark.sql.connector.write.{RowLevelOperation, WriteBuilder}

  @volatile private var mainScan: ManifestDataScan = _
  private[sources] def register(scan: ManifestDataScan): Unit =
    synchronized { if (mainScan == null) mainScan = scan }
  private[sources] def replacedEntries: Seq[ManifestTables.Entry] = {
    require(mainScan != null, s"row-level $cmd write committed before its scan was planned")
    mainScan.effectiveEntries
  }
  /** Delete-segment refs the rewrite scan planned against (conflict baseline). */
  private[sources] def planningDeletes: Seq[String] = {
    require(mainScan != null, s"row-level $cmd write committed before its scan was planned")
    mainScan.planningDeleteRefs
  }
  private[sources] def planningEqDeletes: Seq[String] = {
    require(mainScan != null, s"row-level $cmd write committed before its scan was planned")
    mainScan.planningEqDeleteRefs
  }

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"manifest copy-on-write $cmd($dir)"
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestDataScanBuilder(dir, ManifestDataSource.tableSchema(dir),
      ManifestTables.readPartitionSpec(dir), None, rowLevel = Some(this))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val incoming = info.schema()
    require(!incoming.fieldNames.contains(ManifestDataSource.FileCol),
      s"replacement rows must not carry ${ManifestDataSource.FileCol}; got ${incoming.simpleString}")
    val authoritative = ManifestDataSource.tableSchema(dir)
    require(incoming.fields.map(f => (f.name, f.dataType)).toSet ==
      authoritative.fields.map(f => (f.name, f.dataType)).toSet,
      s"row-level write schema ${incoming.simpleString} does not match table " +
        s"${authoritative.simpleString}")
    val partCol = ManifestTables.readPartitionColumn(dir)
    val partTypes = ManifestTables.readPartitionTypes(dir)
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new ManifestReplaceBatchWrite(dir, ManifestRowLevelOperation.this, cmd.toString,
            partCol, partTypes, incoming)
      }
    }
  }
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column(
      ManifestDataSource.FileCol))
}

/** The replace-write half of the copy-on-write protocol: swap the operation's
  * scanned files for the freshly written ones in one CAS-published snapshot.
  */
private class ManifestReplaceBatchWrite(dir: String, op: ManifestRowLevelOperation,
    cmdName: String, partCol: String, partTypes: String, schema: StructType)
    extends BatchWrite {
  private val writeUid = java.util.UUID.randomUUID().toString.substring(0, 8)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ManifestWriterFactory(dir, partCol, partTypes,
      schema.fields.map(f => (f.name, f.dataType)), writeUid)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val freshFiles = messages.flatMap {
      case ManifestWriteMessage(files, _) => files
      case _ => Nil
    }
    val replaced = op.replacedEntries.map(_.path).toSet
    if (replaced.isEmpty && freshFiles.isEmpty) return // no-match operation: no snapshot
    var done = false
    var attempt = 0
    while (!done) {
      val refs = ManifestTables.readSnapshotRefs(dir, None)
      val inlineKeep = refs.inline.filterNot(e => replaced.contains(e.path))
      val perSeg = refs.segments.map { seg =>
        (seg, ManifestTables.readSegmentEntries(dir, seg, refs.snapshot))
      }
      // serializable validation: every file this operation rewrote must still be
      // live — a concurrent overwrite/DELETE/compaction that dropped one means our
      // replacement rows were derived from a retracted state
      val present = (refs.inline ++ perSeg.flatMap(_._2)).map(_.path).toSet
      require(replaced.subsetOf(present),
        s"$cmdName on $dir conflicts with a concurrent commit that removed " +
          s"${(replaced -- present).take(3).mkString(", ")} — rerun the operation")
      // ...and a positional DELETE committed AFTER this operation's scan planned
      // would be silently undone if it targets a file we rewrote from the
      // pre-delete state — same rule as compaction, but loud (this is user DML)
      val newDels = refs.deletes.filterNot(op.planningDeletes.contains)
      require(!newDels.exists(d => ManifestTables.readDeleteSegment(dir, d)
          .keysIterator.exists(replaced.contains)),
        s"$cmdName on $dir conflicts with a concurrent merge-on-read DELETE against " +
          "a rewritten file — rerun the operation")
      // an EQUALITY delete landing after planning targets every pre-existing file
      // by definition — a rewrite would resurrect its rows with a newer sequence
      require(refs.eqDeletes.forall(op.planningEqDeletes.contains),
        s"$cmdName on $dir conflicts with a concurrent equality DELETE — rerun the operation")
      val keptSegs = perSeg.flatMap { case (seg, es) =>
        val keep = es.filterNot(e => replaced.contains(e.path))
        if (keep.length == es.length) Some(seg)
        else if (keep.isEmpty) None
        else Some(ManifestTables.writeSegment(dir, keep))
      }
      // target id pinned from the refs ALREADY READ: any concurrent publication
      // claims this same id first, failing our CAS and routing us back through
      // the validations (a latest-id read here could see a NEWER commit and
      // silently build next from stale refs)
      val next = refs.snapshot + 1
      // fresh files carry the claimed id as their data sequence: the operation's
      // scan APPLIED every pending equality delete, so the rewritten rows must
      // order after those deletes (rewritten inside the loop — rare retries)
      val fresh = freshFiles.map { case (rel, bytes, part, st, rows) =>
        ManifestTables.Entry(rel, bytes, part, 0, st, seq = next, rows = rows) }
      val freshSeg =
        if (fresh.isEmpty) None else Some(ManifestTables.writeSegment(dir, fresh.toSeq))
      // delete segments referencing only replaced (now-gone) paths fold away —
      // carrying them would force row-mode scans and block footer aggregates
      // table-wide for no live delete
      val liveEntries = inlineKeep ++ perSeg.flatMap(_._2).filterNot(e =>
        replaced.contains(e.path)) ++ fresh
      val livePaths = liveEntries.map(_.path).toSet
      val liveDels = refs.deletes.filter(d =>
        ManifestTables.readDeleteSegment(dir, d).keysIterator.exists(livePaths.contains))
      done = ManifestTables.tryWriteSnapshotRefs(dir, partCol, inlineKeep,
        keptSegs ++ freshSeg, next, partTypes = partTypes, schemaDdl = refs.schemaDdl,
        deletes = liveDels,
        eqDeletes = ManifestTables.liveEqDeletes(dir, refs.eqDeletes, liveEntries),
        colIds = refs.colIds, operation = s"replace-${cmdName.toLowerCase}")
      if (!done) {
        attempt += 1
        require(attempt < ManifestBatchWrite.MaxCommitAttempts,
          s"$cmdName commit to $dir lost the snapshot race $attempt times")
        Thread.sleep(math.min(1000L, 20L * attempt) +
          java.util.concurrent.ThreadLocalRandom.current().nextLong(1, 20))
      }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case ManifestWriteMessage(files, _) => files.foreach { case (rel, _, _, _, _) =>
        try java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, rel))
        catch { case _: Exception => }
      }
      case _ =>
    }
}

/** MERGE-ON-READ positional DELETE (the delta-based row-level protocol): instead
  * of rewriting every file that contains a match (copy-on-write), the operation's
  * scan projects each matching row's identity `(_file, _pos)` and the delta write
  * records those positions in an immutable positional-delete segment; ONE atomic
  * snapshot adds the segment reference and no data file is read back, rewritten,
  * or removed. Readers apply the positions at scan time; compaction folds them
  * into real rewrites. This is the 100 TB answer for frequent small deletes
  * (GDPR row erasure, retention sweeps): commit cost is O(matches), not O(bytes
  * of every touched file). Enabled per session via
  * `spark.graft.manifest.deleteMode=merge-on-read` (copy-on-write remains the
  * default — it keeps the table free of read-time merge work).
  */
private[sources] class ManifestDeltaOperation(dir: String,
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command)
    extends org.apache.spark.sql.connector.write.RowLevelOperation
    with org.apache.spark.sql.connector.write.SupportsDelta {
  import org.apache.spark.sql.connector.write.{DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, RowLevelOperation}
  import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"manifest merge-on-read $cmd($dir)"
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestDataScanBuilder(dir, ManifestDataSource.tableSchema(dir),
      ManifestTables.readPartitionSpec(dir), None)
  /** A row's stable identity: its file and ordinal within it — the pair the
    * positional-delete segments key on.
    */
  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(ManifestDataSource.FileCol),
    Expressions.column(ManifestDataSource.PosCol))
  override def requiredMetadataAttributes(): Array[NamedReference] = Array.empty
  /** UPDATE = positional delete of the old row + ordinary insert of the new one —
    * the insert rides the SAME per-task writer appends use, so updated rows may
    * even move partitions (SET on a partition column just lands the row in its
    * new directory).
    */
  override def representUpdateAsDeleteAndInsert(): Boolean = true
  override def newWriteBuilder(
      info: LogicalWriteInfo): DeltaWriteBuilder = {
    val idSchema = info.rowIdSchema().orElseThrow(() =>
      new IllegalStateException(s"delta $cmd write planned without a rowId schema"))
    val fileIdx = idSchema.fieldIndex(ManifestDataSource.FileCol)
    val posIdx = idSchema.fieldIndex(ManifestDataSource.PosCol)
    val rowFields = info.schema().fields.map(f => (f.name, f.dataType))
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite =
          new ManifestDeltaBatchWrite(dir, cmd.toString, fileIdx, posIdx, rowFields,
            insertsAllowed = cmd != RowLevelOperation.Command.DELETE)
      }
    }
  }
}

/** One task's delta outcome: positional deletes + any data files its inserts
  * landed (UPDATE's replacement rows; empty for DELETE).
  */
private case class ManifestDeltaMessage(byFile: Map[String, Seq[Long]],
    files: Seq[(String, Long, String, String, Long)]) extends WriterCommitMessage

private class ManifestDeltaBatchWrite(dir: String, cmdName: String,
    fileIdx: Int, posIdx: Int, rowFields: Array[(String, DataType)],
    insertsAllowed: Boolean)
    extends org.apache.spark.sql.connector.write.DeltaBatchWrite {
  import org.apache.spark.sql.connector.write.{DeltaWriter, DeltaWriterFactory}

  private val writeUid = java.util.UUID.randomUUID().toString.substring(0, 8)
  private val partCol = ManifestTables.readPartitionColumn(dir)
  private val partTypes0 = ManifestTables.readPartitionTypes(dir)
  // id stamping for UPDATE's replacement rows (rename-proof like any append)
  private val colIdOf: Map[String, Int] =
    ManifestTables.readSnapshotRefs(dir, None).colIds
      .map(ManifestTables.parseColIds(_).filterNot(_.dropped)
        .map(c => c.current -> c.id).toMap).getOrElse(Map.empty)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
    new ManifestDeltaWriterFactory(dir, partCol, partTypes0, fileIdx, posIdx, rowFields,
      writeUid, insertsAllowed, colIdOf)

  /** ONE delete segment (+ one data segment when inserts landed) for the whole
    * job, referenced by a CAS-published snapshot that carries everything else
    * forward. Serializable validation: every file we recorded positions against
    * must still be live — a concurrent rewrite/DELETE/compaction of that file
    * means our positions describe retracted bytes, and publishing them would
    * silently lose this operation's effect.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val parts = messages.collect { case m: ManifestDeltaMessage => m }
    val byFile: Map[String, Seq[Long]] = parts.flatMap(_.byFile.toSeq)
      .groupBy(_._1).map { case (f, xs) => f -> xs.flatMap(_._2).toSeq }
    val freshFiles = parts.flatMap(_.files)
    if (byFile.isEmpty && freshFiles.isEmpty) return // no matches: no snapshot
    val delSeg = if (byFile.isEmpty) None
      else Some(ManifestTables.writeDeleteSegment(dir, byFile))
    val partTypes = ManifestTables.readPartitionTypes(dir)
    var done = false
    var attempt = 0
    while (!done) {
      val refs = ManifestTables.readSnapshotRefs(dir, None)
      val present = ManifestTables.entriesOf(dir, refs).map(_.path).toSet
      require(byFile.keySet.subsetOf(present),
        s"merge-on-read $cmdName on $dir conflicts with a concurrent commit that removed " +
          s"${(byFile.keySet -- present).take(3).mkString(", ")} — rerun the operation")
      // pin the target id from the refs already read (see ManifestReplaceBatchWrite)
      val next = refs.snapshot + 1
      // UPDATE's replacement rows sequence at the claimed id (equality deletes that
      // preceded them were applied by the operation's scan)
      val fresh = freshFiles.map { case (rel, bytes, part, st, rows) =>
        ManifestTables.Entry(rel, bytes, part, 0, st, seq = next, rows = rows) }
      val freshSeg = if (fresh.isEmpty) None
        else Some(ManifestTables.writeSegment(dir, fresh.toSeq))
      done = ManifestTables.tryWriteSnapshotRefs(dir, partCol, refs.inline,
        refs.segments ++ freshSeg, next, partTypes = partTypes, schemaDdl = refs.schemaDdl,
        deletes = refs.deletes ++ delSeg, eqDeletes = refs.eqDeletes, colIds = refs.colIds,
        operation = s"delta-${cmdName.toLowerCase}")
      if (!done) {
        attempt += 1
        require(attempt < ManifestBatchWrite.MaxCommitAttempts,
          s"merge-on-read $cmdName commit to $dir lost the snapshot race $attempt times")
        Thread.sleep(math.min(1000L, 20L * attempt) +
          java.util.concurrent.ThreadLocalRandom.current().nextLong(1, 20))
      }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    // positions never land before commit; inserted data files do — remove them
    messages.foreach {
      case ManifestDeltaMessage(_, files) => files.foreach { case (rel, _, _, _, _) =>
        try java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, rel))
        catch { case _: Exception => }
      }
      case _ =>
    }
}

private class ManifestDeltaWriterFactory(dir: String, partCol: String, partTypes: String,
    fileIdx: Int, posIdx: Int, rowFields: Array[(String, DataType)],
    writeUid: String, insertsAllowed: Boolean, colIdOf: Map[String, Int] = Map.empty)
    extends org.apache.spark.sql.connector.write.DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] =
    new ManifestDeltaRowWriter(dir, partCol, partTypes, fileIdx, posIdx, rowFields,
      partitionId, taskId, writeUid, insertsAllowed, colIdOf)
}

private class ManifestDeltaRowWriter(dir: String, partCol: String, partTypes: String,
    fileIdx: Int, posIdx: Int, rowFields: Array[(String, DataType)],
    partitionId: Int, taskId: Long, writeUid: String, insertsAllowed: Boolean,
    colIdOf: Map[String, Int] = Map.empty)
    extends org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] {
  private val acc = scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.ArrayBuffer[Long]]()
  // UPDATE's replacement rows land through the SAME writer appends use (one open
  // parquet writer per partition tuple, stats accumulated live)
  private lazy val inserts =
    new ManifestDataWriter(dir, partCol, partTypes, rowFields, partitionId, taskId,
      writeUid, colIdOf)
  private var wroteAny = false
  override def delete(metadata: InternalRow, id: InternalRow): Unit =
    acc.getOrElseUpdate(id.getUTF8String(fileIdx).toString,
      scala.collection.mutable.ArrayBuffer.empty[Long]) += id.getLong(posIdx)
  override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit =
    throw new UnsupportedOperationException(
      "updates arrive as delete+insert (representUpdateAsDeleteAndInsert)")
  override def insert(row: InternalRow): Unit = {
    require(insertsAllowed, "delta DELETE must not insert rows")
    wroteAny = true
    inserts.write(row)
  }
  override def commit(): WriterCommitMessage = {
    val files =
      if (!wroteAny) Nil
      else inserts.commit() match { case ManifestWriteMessage(fs, _) => fs }
    ManifestDeltaMessage(acc.map { case (f, ps) => f -> ps.toSeq }.toMap, files)
  }
  override def abort(): Unit = if (wroteAny) inserts.abort()
  override def close(): Unit = ()
}

private class ManifestWriterFactory(dir: String, partCol: String, partTypes: String,
    fields: Array[(String, DataType)], writeUid: String,
    colIdOf: Map[String, Int] = Map.empty, upsertKey: Option[String] = None,
    bloomCols: Seq[String] = Nil, rowGroupBytes: Option[Long] = None)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ManifestDataWriter(dir, partCol, partTypes, fields, partitionId, taskId, writeUid,
      colIdOf, upsertKey, bloomCols, rowGroupBytes)
}

/** Per-task writer: one open parquet-mr writer per partition-value TUPLE seen
  * (nested Hive-style `a=x/b=y/` layout in spec order, values %XX-escaped on disk
  * but RAW — canonical-string, PartSep-joined — in the manifest). Hidden transform
  * columns derive their value from the SOURCE data column via PartTransforms (the
  * one definition the scan's pruning shares); the source itself stays stored.
  */
private class ManifestDataWriter(dir: String, partCol: String, partTypes: String,
    fields: Array[(String, DataType)], partitionId: Int, taskId: Long, writeUid: String,
    colIdOf: Map[String, Int] = Map.empty, upsertKey: Option[String] = None,
    bloomCols: Seq[String] = Nil, rowGroupBytes: Option[Long] = None)
    extends DataWriter[InternalRow] {

  private val partSpec: Seq[ManifestTables.PartCol] =
    ManifestTables.parsePartSpec(partCol, partTypes)
  // (spec column, source row type, source row ordinal) per partition column, in
  // layout order — a transform's source ordinal is its SOURCE data column's
  private val partFields: Seq[(ManifestTables.PartCol, DataType, Int)] = partSpec.map { pc =>
    val src = pc.transform.map(_.src).getOrElse(pc.name)
    val i = fields.indexWhere(_._1 == src)
    require(i >= 0, s"partition ${if (pc.transform.isEmpty) "column" else "source column"} " +
      s"'$src' missing from write schema")
    (pc, fields(i)._2, i)
  }
  // identity partition columns live in the directory layout only; transform
  // SOURCES are ordinary stored data columns
  private val identityNames = partSpec.filter(_.transform.isEmpty).map(_.name)
  private val dataFields = fields.zipWithIndex.filter { case ((n, _), _) => !identityNames.contains(n) }

  private def requireNoSep(v: String): String = {
    // the unit separator joins multi-column values in the manifest; a value
    // containing it would commit fine and then make EVERY subsequent scan fail on
    // the value-count check — reject the row loudly instead of poisoning the table
    require(v.indexOf(ManifestTables.PartSep) < 0,
      s"partition value contains the reserved \\u001f separator: '$v'")
    v
  }

  /** Canonical manifest string of one partition value (the inverse of
    * ManifestDataSource.internalPartValue); transform columns compute it from the
    * source datum.
    */
  private def canonical(row: InternalRow, pc: ManifestTables.PartCol,
      srcType: DataType, ord: Int): String = pc.transform match {
    case None => srcType match {
      case StringType => requireNoSep(row.getUTF8String(ord).toString)
      case IntegerType => row.getInt(ord).toString
      case DateType => java.time.LocalDate.ofEpochDay(row.getInt(ord).toLong).toString
      case other => throw new IllegalArgumentException(s"unsupported partition type $other")
    }
    case Some(t) =>
      import ManifestTables.PartTransforms._
      t.kind match {
        case "bucket" => srcType match {
          case LongType => bucketLong(row.getLong(ord), t.param).toString
          case IntegerType => bucketLong(row.getInt(ord).toLong, t.param).toString
          case StringType => bucketString(row.getUTF8String(ord).toString, t.param).toString
          case other => throw new IllegalArgumentException(s"unsupported bucket source $other")
        }
        case "days" =>
          java.time.LocalDate.ofEpochDay(epochDayOfMicros(row.getLong(ord))).toString
        case "hours" => epochHourOfMicros(row.getLong(ord)).toString
        case "months" => epochMonthOfMicros(row.getLong(ord)).toString
        case "years" => epochYearOfMicros(row.getLong(ord)).toString
        case "trunc" =>
          requireNoSep(truncString(row.getUTF8String(ord).toString, t.param))
        case other => throw new IllegalArgumentException(s"unknown transform $other")
      }
  }
  private val messageType: MessageType = {
    val b = org.apache.parquet.schema.Types.buildMessage()
    // field IDS stamped into the footer schema (when the table carries a column-id
    // registry): the read path then resolves renamed columns by id, Iceberg-style
    dataFields.foreach { case ((name, dt), _) =>
      b.addField(ManifestDataWriter.parquetField(name, dt, colIdOf.get(name))) }
    b.named("graft_write")
  }

  // equality-delete upsert: the batch's distinct key values, canonical strings
  private val upsertSpec: Option[(DataType, Int)] = upsertKey.map { k =>
    val i = fields.indexWhere(_._1 == k)
    require(i >= 0, s"upsertkey '$k' missing from write schema")
    (fields(i)._2, i)
  }
  private val seenKeys = scala.collection.mutable.LinkedHashSet.empty[String]
  private val writers = scala.collection.mutable.LinkedHashMap[String, org.apache.parquet.hadoop.ParquetWriter[InternalRow]]()
  private val paths = scala.collection.mutable.LinkedHashMap[String, String]()
  // per-file min/max column stats, accumulated as rows stream through and recorded
  // in the manifest entry at commit — the scan's data-skipping input
  private val statSpecs: Array[(String, DataType, Int)] =
    dataFields.map { case ((n, dt), ord) => (n, dt, ord) }
  private val stats = scala.collection.mutable.LinkedHashMap[String, ManifestStats.Acc]()

  private def writerFor(joined: String, vals: Seq[String]): org.apache.parquet.hadoop.ParquetWriter[InternalRow] =
    writers.getOrElseUpdate(joined, {
      // writeUid makes names globally unique — and the path is recorded only AFTER
      // the writer opened successfully, so abort() can never delete a pre-existing
      // file it merely collided with
      val rel = partFields.zip(vals).map { case ((pc, _, _), v) =>
        s"${pc.name}=${ManifestTables.hiveEscape(v)}/" }.mkString +
        f"part-$partitionId%05d-$taskId-$writeUid-${writers.size}.parquet"
      var b = new ManifestRowParquetWriterBuilder(
        ManifestDataSource.parquetOutput(s"$dir/$rel"),
        new ManifestRowWriteSupport(messageType, dataFields.toArray))
      // per-row-group bloom filters for the declared point-lookup columns; row
      // group size bounds the skipping granularity (see the write options' docs)
      rowGroupBytes.foreach(n => b = b.withRowGroupSize(n))
      bloomCols.foreach(c => b = b.withBloomFilterEnabled(c, true))
      val w = b.build()
      paths(joined) = rel
      w
    })

  override def write(row: InternalRow): Unit = {
    val vals = partFields.map { case (pc, dt, ord) =>
      require(!row.isNullAt(ord),
        if (pc.transform.isEmpty)
          s"partition column '${pc.name}' may not be null (the table schema declares it non-null)"
        else s"hidden-partition source column '${pc.transform.get.src}' may not be null")
      canonical(row, pc, dt, ord)
    }
    val joined = vals.mkString(ManifestTables.PartSep.toString)
    writerFor(joined, vals).write(row)
    stats.getOrElseUpdate(joined, new ManifestStats.Acc(statSpecs)).observe(row)
    upsertSpec.foreach { case (dt, ord) =>
      require(!row.isNullAt(ord),
        s"upsertkey '${upsertKey.get}' may not be null — the equality delete could not address the row")
      seenKeys += (dt match {
        case LongType => row.getLong(ord).toString
        case IntegerType => row.getInt(ord).toString
        case StringType => row.getUTF8String(ord).toString
        case other => throw new IllegalStateException(s"unreachable upsert key type $other")
      })
    }
  }

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_.close())
    ManifestWriteMessage(paths.toSeq.map { case (v, rel) =>
      (rel, java.nio.file.Files.size(java.nio.file.Paths.get(dir, rel)), v,
        stats.get(v).map(_.encode()).getOrElse(""),
        stats.get(v).map(_.rows).getOrElse(-1L))
    }, seenKeys.toSeq)
  }

  override def abort(): Unit = {
    writers.values.foreach(w => try w.close() catch { case _: Exception => })
    paths.values.foreach { rel =>
      try java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, rel))
      catch { case _: Exception => }
    }
  }

  override def close(): Unit = ()
}

/** Direct InternalRow -> parquet RecordConsumer write support: emits exactly the
  * record structure the old example-Group path produced (same optional primitives,
  * same 3-level lists, same null handling -> byte-equivalent pages) without
  * materializing a Group object per row — no per-field name lookups, no boxing,
  * no per-row ArrayLists. Measured r06: the DSv2 ingest of 100k rows into 120
  * hidden-partition files dropped ~3x against the Group path.
  */
private class ManifestRowWriteSupport(schema: MessageType,
    dataFields: Array[((String, DataType), Int)])
    extends org.apache.parquet.hadoop.api.WriteSupport[InternalRow] {
  import org.apache.parquet.io.api.{Binary, RecordConsumer}
  private var rc: RecordConsumer = _

  override def init(conf: Configuration): org.apache.parquet.hadoop.api.WriteSupport.WriteContext =
    new org.apache.parquet.hadoop.api.WriteSupport.WriteContext(
      schema, java.util.Collections.emptyMap[String, String]())

  override def prepareForWrite(recordConsumer: RecordConsumer): Unit =
    rc = recordConsumer

  override def write(row: InternalRow): Unit = {
    rc.startMessage()
    var j = 0
    while (j < dataFields.length) {
      val ((name, dt), ord) = dataFields(j)
      if (!row.isNullAt(ord)) {
        rc.startField(name, j)
        dt match {
          case LongType | TimestampType | TimestampNTZType => rc.addLong(row.getLong(ord))
          case IntegerType | DateType => rc.addInteger(row.getInt(ord))
          case DoubleType => rc.addDouble(row.getDouble(ord))
          case FloatType => rc.addFloat(row.getFloat(ord))
          case BooleanType => rc.addBoolean(row.getBoolean(ord))
          case StringType =>
            // fromReusedByteArray: getBytes can alias a reused row buffer in the
            // exact-span case; parquet's writers copy reused binaries when they
            // must retain them (dictionary pages), and stream them otherwise
            rc.addBinary(Binary.fromReusedByteArray(row.getUTF8String(ord).getBytes))
          case BinaryType =>
            rc.addBinary(Binary.fromConstantByteArray(row.getBinary(ord)))
          case ArrayType(et, _) =>
            // standard 3-level list, exactly as GroupWriter serializes the old
            // addGroup(name)/addGroup("list")/append("element") structure
            val arr = row.getArray(ord)
            rc.startGroup()
            val n = arr.numElements()
            if (n > 0) {
              rc.startField("list", 0)
              var i = 0
              while (i < n) {
                rc.startGroup()
                if (!arr.isNullAt(i)) {
                  rc.startField("element", 0)
                  et match {
                    case FloatType => rc.addFloat(arr.getFloat(i))
                    case DoubleType => rc.addDouble(arr.getDouble(i))
                    case LongType => rc.addLong(arr.getLong(i))
                    case IntegerType => rc.addInteger(arr.getInt(i))
                    case BooleanType => rc.addBoolean(arr.getBoolean(i))
                    case StringType =>
                      rc.addBinary(Binary.fromReusedByteArray(arr.getUTF8String(i).getBytes))
                    case other =>
                      throw new IllegalArgumentException(s"unsupported array element $other for $name")
                  }
                  rc.endField("element", 0)
                }
                rc.endGroup()
                i += 1
              }
              rc.endField("list", 0)
            }
            rc.endGroup()
          case other => throw new IllegalArgumentException(s"unsupported write type $other for $name")
        }
        rc.endField(name, j)
      }
      j += 1
    }
    rc.endMessage()
  }
}

/** Builder wiring ManifestRowWriteSupport into the stock ParquetWriter (same
  * base-builder defaults the example builder inherited: v1 pages, dictionary on,
  * uncompressed).
  */
private class ManifestRowParquetWriterBuilder(
    file: org.apache.parquet.io.OutputFile, support: ManifestRowWriteSupport)
    extends org.apache.parquet.hadoop.ParquetWriter.Builder[InternalRow, ManifestRowParquetWriterBuilder](file) {
  override def self(): ManifestRowParquetWriterBuilder = this
  override def getWriteSupport(conf: Configuration): org.apache.parquet.hadoop.api.WriteSupport[InternalRow] =
    support
}

private object ManifestDataWriter {
  import org.apache.parquet.schema.Types
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

  /** Spark field -> optional parquet primitive (the inverse of sparkFields), with
    * the table's FIELD ID stamped into the footer schema when the column-id
    * registry assigns one — the rename-proof identity the read path resolves by.
    */
  def parquetField(name: String, dt: DataType, id: Option[Int] = None): Type = {
    def withId[B <: Types.Builder[_, _]](b: B): B = {
      id.foreach(i => b.id(i)); b
    }
    dt match {
      case LongType => withId(Types.optional(PrimitiveTypeName.INT64)).named(name)
      case TimestampType => withId(Types.optional(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.MICROS))).named(name)
      case TimestampNTZType => withId(Types.optional(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.MICROS))).named(name)
      case IntegerType => withId(Types.optional(PrimitiveTypeName.INT32)).named(name)
      case DateType => withId(Types.optional(PrimitiveTypeName.INT32)
        .as(LogicalTypeAnnotation.dateType())).named(name)
      case DoubleType => withId(Types.optional(PrimitiveTypeName.DOUBLE)).named(name)
      case FloatType => withId(Types.optional(PrimitiveTypeName.FLOAT)).named(name)
      case BooleanType => withId(Types.optional(PrimitiveTypeName.BOOLEAN)).named(name)
      case StringType => withId(Types.optional(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType())).named(name)
      case BinaryType => withId(Types.optional(PrimitiveTypeName.BINARY)).named(name)
      case ArrayType(et, containsNull) =>
        // standard 3-level list layout — byte-compatible with Spark's own parquet
        // writes. The field id goes on the OUTER list group (withId here, on the
        // list builder): chaining it after optionalElement would tag the ELEMENT,
        // where top-level resolution never looks.
        val lb = withId(Types.optionalList())
        val built = et match {
          case FloatType => if (containsNull) lb.optionalElement(PrimitiveTypeName.FLOAT)
            else lb.requiredElement(PrimitiveTypeName.FLOAT)
          case DoubleType => if (containsNull) lb.optionalElement(PrimitiveTypeName.DOUBLE)
            else lb.requiredElement(PrimitiveTypeName.DOUBLE)
          case LongType => if (containsNull) lb.optionalElement(PrimitiveTypeName.INT64)
            else lb.requiredElement(PrimitiveTypeName.INT64)
          case IntegerType => if (containsNull) lb.optionalElement(PrimitiveTypeName.INT32)
            else lb.requiredElement(PrimitiveTypeName.INT32)
          case BooleanType => if (containsNull) lb.optionalElement(PrimitiveTypeName.BOOLEAN)
            else lb.requiredElement(PrimitiveTypeName.BOOLEAN)
          case StringType => (if (containsNull) lb.optionalElement(PrimitiveTypeName.BINARY)
            else lb.requiredElement(PrimitiveTypeName.BINARY))
            .as(LogicalTypeAnnotation.stringType())
          case other => throw new IllegalArgumentException(s"unsupported array element $other for $name")
        }
        built.named(name)
      case other => throw new IllegalArgumentException(s"unsupported write type $other for $name")
    }
  }
}
