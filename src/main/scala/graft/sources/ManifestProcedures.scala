package graft.sources

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** Iceberg-style SQL maintenance procedures on the manifest catalog —
  * `CALL cat.system.rollback_to_snapshot('ns.tbl', 0)` and friends (the
  * stored-procedure surface Iceberg ships as `system.*`; reference capability
  * analog: index maintenance entry points, e.g. `fm/FmIndexBuilder.java`'s
  * rebuild knobs, lifted to the table-format layer). Each procedure is a thin
  * SQL binding over the SAME public maintenance entry points
  * (ManifestTables / ManifestMaintenance) — no second code path — and returns
  * its outcome as one driver-local row (bounded metadata, never
  * data-proportional). Spark 4's DSv2 `ProcedureCatalog` drives resolution:
  * the analyzer binds and coerces arguments against `parameters()`, then
  * `call` yields one `LocalScan` whose rows ARE the procedure result.
  */
private[sources] object ManifestProcedures {

  /** One-row driver-local result relation. */
  private final class ResultScan(schema: StructType, row: Seq[Any]) extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] = Array(InternalRow.fromSeq(row))
    override def description(): String = s"manifest_procedure_result$schema"
  }

  /** A procedure with a fixed signature: bind is identity (no overloads), the
    * result is one row. `warehouse` anchors table-name resolution to the OWNING
    * catalog — `CALL a.system.p('t')` can never touch catalog b's tables.
    */
  private abstract class Proc(warehouse: String, procName: String, doc: String,
      params: Seq[ProcedureParameter], out: StructType)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = doc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false // mutates / inspects live table state
    protected def run(args: InternalRow): Seq[Any]
    override def call(input: InternalRow): JIterator[Scan] =
      Collections.singletonList[Scan](new ResultScan(out, run(input))).iterator()
    /** `'ns.tbl'` (or `'tbl'`) under THIS catalog's warehouse; requires a
      * committed table so typos fail with a named error, not an empty dir scan.
      */
    protected def dirOf(table: String): String = {
      val dir = (warehouse +: table.split('.').toSeq).mkString("/")
      require(ManifestTables.latestSnapshotId(dir).isDefined,
        s"$procName: no committed manifest table at '$table' (resolved $dir)")
      dir
    }
    /** SQL-side snapshot ids are BIGINT; this format's ids are Int — refuse
      * out-of-range values instead of letting .toInt wrap (4294967296.toInt == 0
      * would silently roll back to snapshot 0, a destructive head change).
      */
    protected def snapshotIdArg(args: InternalRow, i: Int): Int = {
      val id = args.getLong(i)
      require(id >= 0 && id <= Int.MaxValue,
        s"$procName: snapshot_id $id out of range (this table format numbers " +
          s"snapshots 0..${Int.MaxValue})")
      id.toInt
    }
  }

  private def in(name: String, tpe: DataType) = ProcedureParameter.in(name, tpe).build()
  private val tableParam = in("table", StringType)

  // one immutable procedure set per warehouse: CALL / SHOW PROCEDURES resolve
  // against the cache instead of re-allocating the Proc objects per statement
  private val procCache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, UnboundProcedure]]()

  private def procs(warehouse: String): Map[String, UnboundProcedure] =
    procCache.computeIfAbsent(warehouse, buildProcs)

  private def buildProcs(warehouse: String): Map[String, UnboundProcedure] = Seq(
    new Proc(warehouse, "rollback_to_snapshot",
        "Publish a new head re-referencing the target snapshot's state verbatim; " +
          "history stays time-travelable",
        Seq(tableParam, in("snapshot_id", LongType)),
        new StructType().add("previous_snapshot_id", LongType, nullable = false)
          .add("current_snapshot_id", LongType, nullable = false)) {
      override protected def run(args: InternalRow): Seq[Any] = {
        val target = snapshotIdArg(args, 1)
        val cur = ManifestTables.rollbackTo(dirOf(args.getUTF8String(0).toString), target)
        // the CAS guarantees the published head is exactly prior-latest + 1, so
        // the reported previous head is race-free (a separate 'latest' read here
        // could straddle a concurrent commit); a no-op reports prev == cur
        val prev = if (cur == target) cur else cur - 1
        Seq(prev.toLong, cur.toLong)
      }
    },
    new Proc(warehouse, "cherrypick_snapshot",
        "Re-apply one snapshot's append delta onto the current head with fresh " +
          "sequence numbers; refuses non-append snapshots, spec drift, double " +
          "applies, and GC'd files",
        Seq(tableParam, in("snapshot_id", LongType)),
        new StructType().add("current_snapshot_id", LongType, nullable = false)) {
      override protected def run(args: InternalRow): Seq[Any] =
        Seq(ManifestTables.cherrypick(dirOf(args.getUTF8String(0).toString),
          snapshotIdArg(args, 1)).toLong)
    },
    new Proc(warehouse, "expire_snapshots",
        "Remove all but the newest keep_last snapshots (tagged ones always stay), " +
          "then delete segments and data files no retained snapshot references; " +
          "older_than switches to age-based retention (expire strictly older " +
          "commits, still keeping at least keep_last)",
        Seq(tableParam, ProcedureParameter.in("keep_last", IntegerType)
          .defaultValue("1").build(),
          ProcedureParameter.in("older_than", TimestampType)
            .defaultValue("NULL").build()),
        new StructType().add("expired_snapshots", IntegerType, nullable = false)
          .add("deleted_segments", IntegerType, nullable = false)
          .add("deleted_data_files", IntegerType, nullable = false)) {
      override protected def run(args: InternalRow): Seq[Any] = {
        val dir = dirOf(args.getUTF8String(0).toString)
        val (s, seg, d) =
          if (args.isNullAt(2)) ManifestTables.expireSnapshots(dir, args.getInt(1))
          else ManifestTables.expireSnapshotsOlderThan(dir,
            args.getLong(2) / 1000L, // timestamp micros -> commit-ts millis
            retainLast = args.getInt(1))
        Seq(s, seg, d)
      }
    },
    new Proc(warehouse, "rewrite_position_deletes",
        "Merge all merge-on-read positional-delete segments into one and drop " +
          "dangling references; metadata-only (no data file read or written); " +
          "no-op returns NULL",
        Seq(tableParam),
        new StructType().add("snapshot_id", LongType, nullable = true)) {
      override protected def run(args: InternalRow): Seq[Any] =
        Seq(ManifestMaintenance.rewritePositionDeletes(
          dirOf(args.getUTF8String(0).toString)).map(_.toLong).orNull)
    },
    new Proc(warehouse, "compact_manifests",
        "Fold inline entries + every segment into one fresh segment (appends stay " +
          "O(metadata); this is the explicitly-paid O(total files) pass)",
        Seq(tableParam),
        new StructType().add("snapshot_id", LongType, nullable = true)) {
      override protected def run(args: InternalRow): Seq[Any] =
        Seq(ManifestTables.compact(dirOf(args.getUTF8String(0).toString))
          .map(_.toLong).orNull)
    },
    new Proc(warehouse, "rewrite_data_files",
        "Bin-pack small data files up to target_bytes per partition, applying " +
          "pending positional/equality deletes; partition_value scopes the " +
          "rewrite to one (joined) partition — compact the hot partition on a " +
          "tight loop, leave cold history untouched; no-op returns NULL",
        Seq(tableParam, in("target_bytes", LongType),
          ProcedureParameter.in("partition_value", StringType)
            .defaultValue("NULL").build()),
        new StructType().add("snapshot_id", LongType, nullable = true)) {
      override protected def run(args: InternalRow): Seq[Any] = {
        val only = if (args.isNullAt(2)) None
          else Some(Set(args.getUTF8String(2).toString))
        Seq(ManifestMaintenance.compactDataFiles(SparkSession.active,
          dirOf(args.getUTF8String(0).toString), args.getLong(1), only)
          .map(_.toLong).orNull)
      }
    },
    new Proc(warehouse, "create_branch",
        "Fork a writable branch from the current head (or snapshot_id): branch " +
          "appends land on the branch's own chain until fast_forward publishes them",
        Seq(tableParam, in("branch", StringType),
          ProcedureParameter.in("snapshot_id", LongType).defaultValue("NULL").build()),
        new StructType().add("base_snapshot_id", LongType, nullable = false)) {
      override protected def run(args: InternalRow): Seq[Any] = {
        val at = if (args.isNullAt(2)) None else Some(snapshotIdArg(args, 2))
        Seq(ManifestTables.createBranch(dirOf(args.getUTF8String(0).toString),
          args.getUTF8String(1).toString, at).toLong)
      }
    },
    new Proc(warehouse, "fast_forward",
        "Publish a branch's appends onto main — valid only while main still sits " +
          "at the branch's fork point — then advance the fork pointer",
        Seq(tableParam, in("branch", StringType)),
        new StructType().add("current_snapshot_id", LongType, nullable = false)) {
      override protected def run(args: InternalRow): Seq[Any] =
        Seq(ManifestTables.fastForward(dirOf(args.getUTF8String(0).toString),
          args.getUTF8String(1).toString).toLong)
    },
    new Proc(warehouse, "drop_branch",
        "Drop a branch and its chain; branch-appended data files become orphans " +
          "for remove_orphan_files",
        Seq(tableParam, in("branch", StringType)),
        new StructType().add("dropped", BooleanType, nullable = false)) {
      override protected def run(args: InternalRow): Seq[Any] =
        Seq(ManifestTables.dropBranch(dirOf(args.getUTF8String(0).toString),
          args.getUTF8String(1).toString))
    },
    new Proc(warehouse, "publish_wap",
        "Publish a staged (write-audit-publish) append onto the current head with " +
          "fresh sequence numbers; refuses spec drift, double applies, and GC'd files",
        Seq(tableParam, in("wap_id", StringType)),
        new StructType().add("current_snapshot_id", LongType, nullable = false)) {
      override protected def run(args: InternalRow): Seq[Any] =
        Seq(ManifestTables.publishStaged(dirOf(args.getUTF8String(0).toString),
          args.getUTF8String(1).toString).toLong)
    },
    new Proc(warehouse, "discard_wap",
        "Drop a staged (write-audit-publish) append without publishing; its data " +
          "files become orphans for remove_orphan_files",
        Seq(tableParam, in("wap_id", StringType)),
        new StructType().add("discarded", BooleanType, nullable = false)) {
      override protected def run(args: InternalRow): Seq[Any] =
        Seq(ManifestTables.discardStaged(dirOf(args.getUTF8String(0).toString),
          args.getUTF8String(1).toString))
    },
    new Proc(warehouse, "create_tag",
        "Pin an immutable named tag on snapshot_id (default: the current head); " +
          "tagged snapshots survive expire_snapshots and serve VERSION AS OF 'tag'",
        Seq(tableParam, in("tag", StringType),
          ProcedureParameter.in("snapshot_id", LongType).defaultValue("NULL").build()),
        new StructType().add("snapshot_id", LongType, nullable = false)) {
      override protected def run(args: InternalRow): Seq[Any] = {
        val dir = dirOf(args.getUTF8String(0).toString)
        val tag = args.getUTF8String(1).toString
        val id =
          if (args.isNullAt(2)) ManifestTables.tagLatest(dir, tag)
          else {
            val at = snapshotIdArg(args, 2)
            ManifestTables.createTag(dir, tag, at) // throws on unknown snapshot / reused name
            at
          }
        Seq(id.toLong)
      }
    },
    new Proc(warehouse, "drop_tag",
        "Remove a tag; its snapshot loses expiry protection (tags are immutable — " +
          "moving a name is drop_tag then create_tag)",
        Seq(tableParam, in("tag", StringType)),
        new StructType().add("dropped", BooleanType, nullable = false)) {
      override protected def run(args: InternalRow): Seq[Any] =
        Seq(ManifestTables.deleteTag(dirOf(args.getUTF8String(0).toString),
          args.getUTF8String(1).toString))
    },
    new Proc(warehouse, "remove_orphan_files",
        "Delete data/segment files under the table that NO retained snapshot " +
          "references and that are older than older_than_ms (crash debris)",
        Seq(tableParam, in("older_than_ms", LongType)),
        new StructType().add("deleted_files", IntegerType, nullable = false)) {
      override protected def run(args: InternalRow): Seq[Any] =
        Seq(ManifestTables.removeOrphans(
          dirOf(args.getUTF8String(0).toString), args.getLong(1)))
    },
    new Proc(warehouse, "add_partition_field",
        "PARTITION EVOLUTION: add a hidden transform field (bucket(n,col) / " +
          "days(col) / truncate(w,col)) to the table's spec without rewriting " +
          "any data file; existing files keep their own spec (per-file spec_id), " +
          "new writes route and prune by the new field",
        Seq(tableParam, in("field", StringType)),
        new StructType().add("current_snapshot_id", LongType, nullable = false)
          .add("spec", StringType, nullable = false)) {
      override protected def run(args: InternalRow): Seq[Any] = {
        val dir = dirOf(args.getUTF8String(0).toString)
        val snap = ManifestMaintenance.addPartitionField(dir,
          args.getUTF8String(1).toString)
        Seq(snap.toLong, org.apache.spark.unsafe.types.UTF8String.fromString(
          ManifestTables.readPartitionSpec(dir, Some(snap))
            .map(ManifestTables.specTokenOf).mkString(",")))
      }
    },
    new Proc(warehouse, "drop_partition_field",
        "PARTITION EVOLUTION: drop a hidden transform field (by spec token or " +
          "synthetic name) from the table's spec; files stay readable under " +
          "their own recorded specs, identity columns never drop",
        Seq(tableParam, in("field", StringType)),
        new StructType().add("current_snapshot_id", LongType, nullable = false)
          .add("spec", StringType, nullable = false)) {
      override protected def run(args: InternalRow): Seq[Any] = {
        val dir = dirOf(args.getUTF8String(0).toString)
        val snap = ManifestMaintenance.dropPartitionField(dir,
          args.getUTF8String(1).toString)
        Seq(snap.toLong, org.apache.spark.unsafe.types.UTF8String.fromString(
          ManifestTables.readPartitionSpec(dir, Some(snap))
            .map(ManifestTables.specTokenOf).mkString(",")))
      }
    }
  ).map(p => p.name() -> (p: UnboundProcedure)).toMap

  private[sources] val Namespace = "system"

  private[sources] def load(warehouse: String, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Array(Namespace)),
      s"procedures live under the '$Namespace' namespace, got " +
        s"'${ident.namespace().mkString(".")}.${ident.name()}'")
    val all = procs(warehouse)
    all.getOrElse(ident.name(), throw new IllegalArgumentException(
      s"unknown procedure '${ident.name()}' " +
        s"(have: ${all.keys.toSeq.sorted.mkString(", ")})"))
  }

  private[sources] def list(warehouse: String, namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array(Namespace)))
      procs(warehouse).keys.toSeq.sorted
        .map(n => Identifier.of(Array(Namespace), n)).toArray
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
      namespace) // the DSv2 contract: a typo'd namespace errors, never reads empty
}
