package graft.sources

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.nio.file.{Files, Paths}
import java.util
import scala.jdk.CollectionConverters._

/** TableCatalog plugin over a warehouse of manifest-committed tables — manifest tables
  * become addressable by NAME in plain SQL, the last mile of the DSv2 surface:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", "graft.sources.ManifestCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/warehouse")
  *   spark.sql("SELECT lang_p, count(*) FROM graft.corpus.docs GROUP BY 1")
  *   spark.sql("INSERT INTO graft.corpus.docs SELECT ...")       // snapshot commit
  *   spark.sql("SELECT * FROM graft.corpus.docs VERSION AS OF 0") // time travel
  * }}}
  *
  * A table named `ns1.ns2.t` lives at `<warehouse>/ns1/ns2/t` — any directory holding
  * a committed `_manifests` snapshot IS a table (the catalog holds no state of its
  * own, exactly like the path-based API; both views of the same directory stay
  * consistent because the manifest is the single source of truth). SQL `VERSION AS
  * OF n` maps to the pinned-snapshot read. DDL is intentionally thin: tables are
  * CREATED by writing data (the DSv2 write bootstrap defines the schema); the one
  * supported evolution is `ALTER TABLE ... ADD COLUMN` (metadata-only snapshot, old
  * files null-fill); everything else is unsupported rather than half-implemented.
  */
class ManifestCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null,
      s"spark.sql.catalog.$name.warehouse must point at the table root directory")
  }
  override def name(): String = catalogName

  private def dirOf(ident: Identifier): String =
    (warehouse +: ident.namespace().toSeq :+ ident.name()).mkString("/")

  private def isTable(dir: String): Boolean =
    ManifestTables.latestSnapshotId(dir).isDefined

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val nsDir = Paths.get((warehouse +: namespace.toSeq).mkString("/"))
    if (!Files.isDirectory(nsDir)) throw new NoSuchNamespaceException(namespace)
    val stream = Files.list(nsDir)
    try stream.iterator().asScala
      .filter(p => Files.isDirectory(p) && isTable(p.toString))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
    finally stream.close()
  }

  override def tableExists(ident: Identifier): Boolean = isTable(dirOf(ident))

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    new ManifestDataTable(dir, ManifestDataSource.tableSchema(dir))
  }

  /** SQL `VERSION AS OF <n>` — serves the pinned committed snapshot. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    // a decimal literal is a snapshot id; anything else resolves as a TAG name
    val snap = ManifestTables.resolveVersion(dir, version)
    // Fail at resolution time if the pinned snapshot does not exist (readSnapshot
    // throws for an unknown id); a legitimately EMPTY snapshot (e.g. an empty
    // overwrite) is fine and serves zero rows. The schema is the PINNED snapshot's
    // own (tableSchema honors its ALTER-recorded DDL when present): a version from
    // before a column was added serves the narrower historical schema.
    ManifestTables.readSnapshot(dir, Some(snap))
    new ManifestDataTable(dir, ManifestDataSource.tableSchema(dir, Some(snap)), Some(snap))
  }

  /** SQL `TIMESTAMP AS OF <t>` — Spark hands MICROseconds since epoch; serve the
    * latest snapshot committed at or before that moment (same pinning as a
    * version read; legacy pre-ts snapshots resolve via their file mtime).
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val snap = ManifestTables.requireTimestampMs(dir, timestamp / 1000L)
    new ManifestDataTable(dir, ManifestDataSource.tableSchema(dir, Some(snap)), Some(snap))
  }

  override def createTable(ident: Identifier, schema: org.apache.spark.sql.types.StructType,
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "manifest tables are created by writing data (DSv2 write bootstrap); CREATE TABLE is not supported")

  /** Schema evolution, Iceberg-style metadata-only: `ALTER TABLE ... ADD COLUMN`
    * publishes a NEW snapshot carrying the same file references plus the widened
    * schema as a DDL override — no data file is touched. Files written before the
    * ALTER null-fill the added column at read time (the reader's constant-vector
    * path); later appends must supply it and carry the override forward. Only
    * top-level nullable ADD COLUMN is supported — everything else (renames, drops,
    * type changes) would need per-file column-id mapping to be correct and is
    * rejected loudly.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val adds = changes.map {
      case a: TableChange.AddColumn =>
        require(a.fieldNames().length == 1,
          s"ADD COLUMN supports top-level columns only, got ${a.fieldNames().mkString(".")}")
        require(a.isNullable,
          s"added column ${a.fieldNames().head} must be nullable — existing files cannot backfill it")
        require(a.position() == null,
          "FIRST/AFTER positions are not supported — added columns append at the end")
        org.apache.spark.sql.types.StructField(a.fieldNames().head, a.dataType(), nullable = true)
      case other => throw new UnsupportedOperationException(
        s"only ADD COLUMN is supported on manifest tables, got ${other.getClass.getSimpleName}")
    }
    // optimistic-concurrency publication, same discipline as the write path: the
    // ALTER races cleanly with concurrent appends (losers retarget latest+1)
    var attempt = 0
    var done = false
    while (!done) {
      val cur = ManifestDataSource.tableSchema(dir)
      adds.foreach(f => require(!cur.fieldNames.contains(f.name),
        s"column ${f.name} already exists in ${cur.simpleString}"))
      val widened = org.apache.spark.sql.types.StructType(cur.fields ++ adds)
      val refs = ManifestTables.readSnapshotRefs(dir, None)
      // pin the target id from the refs already read (CAS ordering rule)
      val next = refs.snapshot + 1
      done = ManifestTables.tryWriteSnapshotRefs(dir, ManifestTables.readPartitionColumn(dir),
        refs.inline, refs.segments, next, partTypes = ManifestTables.readPartitionTypes(dir),
        schemaDdl = Some(widened.toDDL), deletes = refs.deletes)
      if (!done) {
        attempt += 1
        require(attempt < 16, s"ALTER TABLE on $dir lost the snapshot race $attempt times")
        Thread.sleep(20L * attempt +
          java.util.concurrent.ThreadLocalRandom.current().nextLong(1, 20))
      }
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "DROP TABLE is not supported — delete the table directory to drop a manifest table")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE is not supported on manifest tables")

  // ------------------------------------------------------------- FunctionCatalog
  // `cat.fm_count(shard, 'p')` in SQL resolves HERE; the resulting
  // ApplyFunctionExpression translates to a V2 UserDefinedScalarFunc predicate that
  // the manifest scan recognizes for fingerprint file pruning (any namespace depth —
  // the function is catalog-global, not per-table)

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "fm_count"))

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    ident.name() match {
      case "fm_count" => graft.functions.FmCountV2
      case other =>
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)
    }

  override def functionExists(ident: Identifier): Boolean = ident.name() == "fm_count"
}
