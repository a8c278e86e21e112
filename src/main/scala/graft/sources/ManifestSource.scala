package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util
import scala.jdk.CollectionConverters._

/** Generic snapshot-manifest commit for a Hive-partitioned parquet directory — the
  * Iceberg-layout discipline of graft.pipeline.PartitionedTable generalized to any
  * single string partition column: `_manifests/snapshot-N.json` lists every data file
  * with its byte size and partition value. Readers that go through the manifest (the
  * DSv2 source below) see EXACTLY the committed snapshot — stray or in-flight files in
  * the directory are invisible, which is the property that makes concurrent
  * writers/readers safe on object storage.
  */
object ManifestTables {

  def commit(dir: String, partCol: String, snapshot: Int = 0): Unit = {
    val root = Paths.get(dir)
    val walk = Files.walk(root)
    val files = try walk.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && !p.toString.contains("_manifests"))
      .map(p => root.relativize(p).toString)
      .toSeq.sorted
    finally walk.close()
    def partOf(rel: String): String =
      rel.split('/').find(_.startsWith(partCol + "=")) match {
        case Some(seg) => seg.substring(partCol.length + 1)
        case None => ""
      }
    val fileList = files.map { f =>
      s"""    {"path": "$f", "bytes": ${Files.size(root.resolve(f))}, "partition": "${partOf(f)}"}"""
    }
    val json =
      s"""{
         |  "snapshot": $snapshot,
         |  "partition_column": "$partCol",
         |  "files": [
         |${fileList.mkString(",\n")}
         |  ]
         |}""".stripMargin
    val mdir = root.resolve("_manifests")
    Files.createDirectories(mdir)
    Files.write(mdir.resolve(f"snapshot-$snapshot%05d.json"),
      json.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  private[sources] case class Entry(path: String, bytes: Long, partition: String, snapshot: Int)

  private[sources] def readLatest(dir: String): Seq[Entry] = {
    val mdir = Paths.get(dir, "_manifests")
    require(Files.isDirectory(mdir), s"no _manifests under $dir — commit a snapshot first")
    val stream = Files.list(mdir)
    val snaps = try stream.iterator().asScala.map(_.toString).toSeq.sorted finally stream.close()
    require(snaps.nonEmpty, s"empty _manifests under $dir — commit a snapshot first")
    val txt = new String(Files.readAllBytes(Paths.get(snaps.last)), StandardCharsets.UTF_8)
    val snap = "\"snapshot\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toInt).getOrElse(0)
    // partition key optional: PartitionedTable's transcript manifests share this file
    // layout but carry no partition values (they surface as "")
    val entry =
      ("\\{\"path\":\\s*\"([^\"]+)\",\\s*\"bytes\":\\s*(\\d+)" +
        "(?:,\\s*\"partition\":\\s*\"([^\"]*)\")?\\}").r
    val out = entry.findAllMatchIn(txt)
      .map(m => Entry(m.group(1), m.group(2).toLong, Option(m.group(3)).getOrElse(""), snap))
      .toSeq
    // loud failure on format drift: a manifest that lists files we cannot parse must
    // never silently read as an empty table
    require(out.nonEmpty || !txt.contains("\"path\""),
      s"manifest ${snaps.last} lists files but none matched the entry format")
    out
  }

  /** Reads the parquet files listed by the latest committed snapshot (snapshot
    * isolation: directory listings are never trusted) and restores the partition
    * column from the manifest's partition values.
    */
  def readData(spark: SparkSession, dir: String, partCol: String) = {
    import org.apache.spark.sql.functions._
    val entries = readLatest(dir)
    val paths = entries.map(e => s"$dir/${e.path}")
    spark.read.parquet(paths: _*)
      .withColumn(partCol,
        regexp_extract(input_file_name(), java.util.regex.Pattern.quote(partCol + "=") + "([^/]+)/", 1))
  }
}

/** DataSource V2: the manifest FILES metadata table (the analog of Iceberg's `.files`
  * metadata table). `spark.read.format("graft.sources.ManifestFilesSource")
  * .load(dir)` returns one row per data file of the latest committed snapshot with
  * schema (path, bytes, partition, snapshot). Column pruning is pushed into the scan
  * (SupportsPushDownRequiredColumns). The full DSv2 stack — TableProvider -> Table ->
  * ScanBuilder -> Batch -> PartitionReaderFactory — on public connector APIs only.
  */
class ManifestFilesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ManifestFilesSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ManifestFilesTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object ManifestFilesSource {
  val Schema: StructType = new StructType()
    .add("path", StringType, nullable = false)
    .add("bytes", LongType, nullable = false)
    .add("partition", StringType, nullable = false)
    .add("snapshot", LongType, nullable = false)
}

private class ManifestFilesTable(dir: String) extends Table with SupportsRead {
  require(dir != null, "graft.sources.ManifestFilesSource requires .load(<table dir>)")
  override def name(): String = s"manifest_files($dir)"
  override def schema(): StructType = ManifestFilesSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestScanBuilder(dir)
}

private class ManifestScanBuilder(dir: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = ManifestFilesSource.Schema
  private var partitionValues: Option[Set[String]] = None

  override def pruneColumns(requiredSchema: StructType): Unit = { required = requiredSchema }

  /** Accepts equality/IN filters on the partition column — the scan then reads only
    * matching manifest entries (partition pruning at the source). Everything else is
    * left to Spark (returned as residual).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (pushed, residual) = filters.partition {
      case EqualTo("partition", _: String) => true
      case In("partition", vs) => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    val accepted = pushed.flatMap {
      case EqualTo("partition", v: String) => Seq(Set(v))
      case In("partition", vs) => Seq(vs.map(_.asInstanceOf[String]).toSet)
      case _ => Nil
    }
    if (accepted.nonEmpty)
      partitionValues = Some(accepted.reduce(_ intersect _))
    residual
  }
  override def pushedFilters(): Array[Filter] =
    partitionValues.map(vs => Array[Filter](In("partition", vs.toArray))).getOrElse(Array.empty)

  override def build(): Scan = new ManifestScan(dir, required, partitionValues)
}

private class ManifestScan(dir: String, required: StructType,
    partitionValues: Option[Set[String]]) extends Scan with Batch {
  // SNAPSHOT PINNED AT PLAN TIME: the manifest is resolved ONCE on the driver and the
  // entry list ships inside the InputPartition. Reading it per-task would let a commit
  // that lands between planning and execution (or between a task and its retry) leak
  // a different snapshot into the same logical scan.
  private lazy val pinned: Seq[ManifestTables.Entry] =
    ManifestTables.readLatest(dir)
      .filter(e => partitionValues.forall(_.contains(e.partition)))
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(ManifestInputPartition(pinned))
  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestReaderFactory(required.fieldNames)
  override def description(): String =
    s"manifest_files($dir, partitions=${partitionValues.map(_.toSeq.sorted.mkString(",")).getOrElse("*")})"
}

private case class ManifestInputPartition(entries: Seq[ManifestTables.Entry])
    extends InputPartition

private class ManifestReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val entries = partition.asInstanceOf[ManifestInputPartition].entries.iterator
    new PartitionReader[InternalRow] {
      private var cur: ManifestTables.Entry = _
      override def next(): Boolean = { val h = entries.hasNext; if (h) cur = entries.next(); h }
      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toSeq.map {
          case "path" => UTF8String.fromString(cur.path)
          case "bytes" => cur.bytes
          case "partition" => UTF8String.fromString(cur.partition)
          case "snapshot" => cur.snapshot.toLong
        })
      override def close(): Unit = ()
    }
  }
}
