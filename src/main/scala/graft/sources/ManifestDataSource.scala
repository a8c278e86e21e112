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
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 DATA table over a manifest-committed parquet directory — the sibling
  * of ManifestFilesSource that serves the rows themselves (the Iceberg data-path
  * analog; round 2 shipped only the `.files` metadata table):
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
  *    e.g. count(*), reads only footer row counts).
  *
  * Usage: `spark.read.format("graft.sources.ManifestDataSource").load(dir)` after a
  * `ManifestTables.commit(dir, partCol)`.
  */
class ManifestDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ManifestDataSource.tableSchema(options.get("path"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ManifestDataTable(properties.get("path"), schema)
  override def supportsExternalMetadata(): Boolean = false
}

object ManifestDataSource {

  private[sources] def hadoopConf(): Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** File schema of the first committed data file + the manifest's partition column
    * appended as a (non-null) string. Derived on the driver at plan time only.
    */
  private[sources] def tableSchema(dir: String): StructType = {
    require(dir != null, "graft.sources.ManifestDataSource requires .load(<table dir>)")
    val entries = ManifestTables.readLatest(dir)
    require(entries.nonEmpty, s"manifest under $dir lists no data files")
    val conf = hadoopConf()
    val in = HadoopInputFile.fromPath(new Path(s"$dir/${entries.head.path}"), conf)
    val reader = ParquetFileReader.open(in)
    val fileSchema = try reader.getFileMetaData.getSchema finally reader.close()
    val base = sparkFields(fileSchema)
    val partCol = ManifestTables.readPartitionColumn(dir)
    if (partCol.isEmpty) StructType(base)
    else StructType(base :+ StructField(partCol, StringType, nullable = false))
  }

  /** parquet MessageType -> Spark fields for the flat primitive schemas graft tables
    * use (long/int/double/float/boolean/string/binary/date/timestamp). Anything else
    * fails loudly rather than mis-reading.
    */
  private def sparkFields(mt: MessageType): Seq[StructField] =
    mt.getFields.asScala.toSeq.map { f =>
      require(f.isPrimitive, s"ManifestDataSource supports flat primitive schemas; got $f")
      val p = f.asPrimitiveType()
      val dt = p.getPrimitiveTypeName match {
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
            s"ManifestDataSource: unsupported parquet type $other for field ${f.getName}")
      }
      StructField(f.getName, dt, nullable = f.getRepetition != Type.Repetition.REQUIRED)
    }
}

private class ManifestDataTable(dir: String, tschema: StructType)
    extends Table with SupportsRead {
  require(dir != null, "graft.sources.ManifestDataSource requires .load(<table dir>)")
  override def name(): String = s"manifest_data($dir)"
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestDataScanBuilder(dir, tschema, ManifestTables.readPartitionColumn(dir))
}

private class ManifestDataScanBuilder(dir: String, tschema: StructType, partCol: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = tschema
  private var partitionValues: Option[Set[String]] = None

  override def pruneColumns(requiredSchema: StructType): Unit = { required = requiredSchema }

  /** Partition-column equality/IN prunes files at the manifest; everything else stays
    * residual (returned to Spark for post-scan evaluation).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (pushed, residual) = filters.partition {
      case EqualTo(c, _: String) if c == partCol && partCol.nonEmpty => true
      case In(c, vs) if c == partCol && partCol.nonEmpty => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    val accepted = pushed.flatMap {
      case EqualTo(_, v: String) => Seq(Set(v))
      case In(_, vs) => Seq(vs.map(_.asInstanceOf[String]).toSet)
      case _ => Nil
    }
    if (accepted.nonEmpty) partitionValues = Some(accepted.reduce(_ intersect _))
    residual
  }
  override def pushedFilters(): Array[Filter] =
    partitionValues.map(vs => Array[Filter](In(partCol, vs.toArray))).getOrElse(Array.empty)

  override def build(): Scan = new ManifestDataScan(dir, tschema, required, partCol, partitionValues)
}

private class ManifestDataScan(dir: String, tschema: StructType, required: StructType,
    partCol: String, partitionValues: Option[Set[String]]) extends Scan with Batch {
  // snapshot pinned at plan time (see class doc) + manifest-level partition pruning
  private lazy val pinned: Seq[ManifestTables.Entry] =
    ManifestTables.readLatest(dir)
      .filter(e => partitionValues.forall(_.contains(e.partition)))
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    pinned.map(e => ManifestDataInputPartition(s"$dir/${e.path}", e.partition): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory = {
    // serializable projection spec: (name, dataType) of required fields, partition
    // fields marked by index
    val fields = required.fields.map(f => (f.name, f.dataType))
    new ManifestDataReaderFactory(fields, partCol)
  }
  override def description(): String =
    s"manifest_data($dir, partitions=${partitionValues.map(_.toSeq.sorted.mkString(",")).getOrElse("*")}, files=${pinned.size})"
}

private case class ManifestDataInputPartition(file: String, partition: String)
    extends InputPartition

private class ManifestDataReaderFactory(fields: Array[(String, DataType)], partCol: String)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ManifestDataInputPartition]
    val dataFields = fields.filter(_._1 != partCol)
    val partOrdinals = fields.zipWithIndex.collect { case ((n, _), i) if n == partCol => i }
    val partValue = UTF8String.fromString(p.partition)
    if (dataFields.isEmpty) emptyProjectionReader(p, partOrdinals, partValue)
    else groupReader(p, dataFields, partOrdinals, partValue)
  }

  /** Zero data columns requested (count(*) / partition-column-only reads): row count
    * comes from the footer; no page is decoded.
    */
  private def emptyProjectionReader(p: ManifestDataInputPartition,
      partOrdinals: Array[Int], partValue: UTF8String): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var remaining: Long = -1
      private val row = {
        val r = new Array[Any](fields.length)
        partOrdinals.foreach(i => r(i) = partValue)
        InternalRow.fromSeq(r.toSeq)
      }
      override def next(): Boolean = {
        if (remaining < 0) {
          val in = HadoopInputFile.fromPath(new Path(p.file), ManifestDataSource.hadoopConf())
          val r = ParquetFileReader.open(in)
          remaining = try r.getRecordCount finally r.close()
        }
        remaining -= 1
        remaining >= 0
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }

  /** Projected parquet example-Group reader; field extraction is pre-resolved to an
    * array of (group field index -> row ordinal, converter) closures.
    */
  private def groupReader(p: ManifestDataInputPartition, dataFields: Array[(String, DataType)],
      partOrdinals: Array[Int], partValue: UTF8String): PartitionReader[InternalRow] = {
    val conf = ManifestDataSource.hadoopConf()
    // projection pushdown: hand parquet-mr only the required fields, typed from the
    // footer schema so dictionary/encoding handling stays the writer's
    val in = HadoopInputFile.fromPath(new Path(p.file), conf)
    val footerReader = ParquetFileReader.open(in)
    val fileSchema = try footerReader.getFileMetaData.getSchema finally footerReader.close()
    val projected = new MessageType("graft_projection",
      dataFields.map(f => fileSchema.getType(fileSchema.getFieldIndex(f._1))): _*)
    conf.set(ReadSupport.PARQUET_READ_SCHEMA, projected.toString)
    val reader: ParquetReader[Group] =
      ParquetReader.builder(new GroupReadSupport(), new Path(p.file)).withConf(conf).build()

    val ordinalOf: Map[String, Int] =
      fields.zipWithIndex.map { case ((n, _), i) => (n, i) }.toMap

    new PartitionReader[InternalRow] {
      private var cur: Group = _
      override def next(): Boolean = { cur = reader.read(); cur != null }
      override def get(): InternalRow = {
        val out = new Array[Any](fields.length)
        partOrdinals.foreach(i => out(i) = partValue)
        var gi = 0
        while (gi < dataFields.length) {
          val (name, dt) = dataFields(gi)
          val v: Any =
            if (cur.getFieldRepetitionCount(gi) == 0) null
            else dt match {
              case LongType | TimestampType | TimestampNTZType => cur.getLong(gi, 0)
              case IntegerType | DateType => cur.getInteger(gi, 0)
              case DoubleType => cur.getDouble(gi, 0)
              case FloatType => cur.getFloat(gi, 0)
              case BooleanType => cur.getBoolean(gi, 0)
              case StringType => UTF8String.fromBytes(cur.getBinary(gi, 0).getBytes)
              case BinaryType => cur.getBinary(gi, 0).getBytes
              case other => throw new IllegalStateException(s"unreachable type $other for $name")
            }
          out(ordinalOf(name)) = v
          gi += 1
        }
        InternalRow.fromSeq(out.toSeq)
      }
      override def close(): Unit = reader.close()
    }
  }
}
