package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-FILE column statistics (min/max bounds) recorded in the manifest at write
  * time and used to SKIP whole files at scan planning — Iceberg's data-skipping
  * discipline on this layout. Partition pruning removes files by directory value;
  * stats pruning removes files by data-column CONTENT bounds, which is the lever
  * that matters for range predicates over sorted/clustered columns (time ranges
  * over event tables, id ranges over ingest batches) at 100 TB: a predicate
  * touching 1% of the key space should open ~1% of the files.
  *
  * Encoding (one escaped JSON string field per manifest entry, flat and
  * regex-friendly — the manifest's parser stays a single regex):
  *   record    := name FS kind FS minEnc FS maxEnc (FS nullCount)?
  *   stats     := record (RS record)*
  *   kind      := 'l' (integral: int/long/date/timestamp — decimal micros/days) |
  *                'd' (float/double — java.lang.Double.toString) |
  *                's' (string — base64 of UTF-8 bytes; bounds compare in
  *                     UTF8String binary order, Spark's own string order)
  * An all-null column records EMPTY min/max (prunes every non-null comparison);
  * a column with no record is UNKNOWN (never pruned — the safe direction, and how
  * entries written before this feature behave). String bounds are recorded only
  * when every value fits [[ManifestStats.MaxStringStat]] chars — long text
  * columns carry no bounds rather than truncated ones (a truncated upper bound
  * would be unsound without Iceberg's increment-last-char dance). Bounds that
  * exist but are UNUSABLE (a NaN was seen, an over-long string) encode as `?`
  * — distinct from the all-null EMPTY encoding, so null counts can still ride.
  *
  * The optional 5th field is the column's EXACT per-file null count (Iceberg's
  * null_value_counts analog). Its presence doubles as the V2-EXACTNESS marker:
  * records carrying it were written by a path whose bounds are exact row-level
  * tallies (the live accumulator or a parquet footer of the very file), so the
  * manifest can answer pushed MIN/MAX/COUNT aggregates from metadata alone —
  * zero footer opens, O(manifest) instead of O(files) (see ManifestAggScan).
  * 4-field records (pre-feature, or bound-merged) prune but never aggregate.
  */
private[sources] object ManifestStats {
  val RecSep = '\u001e'
  val FieldSep = '\u001f'
  val MaxStringStat = 64

  /** Stat kind of a column type; None = not stat-able (binary/array/bool/...). */
  def kindOf(dt: DataType): Option[Char] = dt match {
    case IntegerType | LongType | DateType | TimestampType | TimestampNTZType => Some('l')
    case FloatType | DoubleType => Some('d')
    case StringType => Some('s')
    case _ => None
  }

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), java.nio.charset.StandardCharsets.UTF_8)

  /** Derives the stats encoding from a parquet file's FOOTER column-chunk
    * statistics — the path for files Spark's own writer produced (clustering
    * rewrites land through `df.write.parquet`, not the DSv2 row writer). Per
    * column, merged across row groups; the same safety rules as the live
    * accumulator: no bounds when any chunk lacks statistics, when a float bound
    * is NaN, or when a string bound exceeds [[MaxStringStat]] (footer binary
    * stats can also be writer-truncated — an over-long bound is simply not
    * recorded rather than trusted).
    */
  def fromFooter(file: String, fields: Seq[(String, DataType)],
      conf: org.apache.hadoop.conf.Configuration): (String, Long) = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val reader = ParquetFileReader.open(
      if (NioParquetIO.isLocal(file)) NioParquetIO.input(file)
      else HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file), conf))
    val blocks = try reader.getFooter.getBlocks finally reader.close()
    import scala.jdk.CollectionConverters._
    val rows = blocks.asScala.map(_.getRowCount).sum
    val chunks = blocks.asScala.flatMap(_.getColumns.asScala)
      .groupBy(_.getPath.toDotString)
    val enc = fields.flatMap { case (name, dt) =>
      kindOf(dt).flatMap { kind =>
        if (name.indexOf(RecSep.toInt) >= 0 || name.indexOf(FieldSep.toInt) >= 0) None
        else chunks.get(name).flatMap { cs =>
          val stats = cs.map(_.getStatistics)
          if (stats.exists(s => s == null || s.isEmpty)) None
          else {
            // the 5th field (exact null count) rides only when EVERY chunk tallied
            // nulls — it is the V2-exactness marker the metadata-aggregate path
            // gates on, so it must never be guessed
            val nullsField =
              if (stats.forall(_.isNumNullsSet)) s"$FieldSep${stats.map(_.getNumNulls).sum}"
              else ""
            if (stats.forall(s => !s.hasNonNullValue)) // every chunk all-null
              Some(s"$name$FieldSep$kind$FieldSep$FieldSep$nullsField")
            else if (stats.exists(s => !s.hasNonNullValue && s.getNumNulls == 0)) None
            else try {
              val present = stats.filter(_.hasNonNullValue)
              def enc1(v: Any): Option[String] = (kind, v) match {
                case ('l', n: java.lang.Number) => Some(n.longValue.toString)
                case ('d', n: java.lang.Number) =>
                  val d = normZero(n.doubleValue)
                  if (d.isNaN) None else Some(d.toString)
                case ('s', b: org.apache.parquet.io.api.Binary) =>
                  val s = b.toStringUsingUTF8
                  if (s.length > MaxStringStat) None else Some(b64(s))
                case _ => None
              }
              val mins = present.map(s => enc1(s.genericGetMin))
              val maxs = present.map(s => enc1(s.genericGetMax))
              if (mins.exists(_.isEmpty) || maxs.exists(_.isEmpty))
                // bounds unusable (NaN / over-long string) but null counts exact:
                // '?' bounds never prune and never aggregate; the count still can
                if (nullsField.nonEmpty)
                  Some(s"$name$FieldSep$kind$FieldSep?$FieldSep?$nullsField")
                else None
              else {
                val mn = mins.flatten.reduce((a, b) => if (ltEnc(kind)(a, b)) a else b)
                val mx = maxs.flatten.reduce((a, b) => if (ltEnc(kind)(a, b)) b else a)
                Some(s"$name$FieldSep$kind$FieldSep$mn$FieldSep$mx$nullsField")
              }
            } catch { case _: IllegalArgumentException | _: UnsupportedOperationException => None }
          }
        }
      }
    }.mkString(RecSep.toString)
    (enc, rows)
  }

  /** A data-column comparison usable for pruning: op in =, <, <=, >, >=, in.
    * `values` are catalyst-internal literal values (UTF8String, epoch-day Int, ...).
    */
  case class Bound(col: String, op: String, values: Seq[Any])

  /** Catalyst literal -> the stat kind's comparable domain; None = not convertible
    * (mismatched literal type -> no pruning, the safe direction).
    */
  private def asLong(v: Any): Option[Long] = v match {
    case i: java.lang.Integer => Some(i.longValue)
    case l: java.lang.Long => Some(l.longValue)
    case s: java.lang.Short => Some(s.longValue)
    case b: java.lang.Byte => Some(b.longValue)
    case _ => None
  }
  private def asDouble(v: Any): Option[Double] = v match {
    case d: java.lang.Double => Some(d.doubleValue)
    case f: java.lang.Float => Some(f.doubleValue)
    case _ => asLong(v).map(_.toDouble)
  }
  private def asUtf8(v: Any): Option[UTF8String] = v match {
    case u: UTF8String => Some(u)
    case s: String => Some(UTF8String.fromString(s))
    case _ => None
  }

  /** -0.0 normalizes to +0.0 on BOTH sides: SQL says -0.0 = 0.0, but
    * Double.compare's total order separates them — an un-normalized bound would
    * prune a file whose rows actually match the predicate.
    */
  private def normZero(v: Double): Double = if (v == 0.0d) 0.0d else v

  /** sign of (bound - literal), or None when the literal does not convert,
    * is NaN (never a basis for skipping a file), or the recorded bound is
    * malformed — corrupted stats must degrade to "no pruning", never crash
    * every scan of the table.
    */
  private def cmp(kind: Char, boundEnc: String, lit: Any): Option[Int] =
    try kind match {
      case 'l' => asLong(lit).map(v => java.lang.Long.compare(boundEnc.toLong, v))
      case 'd' => asDouble(lit).flatMap { v =>
        if (v.isNaN) None
        else Some(java.lang.Double.compare(normZero(boundEnc.toDouble), normZero(v)))
      }
      case 's' => asUtf8(lit).map(v => UTF8String.fromString(unb64(boundEnc)).compareTo(v))
      case _ => None
    } catch { case _: IllegalArgumentException => None }

  /** One decoded record: bounds plus the optional exact null count (the V2 marker). */
  private[sources] case class Rec(kind: Char, mn: String, mx: String, nulls: Option[Long])

  private[sources] def parseRecs(stats: String): Map[String, Rec] =
    stats.split(RecSep).iterator.flatMap { r =>
      r.split(FieldSep.toString, -1) match {
        case Array(name, kind, mn, mx) if kind.length == 1 =>
          Some(name -> Rec(kind.head, mn, mx, None))
        case Array(name, kind, mn, mx, nulls) if kind.length == 1 =>
          Some(name -> Rec(kind.head, mn, mx, nulls.toLongOption))
        case _ => None
      }
    }.toMap

  private def parse(stats: String): Map[String, (Char, String, String)] =
    parseRecs(stats).map { case (n, r) => n -> (r.kind, r.mn, r.mx) }

  /** Does a file with these stats POSSIBLY contain a row matching every bound?
    * false = provably no match = the file is skipped. Unknown columns, unparseable
    * records, and non-convertible literals all answer true (never prune on doubt).
    */
  def allows(stats: String, bounds: Seq[Bound]): Boolean = {
    if (stats.isEmpty || bounds.isEmpty) return true
    val recs = parse(stats)
    bounds.forall { b =>
      recs.get(b.col) match {
        case None => true
        case Some((_, "", _)) | Some((_, _, "")) =>
          // all-null column: no non-null value can satisfy any comparison
          false
        case Some((kind, mn, mx)) =>
          def minCmp(v: Any) = cmp(kind, mn, v) // sign of (min - v)
          def maxCmp(v: Any) = cmp(kind, mx, v) // sign of (max - v)
          def mayEqual(v: Any): Boolean =
            (minCmp(v), maxCmp(v)) match {
              case (Some(a), Some(c)) => a <= 0 && c >= 0 // min <= v <= max
              case _ => true
            }
          b.op match {
            case "=" => b.values.headOption.forall(mayEqual)
            case "in" => b.values.isEmpty || b.values.exists(mayEqual)
            case ">" => b.values.headOption.forall(v => maxCmp(v).forall(_ > 0))
            case ">=" => b.values.headOption.forall(v => maxCmp(v).forall(_ >= 0))
            case "<" => b.values.headOption.forall(v => minCmp(v).forall(_ < 0))
            case "<=" => b.values.headOption.forall(v => minCmp(v).forall(_ <= 0))
            case _ => true
          }
      }
    }
  }

  /** Merge per-file stats of files being rewritten into one (compaction): a column
    * survives only if EVERY input carries a record for it (any unknown input makes
    * the merged bound unknown); all-null inputs widen nothing; a mix of all-null
    * and valued inputs keeps the valued bounds.
    */
  /** Encoded-bound order within one kind (shared by merge and fromFooter). */
  private def ltEnc(kind: Char)(a: String, b: String): Boolean = kind match {
    case 'l' => a.toLong < b.toLong
    case 'd' => a.toDouble < b.toDouble
    case _ => UTF8String.fromString(unb64(a)).compareTo(UTF8String.fromString(unb64(b))) < 0
  }

  def merge(statsList: Seq[String], fields: Seq[(String, DataType)]): String = {
    if (statsList.isEmpty || statsList.exists(_.isEmpty)) return ""
    val parsed = statsList.map(parse)
    def lt(kind: Char)(a: String, b: String): Boolean = ltEnc(kind)(a, b)
    fields.flatMap { case (name, dt) =>
      kindOf(dt).flatMap { kind =>
        val recs = parsed.map(_.get(name))
        if (recs.exists(_.isEmpty)) None
        else {
          val present = recs.flatten.filter { case (_, mn, mx) => mn.nonEmpty && mx.nonEmpty }
          if (present.isEmpty) Some(s"$name$FieldSep$kind$FieldSep$FieldSep")
          else try {
            val mn = present.map(_._2).reduce((a, b) => if (lt(kind)(a, b)) a else b)
            val mx = present.map(_._3).reduce((a, b) => if (lt(kind)(a, b)) b else a)
            Some(s"$name$FieldSep$kind$FieldSep$mn$FieldSep$mx")
          } catch {
            // a malformed input bound makes the merged column UNKNOWN, never a crash
            case _: IllegalArgumentException => None
          }
        }
      }
    }.mkString(RecSep.toString)
  }

  /** Writer-side accumulator for ONE data file: tracks min/max per stat-able
    * column while rows stream through; O(stat-able columns) comparisons per row.
    * specs: (name, type, row ordinal) of the DATA columns being written.
    */
  final class Acc(specs: Array[(String, DataType, Int)]) {
    // only stat-able columns with separator-free names (a name carrying the
    // encoding's own separators could not round-trip)
    private val cols: Array[(String, Char, DataType, Int)] = specs.flatMap {
      case (name, dt, ord) =>
        if (name.indexOf(RecSep.toInt) >= 0 || name.indexOf(FieldSep.toInt) >= 0) None
        else kindOf(dt).map(k => (name, k, dt, ord))
    }
    private val n = cols.length
    private val valid = Array.fill(n)(true)
    private val hasVal = Array.fill(n)(false)
    private val minL, maxL = new Array[Long](n)
    private val minD, maxD = new Array[Double](n)
    private val minS, maxS = new Array[UTF8String](n)
    // exact per-file tallies (Iceberg record_count / null_value_counts): `rows`
    // becomes the manifest entry's row count, `nullCnt` each record's 5th field —
    // the metadata that lets COUNT/MIN/MAX answer without opening this file again
    private var nRows = 0L
    private val nullCnt = new Array[Long](n)

    /** Rows observed — the entry's exact record count. */
    def rows: Long = nRows

    def observe(row: InternalRow): Unit = {
      nRows += 1
      var i = 0
      while (i < n) {
        {
          val (_, kind, dt, ord) = cols(i)
          if (row.isNullAt(ord)) nullCnt(i) += 1
          else if (valid(i)) kind match {
            case 'l' =>
              val v = dt match {
                case IntegerType | DateType => row.getInt(ord).toLong
                case _ => row.getLong(ord)
              }
              if (!hasVal(i)) { minL(i) = v; maxL(i) = v; hasVal(i) = true }
              else { if (v < minL(i)) minL(i) = v; if (v > maxL(i)) maxL(i) = v }
            case 'd' =>
              val v = normZero(dt match {
                case FloatType => row.getFloat(ord).toDouble
                case _ => row.getDouble(ord)
              })
              if (v.isNaN) valid(i) = false // NaN breaks ordering: drop the column
              else if (!hasVal(i)) { minD(i) = v; maxD(i) = v; hasVal(i) = true }
              else { if (v < minD(i)) minD(i) = v; if (v > maxD(i)) maxD(i) = v }
            case 's' =>
              val v = row.getUTF8String(ord)
              if (v.numChars() > MaxStringStat) valid(i) = false // no truncated bounds
              else if (!hasVal(i)) {
                // row buffers are reused; stored bounds must own their bytes — but
                // clone only when a bound actually updates, not once per row
                val copy = v.clone()
                minS(i) = copy; maxS(i) = copy; hasVal(i) = true
              } else {
                if (v.compareTo(minS(i)) < 0) minS(i) = v.clone()
                if (v.compareTo(maxS(i)) > 0) maxS(i) = v.clone()
              }
            case _ => ()
          }
        }
        i += 1
      }
    }

    def encode(): String =
      (0 until n).map { i =>
        val (name, kind, _, _) = cols(i)
        // every record carries the exact null count; bounds are exact values
        // ('?' when unusable: a NaN or over-long string was seen, '' when all-null)
        val (mn, mx) =
          if (!valid(i)) ("?", "?")
          else if (!hasVal(i)) ("", "") // all-null
          else kind match {
            case 'l' => (minL(i).toString, maxL(i).toString)
            case 'd' => (minD(i).toString, maxD(i).toString)
            case _ => (b64(minS(i).toString), b64(maxS(i).toString))
          }
        s"$name$FieldSep$kind$FieldSep$mn$FieldSep$mx$FieldSep${nullCnt(i)}"
      }.mkString(RecSep.toString)
  }
}
