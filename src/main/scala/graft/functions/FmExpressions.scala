package graft.functions

import graft.core.FmIndex
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Generator, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Per-executor cache of deserialized FM-Index shards, keyed by content hash. Rows of a
  * shard table repeat the same shard bytes across expression invocations; deserializing
  * per row would dominate. Small LRU — shard tables are scanned shard-run-at-a-time.
  */
private[graft] object ShardCache {
  private val MaxEntries = 8

  /** 128-bit MD5 content key. A weak key (e.g. Arrays.hashCode) would let two distinct
    * shards silently alias to one index — a wrong-answer hazard once shard tables are
    * large. MD5 over the full bytes makes aliasing cryptographically impossible; the
    * hash cost (~0.5 GB/s) is amortized over a shard's whole run of rows by the LRU.
    */
  private final case class Key(hi: Long, lo: Long, len: Int)

  private val cache = new java.util.LinkedHashMap[Key, FmIndex](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[Key, FmIndex]): Boolean =
      size() > MaxEntries
  }

  private def keyOf(bytes: Array[Byte]): Key = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(bytes)
    val bb = java.nio.ByteBuffer.wrap(d)
    Key(bb.getLong, bb.getLong, bytes.length)
  }

  // Identity fast path in front of the digest: per-thread memo of the last byte array
  // REFERENCE served. Row batches that hand the same backing array per row (repeated
  // fm_* calls on one row, a future per-row usage over a repeated shard column) skip
  // the O(shard bytes) MD5 (~20 ms on a 10 MB shard). Guards:
  //  - the array is held through a WeakReference, so the memo never pins a multi-MB
  //    serialized shard per pooled task thread beyond the content-keyed LRU;
  //  - a 64-bit sample fingerprint (length + 8 spread positions) re-checks content,
  //    so a caller REUSING the same buffer with different bytes falls through to the
  //    full digest instead of being served the previous shard. The sample is a
  //    defense-in-depth tripwire, not cryptographic — callers must still treat
  //    handed-in arrays as immutable (every Spark row access path allocates fresh
  //    arrays, so this holds in the product);
  //  - ThreadLocal, so concurrent task threads never race.
  private final class LastRef {
    var bytes: java.lang.ref.WeakReference[Array[Byte]] = _
    var sample: Long = 0L
    var fm: FmIndex = _
  }
  private val last = ThreadLocal.withInitial[LastRef](() => new LastRef)

  private def sampleOf(bytes: Array[Byte]): Long = {
    var h = bytes.length.toLong * 0x9e3779b97f4a7c15L
    var i = 0
    while (i < 8) {
      // Long math: (len-1)*i overflows Int past ~306 MB (Int.MaxValue/7) — a dense
      // 128M-char shard's serialized form can approach that
      h = h * 31 + bytes((((bytes.length - 1).toLong * i) / 7).toInt)
      i += 1
    }
    h
  }

  def get(bytes: Array[Byte]): FmIndex = {
    if (bytes.length == 0) throw new IllegalArgumentException("empty shard bytes")
    val memo = last.get()
    if (memo.bytes != null && (memo.bytes.get eq bytes) && memo.sample == sampleOf(bytes))
      return memo.fm
    val key = keyOf(bytes)
    val fm = cache.synchronized {
      var hit = cache.get(key)
      if (hit == null) {
        hit = FmIndex.deserialize(bytes)
        cache.put(key, hit)
      }
      hit
    }
    memo.bytes = new java.lang.ref.WeakReference(bytes)
    memo.sample = sampleOf(bytes)
    memo.fm = fm
    fm
  }

  /** Test hook: number of distinct cached entries after a sequence of gets. */
  private[graft] def entryCount: Int = cache.synchronized(cache.size())
  private[graft] def clear(): Unit = cache.synchronized(cache.clear())
}

/** fm_count(shard BINARY, pattern STRING) -> INT: overlapping occurrences of the pattern
  * in the corpus indexed by the serialized shard. Catalyst scalar expression (evaluated
  * via CodegenFallback — the rank/select inner loop is opaque to codegen anyway).
  */
case class FmCount(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "fm_count"
  override protected def nullSafeEval(shard: Any, pattern: Any): Any = {
    val fm = ShardCache.get(shard.asInstanceOf[Array[Byte]])
    fm.count(pattern.asInstanceOf[UTF8String].toString.toCharArray)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** fm_extract(shard BINARY, start INT, stop INT) -> STRING: decompress the corpus slice
  * [start, stop) from the shard.
  */
case class FmExtract(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "fm_extract"
  override protected def nullSafeEval(shard: Any, start: Any, stop: Any): Any = {
    val fm = ShardCache.get(shard.asInstanceOf[Array[Byte]])
    UTF8String.fromString(fm.extractString(start.asInstanceOf[Int], stop.asInstanceOf[Int]))
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** fm_locate(shard BINARY, pattern STRING): GENERATOR (UDTF surface) producing one
  * `pos INT` row per overlapping occurrence of the pattern in the shard's corpus —
  * the Catalyst analog of the reference's locate
  * (/root/reference/indices/src/main/java/com/dynatrace/fm/FmIndex.java:487-552).
  * The analyzer's ExtractGenerators rule lifts it out of a Project into a Generate
  * node, so `SELECT fm_locate(shard, pattern)` explodes like posexplode does. Output
  * order within a shard is ascending position (locateAll sorts; the reference leaves
  * order unspecified and its tests sort).
  */
case class FmLocateGen(left: Expression, right: Expression)
    extends BinaryExpression with Generator with CodegenFallback {
  override def elementSchema: StructType =
    StructType(StructField("pos", IntegerType, nullable = false) :: Nil)
  override def prettyName: String = "fm_locate"
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val shard = left.eval(input)
    val pattern = right.eval(input)
    if (shard == null || pattern == null) Iterator.empty
    else {
      val fm = ShardCache.get(shard.asInstanceOf[Array[Byte]])
      fm.locateAll(pattern.asInstanceOf[UTF8String].toString.toCharArray)
        .iterator.map(p => InternalRow(p))
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Typed Aggregator: corpus redundancy n/r (total length over total equal-symbol runs),
  * the reference's BWT compressibility metric
  * (/root/reference/indices/src/main/java/com/dynatrace/encoding/BurrowsWheelerTransform.java:103-136)
  * lifted to a distributed aggregate over a text column.
  */
object RedundancyAggregator extends Aggregator[String, (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), text: String): (Long, Long) = {
    if (text.isEmpty) b
    else {
      var runs = 1L
      var i = 1
      while (i < text.length) {
        if (text.charAt(i) != text.charAt(i - 1)) runs += 1
        i += 1
      }
      (b._1 + text.length, b._2 + runs)
    }
  }
  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) = (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Long, Long)): Double = if (r._2 == 0) 0.0 else r._1.toDouble / r._2
  override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object FmFunctions {

  /** Column API (public surface): resolves through the function registry, so it works
    * with Spark 4's ColumnNode-based Column without private bridges.
    */
  def fm_count(shard: Column, pattern: Column): Column = {
    register(SparkSession.active)
    org.apache.spark.sql.functions.call_function("fm_count", shard, pattern)
  }

  def fm_extract(shard: Column, start: Column, stop: Column): Column = {
    register(SparkSession.active)
    org.apache.spark.sql.functions.call_function("fm_extract", shard, start, stop)
  }

  def redundancy(text: Column): Column =
    org.apache.spark.sql.functions.udaf(RedundancyAggregator).apply(text)

  /** Generator surface: SELECT fm_locate(shard, pattern) explodes into pos rows. */
  def fm_locate(shard: Column, pattern: Column): Column = {
    register(SparkSession.active)
    org.apache.spark.sql.functions.call_function("fm_locate", shard, pattern)
  }

  /** SQL registration: SELECT fm_count(shard, 'pattern') FROM shard_table. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fm_count", exprs => FmCount(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fm_extract", exprs => FmExtract(exprs(0), exprs(1), exprs(2)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fm_locate", exprs => FmLocateGen(exprs(0), exprs(1)), "scala_udf")
  }
}
