package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FM-Index shard tables as a DSv2 manifest table with FINGERPRINT PRUNING AT THE
  * SOURCE — the SURVEY §4 item that lifts the q26 optimizer-rule guard
  * (graft.functions.FmFingerprintPruning) into the scan itself:
  *
  *  - `publish` writes a shard DataFrame (the DocShards/TranscriptPipeline layout:
  *    `shard` binary + `alpha_fp` array<bigint> + ids/offsets) through the manifest
  *    DSv2 write path, partitioned by (shard_id:int, alpha_hex:string) where
  *    alpha_hex is the shard's 1024-bit char-presence fingerprint rendered to hex BY
  *    CATALYST (transform + hex + lpad — no UDF). The fingerprint thereby becomes
  *    table METADATA: it lives in the manifest's partition values, not just in rows;
  *  - `readPruned(dir, pattern)` resolves, ON THE DRIVER and in O(numShards)
  *    manifest entries, which fingerprints can possibly contain the pattern
  *    (AlphaFingerprint.mayContain — false proves fm_count == 0 for every document
  *    of that shard), and reads the table with an In-filter on alpha_hex that the
  *    manifest scan prunes to whole FILES. A pruned shard's parquet footer is never
  *    opened and its multi-MB `shard` bytes are never deserialized — and unlike the
  *    optimizer rule (which needs the Filter directly over the scan to survive
  *    column pruning; see q26's comment), this holds under EVERY downstream plan
  *    shape because the pruning is sealed into the scan's file list at plan time.
  *
  * The reference's unknown-symbol short-circuit (fm/FmIndex.java:457-459), promoted
  * from expression level (q26's rule) to storage level — the same ladder Iceberg
  * climbs from row filters to partition-value file skipping.
  */
object ShardIndexTable {

  /** Bump on ANY change to the published layout (shard build parameters, fingerprint
    * encoding, partition spec) — cached published tables key on it.
    */
  val LayoutVersion = 1

  // the 256-hex-char fingerprint rides in TWO partition columns of 128 chars each: a
  // single Hive dir component `alpha_hex=<256 chars>` would exceed the 255-byte
  // filesystem component limit
  val HexCols: Seq[String] = Seq("alpha_hex0", "alpha_hex1")

  /** Hex of half the 16-long fingerprint, zero-padded per word — pure Catalyst. */
  private def alphaHex(half: Int): org.apache.spark.sql.Column =
    concat_ws("", transform(slice(col("alpha_fp"), 1 + 8 * half, 8), x => lpad(hex(x), 16, "0")))

  /** Publishes the shard table (idempotent per dir: an existing committed snapshot is
    * kept — shard builds are deterministic for a given corpus + shard count).
    */
  def publish(shards: DataFrame, dir: String): Unit = {
    if (ManifestTables.latestSnapshotId(dir).isDefined) return
    shards.withColumn(HexCols(0), alphaHex(0)).withColumn(HexCols(1), alphaHex(1))
      .write.format(classOf[ManifestDataSource].getName)
      .option("partcol", s"shard_id,${HexCols.mkString(",")}")
      .mode("overwrite").save(dir)
  }

  private def parseHex(hex: String): Array[Long] = {
    require(hex.length == 256, s"fingerprint must be 256 hex chars, got ${hex.length}")
    Array.tabulate(16)(i => java.lang.Long.parseUnsignedLong(hex.substring(16 * i, 16 * i + 16), 16))
  }

  /** The 16-long fingerprint of one entry's split hex partition values — the
    * per-entry decode the scan's fm_count pruning tests against its own pinned
    * snapshot (ManifestDataScan.fmAllowed).
    */
  private[sources] def parseHexPair(h0: String, h1: String): Array[Long] =
    parseHex(h0 + h1)

  /** Distinct (alpha_hex0, alpha_hex1) pairs of one PINNED snapshot whose
    * fingerprint MAY contain `pattern` (used by readPruned; the V2-predicate path
    * prunes per-entry inside the scan instead).
    */
  private[sources] def passingHexPairs(dir: String, pattern: String,
      snapshot: Option[Int] = None): Seq[(String, String)] =
    ManifestTables.readSnapshot(dir, snapshot)
      .map { e =>
        val vals = ManifestDataSource.splitPartValues(e.partition, 3)
        (vals(1), vals(2))
      }
      .distinct
      .filter { case (h0, h1) =>
        graft.functions.AlphaFingerprint.mayContain(parseHex(h0 + h1), pattern) }

  /** True when a manifest table carries the published shard layout (the fingerprint
    * partition columns) — the precondition for pattern pruning at the scan.
    */
  private[sources] def isShardLayout(partCols: Seq[ManifestTables.PartCol]): Boolean =
    HexCols.forall(h => partCols.exists(_.name == h))

  /** The shard rows whose fingerprint MAY contain `pattern`, served through the
    * manifest data table with non-candidates pruned at the FILE level. Shards a
    * pattern provably cannot match cost zero I/O.
    */
  def readPruned(s: SparkSession, dir: String, pattern: String): DataFrame = {
    // pin ONE snapshot for both the passing-pair resolution and the scan — two
    // independent 'latest' reads could straddle a concurrent commit, pruning a
    // file the scanned snapshot serves (the pruning must be a pure I/O win)
    val snap = ManifestTables.latestSnapshotId(dir).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot under $dir"))
    val passing = passingHexPairs(dir, pattern, Some(snap))
    val df = s.read.format(classOf[ManifestDataSource].getName)
      .option("snapshot", snap.toString).load(dir)
    if (passing.isEmpty) df.where(lit(false)) // folds to an empty relation — no scan
    else
      // per-column In pushdown prunes files at the manifest; cross-pairings of the
      // two halves are a conservative superset, and fm_count re-checks rows anyway
      df.filter(col(HexCols(0)).isin(passing.map(_._1).distinct: _*) &&
        col(HexCols(1)).isin(passing.map(_._2).distinct: _*))
  }
}
