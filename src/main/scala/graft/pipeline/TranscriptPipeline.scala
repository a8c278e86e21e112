package graft.pipeline

import graft.core.{FmIndex, FmIndexBuilder}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.sql.Timestamp
import scala.collection.mutable

/** One FM-Index shard: the compressed index + per-turn metadata for one deterministic
  * partition of the transcript table. The shard's corpus is the concatenation of its
  * turns' texts joined by a single separator; `offsets`/`lens` map corpus
  * positions back to turns. The shard replaces the raw text downstream — routed rows
  * rematerialize their text via FM extract.
  */
case class ShardRow(
    shard_id: Int,
    shard_seq: Int,
    shard: Array[Byte],
    n_turns: Int,
    corpus_chars: Long,
    alphabet: Int,
    alpha_bits: Array[Long], // 1024-bit char-presence fingerprint (char & 1023)
    checksum: Long,
    conv_ids: Array[String],
    turn_idxs: Array[Int],
    roles: Array[String],
    tools: Array[String],
    ts_micros: Array[Long],
    offsets: Array[Int],
    lens: Array[Int]
)

/** A turn routed to a sink, with its text reconstructed from the shard (not carried
  * through from the input) — per-turn text equality is therefore exercised on every row.
  */
case class RoutedHit(
    sink: String,
    conv_id: String,
    turn_idx: Int,
    role: String,
    tool: String,
    ts: Timestamp,
    n_matches: Int,
    text: String,
    shard_id: Int
)

/** Internal: a Turn with its deterministic shard assignment (encoders need this public). */
case class TurnWithShard(
    conv_id: String, turn_idx: Int, role: String, text: String, tool: String,
    ts: Timestamp, shard_id: Int)

object TsMicros {
  /** java.sql.Timestamp <-> epoch micros, preserving sub-millisecond precision. */
  def toMicros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  def toTimestamp(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
}

/** Parse -> index -> route -> aggregate over transcript tables, Spark-first.
  *
  * Scale design (targets a 1000-executor cluster; tested on local[N]):
  *  - shard assignment is a PURE FUNCTION of the row: shard_id =
  *    pmod(hash(conv_id, floor(turn_idx / saltBlock)), numShards). The salt block splits
  *    skewed conversations across shards while keeping runs of consecutive turns together;
  *    determinism makes resume-by-shard safe regardless of cluster size or task retries.
  *  - exactly ONE shuffle colocates turns into shards (repartition on shard_id), then
  *    sortWithinPartitions streams through Spark's spill-safe external sort; shard
  *    construction is a single mapPartitions pass with run-detection on shard_id — no
  *    per-group in-memory regrouping beyond one shard's corpus (capped by maxCorpusChars).
  *  - routing deserializes each shard once and evaluates all broadcast patterns against
  *    it (mapPartitions); per-(sink, conv) aggregation is a classic partial+final agg
  *    handled by Catalyst.
  *  - enrichment joins are broadcast hash joins (dimensions are tiny by design).
  *  - lineage rows + a JSON manifest make the job resumable: committed shard_ids are
  *    skipped on re-run, so a killed job continues without recount drift.
  */
object TranscriptPipeline {

  case class Config(
      numShards: Int = 64,
      saltBlock: Int = 4096,
      sampleRate: Int = 16,
      maxCorpusChars: Int = 1 << 27, // split shards beyond 128M chars (int positions cap)
      rules: Seq[SinkRule] = Transcripts.DefaultRules,
      numPartitionsOpt: Option[Int] = None,
      // NoCompression | CompressAll (RRR everywhere, size over speed) | CompressWavelet
      // (RRR wavelet nodes + Rank9 locate-path sample marks — the mixed middle ground)
      compression: graft.core.FmIndex.Compression = graft.core.FmIndex.NoCompression,
      waveletEngine: graft.core.FmIndex.WaveletEngine = graft.core.FmIndex.Huffman
        // Fbb: per-block boosting — smallest + fastest count on repetitive log text
  ) {
    /** Task partitions for the shard-build shuffle. Keep numShards >= 4x numPartitions:
      * shard_ids hash into partitions, so several shards per partition smooth the
      * Poisson imbalance of the shard_id -> partition assignment.
      */
    def numPartitions: Int = numPartitionsOpt.getOrElse(math.max(1, numShards / 4))
  }

  val Separator = '\n'

  /** Deterministic shard id column. */
  def shardIdCol(cfg: Config) =
    pmod(hash(col("conv_id"), floor(col("turn_idx") / cfg.saltBlock)), lit(cfg.numShards))
      .cast("int")

  // ------------------------------------------------------------------ index stage

  /** For each target partition p of an n-way hash exchange, an int whose Murmur3
    * hash lands exactly in p (pmod(hash(x, 42), n) == p) — lets a DataFrame
    * repartition place keys in chosen partitions deterministically while staying
    * a Tungsten hash exchange (an RDD custom partitioner would shuffle through
    * the closure serializer). Driver-side search, ~n probes total, memoized.
    */
  private val hashKeyCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Int]]()
  private[pipeline] def hashKeysFor(n: Int): Array[Int] =
    hashKeyCache.computeIfAbsent(n, _ => {
      val keys = new Array[Int](n)
      val found = new Array[Boolean](n)
      var remaining = n
      var x = 0
      while (remaining > 0) {
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(x, 42)
        val p = ((h % n) + n) % n
        if (!found(p)) { found(p) = true; keys(p) = x; remaining -= 1 }
        x += 1
      }
      keys
    })

  def buildShards(spark: SparkSession, turns: Dataset[Turn], cfg: Config): Dataset[ShardRow] = {
    import spark.implicits._
    // CONTIGUOUS shard blocks instead of hashing shard_id into partitions: with
    // numShards/numPartitions ~4, Poisson hash placement gives some partitions
    // 0 shards and others 8+ (measured 3.3x max/median task skew in the build
    // stage — the last wave idles most cores); block p = shard * parts / shards
    // puts exactly ceil(shards/parts) shards in every task. The block id maps
    // through hashKeysFor so the exchange is still a plain Tungsten hash
    // repartition; all rows of one shard still land in exactly one partition.
    val parts = cfg.numPartitions
    val blockKeys = hashKeysFor(parts)
    val blockKey = element_at(lit(blockKeys),
      expr(s"int((CAST(shard_id AS BIGINT) * $parts) DIV ${cfg.numShards})") + 1)
    turns
      .withColumn("shard_id", shardIdCol(cfg))
      .repartition(parts, blockKey)
      .sortWithinPartitions(col("shard_id"), col("conv_id"), col("turn_idx"))
      .as[TurnWithShard]
      .mapPartitions { it =>
        val buf = it.buffered
        // each next() consumes one shard piece: a run of equal shard_id, split when the
        // corpus cap is reached (int positions bound the shard corpus size)
        new Iterator[ShardRow] {
          private var curShard = Int.MinValue
          private var curSeq = 0

          override def hasNext: Boolean = buf.hasNext

          override def next(): ShardRow = {
            val shardId = buf.head.shard_id
            if (shardId != curShard) { curShard = shardId; curSeq = 0 }
            val sb = new java.lang.StringBuilder
            val convIds = mutable.ArrayBuffer[String]()
            val turnIdxs = mutable.ArrayBuffer[Int]()
            val roles = mutable.ArrayBuffer[String]()
            val tools = mutable.ArrayBuffer[String]()
            val tsMicros = mutable.ArrayBuffer[Long]()
            val offsets = mutable.ArrayBuffer[Int]()
            val lens = mutable.ArrayBuffer[Int]()
            var checksum = 0L
            while (buf.hasNext && buf.head.shard_id == shardId && sb.length < cfg.maxCorpusChars) {
              val t = buf.next()
              if (sb.length > 0) sb.append(Separator)
              offsets += sb.length
              lens += t.text.length
              sb.append(t.text)
              convIds += t.conv_id; turnIdxs += t.turn_idx; roles += t.role
              tools += t.tool; tsMicros += TsMicros.toMicros(t.ts)
              checksum += t.conv_id.hashCode.toLong * 31L + t.turn_idx
            }
            val corpus = new Array[Char](sb.length)
            sb.getChars(0, sb.length, corpus, 0)
            val fm = new FmIndexBuilder().setSampleRate(cfg.sampleRate)
              .setCompressionMode(cfg.compression)
              .setWaveletEngine(cfg.waveletEngine).build(corpus)
            // char-presence fingerprint: the distributed analog of the reference's
            // unknown-symbol short-circuit (FmIndex.java:457-459) lifted to shard
            // granularity — routing skips shards that cannot contain a pattern's chars
            val alphaBits = graft.functions.AlphaFingerprint.build(corpus)
            val row = ShardRow(shardId, curSeq, fm.serialize(), convIds.length,
              corpus.length.toLong, fm.getAlphabetLength, alphaBits, checksum,
              convIds.toArray, turnIdxs.toArray, roles.toArray, tools.toArray,
              tsMicros.toArray, offsets.toArray, lens.toArray)
            curSeq += 1
            row
          }
        }
      }
  }

  // ------------------------------------------------------------------ route stage

  /** Evaluates every routing rule against every shard; emits one row per (sink, turn)
    * with the overlapping-match count and the turn text RECONSTRUCTED via FM extract.
    * A match is attributed to the turn containing its start position.
    */
  /** True iff every char of `pattern` is present in the shard's fingerprint
    * (delegates to the shared kernel so builder and test can never drift).
    */
  def mayContain(alphaBits: Array[Long], pattern: String): Boolean =
    graft.functions.AlphaFingerprint.mayContain(alphaBits, pattern)

  /** `locateCap` guards against pathological high-frequency patterns: locateAll costs
    * O(occurrences x sampleRate) LF-walks, which for a pattern matching a large fraction
    * of the corpus exceeds the cost of simply scanning the turns. Above the cap, routing
    * falls back to extracting each turn once (O(corpus), bounded) and counting
    * overlapping occurrences directly — identical output, bounded worst case.
    */
  def route(spark: SparkSession, shards: Dataset[ShardRow], rules: Seq[SinkRule],
      locateCap: Int = 1 << 22): Dataset[RoutedHit] = {
    import spark.implicits._
    val bRules = spark.sparkContext.broadcast(rules.toArray)
    shards.flatMap { s =>
      lazy val fm = FmIndex.deserialize(s.shard)
      val textCache = mutable.HashMap[Int, String]()
      def turnText(t: Int): String =
        textCache.getOrElseUpdate(t, fm.extractString(s.offsets(t), s.offsets(t) + s.lens(t)))

      def hit(turn: Int, n: Int, sink: String): RoutedHit =
        RoutedHit(sink, s.conv_ids(turn), s.turn_idxs(turn), s.roles(turn),
          s.tools(turn), TsMicros.toTimestamp(s.ts_micros(turn)), n, turnText(turn), s.shard_id)

      bRules.value.iterator.flatMap { rule =>
        if (!mayContain(s.alpha_bits, rule.pattern)) Iterator.empty
        else {
          // count first: one O(|pattern|) backward search decides the strategy
          val total = fm.count(rule.pattern.toCharArray)
          if (total == 0) Iterator.empty
          else if (total <= locateCap) {
            val positions = fm.locateAll(rule.pattern.toCharArray)
            // merge-walk sorted positions against sorted turn offsets
            val perTurn = mutable.LinkedHashMap[Int, Int]()
            var t = 0
            positions.foreach { pos =>
              while (t + 1 < s.offsets.length && s.offsets(t + 1) <= pos) t += 1
              perTurn.updateWith(t) { c => Some(c.getOrElse(0) + 1) }
            }
            perTurn.iterator.map { case (turn, n) => hit(turn, n, rule.sink) }
          } else {
            // scan fallback: overlapping occurrences per turn on the extracted text
            (0 until s.n_turns).iterator.flatMap { turn =>
              val text = turnText(turn)
              var n = 0
              var i = text.indexOf(rule.pattern)
              while (i >= 0) { n += 1; i = text.indexOf(rule.pattern, i + 1) }
              if (n == 0) Iterator.empty else Iterator.single(hit(turn, n, rule.sink))
            }
          }
        }
      }
    }
  }

  /** Persists the shard table (the compressed index REPLACES the raw text downstream);
    * route/aggregate jobs re-run from here without rebuilding.
    */
  def writeShardTable(shards: Dataset[ShardRow], dir: String): Unit =
    shards.write.mode("overwrite").parquet(dir)

  def readShardTable(spark: SparkSession, dir: String): Dataset[ShardRow] = {
    import spark.implicits._
    spark.read.parquet(dir).as[ShardRow]
  }

  // -------------------------------------------------------------- aggregate stage

  /** Per-(sink, conversation) aggregate counts, ordered by (conv_id). */
  def conversationAggregates(routed: DataFrame): DataFrame =
    routed
      .groupBy(col("sink"), col("conv_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(col("n_matches")).as("n_matches"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts")
      )
      .orderBy(col("sink"), col("conv_id"))

  /** Windowed per-conversation running stats ordered by (conv_id, turn_idx). */
  def runningWindow(routed: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("sink"), col("conv_id")).orderBy(col("turn_idx"))
    routed
      // project BEFORE the window: the sort must not drag the text payload through
      .select("sink", "conv_id", "turn_idx", "n_matches")
      .withColumn("hit_rank", row_number().over(w))
      .withColumn("running_matches",
        sum(col("n_matches")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("sink", "conv_id", "turn_idx", "hit_rank", "running_matches", "n_matches")
  }

  /** Broadcast enrichment with role/tool dimensions. */
  def enrich(spark: SparkSession, routed: Dataset[RoutedHit]): DataFrame =
    routed
      .join(broadcast(Transcripts.roleLookup(spark)), Seq("role"), "left")
      .join(broadcast(Transcripts.toolLookup(spark)), Seq("tool"), "left")

  // ----------------------------------------------------------------- full job + resume

  case class RunReport(shardsBuilt: Long, turnsIndexed: Long, rowsRouted: Long, resumed: Boolean)

  /** Commit protocol (an Iceberg-snapshot pattern on plain parquet; no table format in
    * this sandbox). The LINEAGE PARQUET is the source of truth for what is committed:
    *
    *  1. run start: write `_manifests/start-K` (K = number of existing start markers) —
    *     attempt ids are unique even across crashed runs, so a crashed attempt's orphan
    *     sink rows can never be adopted by a later commit.
    *  2. append sink rows under `sinks/sink=S/attempt=K/`.
    *  3. append lineage rows (one per shard piece) with attempt=K.
    *  4. atomically create `_manifests/commit-K` (write temp + ATOMIC_MOVE). Only now is
    *     attempt K committed.
    *
    * Readers (`readSinks`, resume) only trust attempts with a commit marker, so a crash
    * in any window (after the sink append, or mid-lineage-write) leaves orphan files
    * that are simply never read — no duplicated rows, no recount drift. Resume derives
    * committed shard_ids from the lineage parquet and ANTI-JOINS pending turns against
    * them (scales to millions of shards; no driver-side id list, no giant `isin` tree).
    */
  private def manifestPath(outDir: String) = Paths.get(outDir, "_manifests")

  private def listMarkers(outDir: String, prefix: String): Set[Int] = {
    val dir = manifestPath(outDir)
    if (!Files.isDirectory(dir)) return Set.empty
    val s = Files.list(dir)
    try s.toArray.map(_.toString.split('/').last)
      .filter(_.startsWith(prefix)).map(_.stripPrefix(prefix).toInt).toSet
    finally s.close()
  }

  private def writeMarker(outDir: String, name: String, body: String): Unit = {
    val dir = manifestPath(outDir)
    Files.createDirectories(dir)
    val tmp = dir.resolve(name + ".tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, dir.resolve(name), java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def committedAttempts(outDir: String): Set[Int] = listMarkers(outDir, "commit-")

  /** Committed sink rows only (attempts with a commit marker); `attempt` is dropped —
    * it is commit bookkeeping, not data. Partition pruning keeps orphan files unread.
    */
  def readSinks(spark: SparkSession, outDir: String): DataFrame = {
    val committed = committedAttempts(outDir)
    spark.read.parquet(s"$outDir/sinks")
      .filter(col("attempt").isInCollection(committed.toSeq))
      .drop("attempt")
  }

  /** Runs parse->index->route->aggregate, writing per-sink tables, aggregates and lineage
    * under `outDir`. If committed attempts exist, their shards are skipped (resume).
    */
  def runToSinks(spark: SparkSession, turns: Dataset[Turn], cfg: Config, outDir: String): RunReport = {
    import spark.implicits._
    val dbg = sys.env.contains("SPARK_GRAFT_PIPE_DEBUG")
    var t0 = System.nanoTime()
    def mark(name: String): Unit = if (dbg) {
      val now = System.nanoTime()
      System.err.println(f"[pipe] $name%-24s ${(now - t0) / 1e9}%7.2f s")
      t0 = now
    }
    val committed = committedAttempts(outDir)
    val resumed = committed.nonEmpty
    val attempt = (listMarkers(outDir, "start-") ++ committed + (-1)).max + 1
    writeMarker(outDir, s"start-$attempt", s"""{"attempt": $attempt}""")

    val pendingTurns =
      if (!resumed) turns
      else {
        // lineage parquet = committed shard ids; anti-join scales to any shard count
        val committedIds = spark.read.parquet(s"$outDir/lineage")
          .filter(col("attempt").isInCollection(committed.toSeq))
          .select(col("shard_id").as("__cid")).distinct()
        turns.withColumn("__sid", shardIdCol(cfg))
          .join(committedIds, col("__sid") === col("__cid"), "left_anti")
          .drop("__sid").as[Turn]
      }

    val shards = buildShards(spark, pendingTurns, cfg).persist()
    // route output is NOT cached: its only full-width consumer is the sinks write.
    // Every later job (lineage counts, aggregates, window) re-reads this attempt's
    // rows COLUMN-PRUNED from the parquet just written — task metrics showed the
    // three cache scans of the text-heavy routed rows cost ~36 s of CPU at the
    // bench corpus vs ~5 s for pruned parquet reads, plus the cache write itself
    // disappears from the critical sinks job.
    val routed = route(spark, shards, cfg.rules)

    val enriched = enrich(spark, routed).withColumn("attempt", lit(attempt))
    // cluster-width tasks before the dynamic-partition write: output file count
    // (and the driver-serial commit) tracks the cluster, not the shard count.
    // Hash keys, not round-robin: keyless repartition(n) first pays a local sort
    // of its full input (sort-before-repartition, for retry determinism) — on
    // these text-heavy rows that sort was pure overhead, and deterministic keys
    // give the same retry safety for free. (conv_id, turn_idx) hashes uniformly.
    // committer v2 (direct task commit, no serial driver-side rename pass) is safe
    // for sinks + lineage ONLY because visibility is governed by the attempt
    // markers, not the parquet committer: readers never trust an attempt without
    // its commit marker, so a crash mid-write strands invisible files exactly as
    // before. aggregates/window (marker-less overwrite outputs) keep the default
    // committer.
    val directCommit = Map("mapreduce.fileoutputcommitter.algorithm.version" -> "2")
    // concurrent writers instead of the dynamic-partition sort: FileFormatWriter
    // otherwise SORTS every task's rows by (sink, attempt) before writing — a full
    // pass over the text-heavy payload to order at most |rules|+1 distinct keys.
    // With enough concurrent writers the sort is skipped and each task streams
    // rows to its (few) open sink files. Session conf, so save/restore around the
    // write (runToSinks shares sessions with catalog queries under Verify).
    val writersKey = "spark.sql.maxConcurrentOutputFileWriters"
    val prevWriters = spark.conf.getOption(writersKey)
    spark.conf.set(writersKey, math.max(8, cfg.rules.length + 2).toString)
    try enriched.repartition(spark.sparkContext.defaultParallelism,
        col("conv_id"), col("turn_idx"))
      .write.options(directCommit)
      .mode("append").partitionBy("sink", "attempt").parquet(s"$outDir/sinks")
    finally prevWriters match {
      case Some(v) => spark.conf.set(writersKey, v)
      case None => spark.conf.unset(writersKey)
    }
    mark("sinks write")

    // this attempt's rows, re-read from the files just written (pruned to the
    // columns each consumer needs; never consults commit markers, so it serves
    // both paths' lineage counts and the fresh path's aggregates)
    val attemptRows = spark.read.parquet(s"$outDir/sinks")
      .filter(col("attempt") === attempt).drop("attempt")

    // lineage is written BY SPARK (no driver collect of per-shard rows) and appended,
    // then the attempt is committed with one atomic marker
    val routedCounts = attemptRows.groupBy(col("shard_id")).agg(count(lit(1)).as("__rr"))
    val lineageDf = shards
      .select(col("shard_id"), col("shard_seq"), col("n_turns").cast("long").as("n_turns"),
        col("corpus_chars"), col("alphabet"), col("checksum"))
      .join(routedCounts, Seq("shard_id"), "left")
      .select(col("shard_id"), col("shard_seq"), col("n_turns"), col("corpus_chars"),
        col("alphabet"), col("checksum"),
        // attribute routed rows to the first piece of a split shard (counts are per
        // shard_id; duplicating them across seq pieces would double-count)
        when(col("shard_seq") === 0, coalesce(col("__rr"), lit(0L)))
          .otherwise(lit(0L)).as("rows_routed"),
        lit(attempt).as("attempt"))
    // aggregates must cover ALL committed data: a fresh run aggregates the in-memory
    // routed rows directly; a resumed run re-reads the committed sinks so the final
    // output converges to exactly the single-run result (no recount drift).
    // The three derived outputs (lineage, aggregates, window) all read the
    // persisted shards/routed frames and are mutually independent, so in the
    // FRESH path they run as concurrent Spark jobs (tail back-fill) — the commit
    // marker still lands strictly after the lineage write. The RESUMED path stays
    // sequential: its aggSource (readSinks) must observe THIS attempt's marker.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    def startAggJobs(src: DataFrame): (Future[Unit], Future[Unit]) = (
      Future {
        conversationAggregates(src).write.mode("overwrite").parquet(s"$outDir/aggregates")
      },
      Future {
        runningWindow(src).write.mode("overwrite").parquet(s"$outDir/window")
      })
    val freshJobs = if (resumed) None else Some(startAggJobs(attemptRows))
    lineageDf.write.options(directCommit).mode("append").parquet(s"$outDir/lineage")
    mark("lineage write")
    writeMarker(outDir, s"commit-$attempt", s"""{"attempt": $attempt, "committed": true}""")
    // report totals for THIS attempt from its lineage (one tiny aggregate, no row
    // collect) — submitted concurrently with the aggregate/window jobs above
    val fStats = Future {
      spark.read.parquet(s"$outDir/lineage")
        .filter(col("attempt") === attempt)
        .agg(count(lit(1)), coalesce(sum("n_turns"), lit(0L)),
          coalesce(sum("rows_routed"), lit(0L)))
        .first()
    }
    val (fAgg, fWin) = freshJobs.getOrElse(startAggJobs(readSinks(spark, outDir)))
    Await.result(fAgg, Duration.Inf)
    Await.result(fWin, Duration.Inf)
    val stats = Await.result(fStats, Duration.Inf)
    mark("agg+window")
    shards.unpersist()
    RunReport(stats.getLong(0), stats.getLong(1), stats.getLong(2), resumed)
  }
}
