package graft.pipeline

import graft.core.FmIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end pipeline checks (the BASELINE.md invariants):
  *  - routed-row equality: FM-shard routing == Catalyst contains() oracle, per sink
  *  - per-turn text equality: FM extract of EVERY turn == the input text column
  *  - aggregate-count equality vs the oracle pipeline
  *  - grok parse round-trip: render raw lines -> regex parse -> original rows
  *  - resume: partial run + resumed run == single full run, no recount drift
  */
class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-pipeline-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("ERROR") }

  private lazy val turns = Transcripts.generate(spark, nConvs = 40, turnsPerConv = 25,
    skewConvs = 2, skewFactor = 20).cache()

  private val cfg = TranscriptPipeline.Config(numShards = 8, saltBlock = 16, sampleRate = 8)

  /** Catalyst-only oracle: route by substring containment on the raw input. */
  private def oracleRouted(rules: Seq[SinkRule]): DataFrame = {
    import spark.implicits._
    rules.map { r =>
      turns.filter(col("text").contains(r.pattern))
        .select(lit(r.sink).as("sink"), col("conv_id"), col("turn_idx"),
          col("role"), col("tool"), col("ts"), col("text"))
    }.reduce(_ unionAll _)
  }

  test("grok parse of rendered raw lines round-trips every field") {
    import spark.implicits._
    val raw = Transcripts.renderRawLines(turns)
    val parsed = Transcripts.parseRawLines(spark, raw)
    assert(parsed.count() == turns.count())
    // millisecond-precision ts survives the render/parse cycle
    val diff = parsed.exceptAll(turns).count() + turns.exceptAll(parsed).count()
    assert(diff == 0, "parsed rows differ from original rows")
  }

  test("FM-shard routing equals the Catalyst contains() oracle per sink") {
    val shards = TranscriptPipeline.buildShards(spark, turns, cfg).cache()
    val routed = TranscriptPipeline.route(spark, shards, cfg.rules)
      .select("sink", "conv_id", "turn_idx", "role", "tool", "ts", "text")
    val oracle = oracleRouted(cfg.rules)
    val missing = oracle.exceptAll(routed).count()
    val extra = routed.exceptAll(oracle).count()
    assert(missing == 0 && extra == 0, s"routing mismatch: missing=$missing extra=$extra")
    assert(routed.count() > 0, "routing should produce rows on the synthetic corpus")
    shards.unpersist()
  }

  test("FBB + RRR engine config routes identically (wavelet engine is a pure knob)") {
    val fbbCfg = cfg.copy(waveletEngine = graft.core.FmIndex.Fbb,
      compression = graft.core.FmIndex.CompressAll)
    val base = TranscriptPipeline.route(spark,
        TranscriptPipeline.buildShards(spark, turns, cfg), cfg.rules)
      .select("sink", "conv_id", "turn_idx", "text")
    val fbb = TranscriptPipeline.route(spark,
        TranscriptPipeline.buildShards(spark, turns, fbbCfg), fbbCfg.rules)
      .select("sink", "conv_id", "turn_idx", "text")
    assert(base.exceptAll(fbb).count() == 0 && fbb.exceptAll(base).count() == 0,
      "wavelet engine choice changed routing output")
  }

  test("per-turn text equality: extract of every turn equals the input text") {
    import spark.implicits._
    val shards = TranscriptPipeline.buildShards(spark, turns, cfg)
    val reconstructed = shards.flatMap { s =>
      val fm = FmIndex.deserialize(s.shard)
      (0 until s.n_turns).iterator.map { t =>
        (s.conv_ids(t), s.turn_idxs(t), fm.extractString(s.offsets(t), s.offsets(t) + s.lens(t)))
      }
    }.toDF("conv_id", "turn_idx", "text")
    val original = turns.select("conv_id", "turn_idx", "text")
    assert(reconstructed.count() == original.count())
    assert(reconstructed.exceptAll(original).count() == 0, "reconstructed text differs")
  }

  test("match counts equal the FM count() on each shard corpus and the oracle") {
    import spark.implicits._
    val shards = TranscriptPipeline.buildShards(spark, turns, cfg).cache()
    val pattern = "size="
    // per-shard FM count on the concatenated corpus == per-turn oracle sum (separator
    // is not part of any pattern so no cross-turn matches exist)
    val fmTotal = shards.map { s =>
      FmIndex.deserialize(s.shard).count(pattern.toCharArray).toLong
    }.reduce(_ + _)
    val oracleTotal = turns
      .select(sum(size(split(col("text"), java.util.regex.Pattern.quote(pattern), -1)) - 1))
      .first().getLong(0)
    assert(fmTotal == oracleTotal, s"fm=$fmTotal oracle=$oracleTotal")
    shards.unpersist()
  }

  test("skewed conversations are split across shards by the salt block") {
    import spark.implicits._
    val sid = TranscriptPipeline.shardIdCol(cfg)
    val perConvShards = turns.withColumn("sid", sid)
      .groupBy("conv_id").agg(countDistinct("sid").as("n"))
    val skewed = perConvShards.filter(col("conv_id") === "conv-00000000").first().getLong(1)
    assert(skewed > 1, s"skewed conversation should span multiple shards, got $skewed")
  }

  test("full run writes sinks/aggregates/lineage and a resumed run converges exactly") {
    import spark.implicits._
    val outFull = Files.createTempDirectory("graft_full").toString
    val outResume = Files.createTempDirectory("graft_resume").toString

    val r1 = TranscriptPipeline.runToSinks(spark, turns, cfg, outFull)
    assert(!r1.resumed && r1.shardsBuilt > 0 && r1.rowsRouted > 0)

    // simulate a killed job: first attempt only processed shards 0..3
    val half = turns.withColumn("sid", TranscriptPipeline.shardIdCol(cfg))
      .filter(col("sid") < 4).drop("sid").as[Turn]
    val p1 = TranscriptPipeline.runToSinks(spark, half, cfg, outResume)
    assert(!p1.resumed)
    val p2 = TranscriptPipeline.runToSinks(spark, turns, cfg, outResume)
    assert(p2.resumed, "second run must resume from the committed lineage")

    val sinksFull = TranscriptPipeline.readSinks(spark, outFull)
    val sinksRes = TranscriptPipeline.readSinks(spark, outResume)
    assert(sinksFull.exceptAll(sinksRes).count() == 0 &&
      sinksRes.exceptAll(sinksFull).count() == 0, "resumed sinks differ from single-run sinks")

    val aggFull = spark.read.parquet(s"$outFull/aggregates")
    val aggRes = spark.read.parquet(s"$outResume/aggregates")
    assert(aggFull.exceptAll(aggRes).count() == 0 && aggRes.exceptAll(aggFull).count() == 0)

    val lineage = spark.read.parquet(s"$outFull/lineage")
    assert(lineage.count() == r1.shardsBuilt)
    assert(lineage.agg(sum("n_turns")).first().getLong(0) == turns.count())
  }

  test("crash before the commit marker never duplicates sink rows (crash-atomic resume)") {
    import spark.implicits._
    val outFull = Files.createTempDirectory("graft_atomic_full").toString
    val out = Files.createTempDirectory("graft_atomic").toString
    TranscriptPipeline.runToSinks(spark, turns, cfg, outFull)

    // attempt 0: only shards 0..3 commit cleanly
    val half = turns.withColumn("sid", TranscriptPipeline.shardIdCol(cfg))
      .filter(col("sid") < 4).drop("sid").as[Turn]
    TranscriptPipeline.runToSinks(spark, half, cfg, out)

    // attempt 1 "crashes" after appending sinks + lineage but BEFORE the commit marker:
    // run it fully, then delete the marker — the on-disk state is exactly the crash window
    TranscriptPipeline.runToSinks(spark, turns, cfg, out)
    val marker = java.nio.file.Paths.get(out, "_manifests", "commit-1")
    assert(Files.deleteIfExists(marker), "expected commit-1 marker to exist")

    // readers must not see the orphaned attempt
    val committedOnly = TranscriptPipeline.readSinks(spark, out)
    val attempt0 = spark.read.parquet(s"$out/sinks").filter(col("attempt") === 0).drop("attempt")
    assert(committedOnly.exceptAll(attempt0).count() == 0 &&
      attempt0.exceptAll(committedOnly).count() == 0, "orphan attempt rows leaked to readers")

    // the re-run takes a FRESH attempt id (orphan rows can never be adopted) and the
    // final committed view equals the single-run result exactly — no duplicated rows
    val r = TranscriptPipeline.runToSinks(spark, turns, cfg, out)
    assert(r.resumed)
    val fin = TranscriptPipeline.readSinks(spark, out)
    val full = TranscriptPipeline.readSinks(spark, outFull)
    assert(fin.exceptAll(full).count() == 0 && full.exceptAll(fin).count() == 0,
      "post-crash resume diverged from the single-run sinks")
  }

  test("resume at 10,000 shards: anti-join scales, no shard-count-proportional driver state") {
    import spark.implicits._
    // many tiny shards: the shape that breaks driver-side id lists / isin trees
    // shard keys are (conv_id, turn_idx/saltBlock): 3000 convs x 10 blocks = 30k keys
    // over 10k shards -> ~95% of shards populated (Poisson 1 - e^-3)
    val bigCfg = TranscriptPipeline.Config(numShards = 10000, saltBlock = 2,
      sampleRate = 8, numPartitionsOpt = Some(32))
    val manyTurns = Transcripts.generate(spark, nConvs = 3000, turnsPerConv = 20).cache()
    val outFull = Files.createTempDirectory("graft_10k_full").toString
    val out = Files.createTempDirectory("graft_10k").toString

    val rf = TranscriptPipeline.runToSinks(spark, manyTurns, bigCfg, outFull)
    assert(rf.shardsBuilt > 9000, s"expected ~10k populated shards, got ${rf.shardsBuilt}")

    // attempt 0 commits roughly half the shards, then the full input resumes over it
    val half = manyTurns.withColumn("sid", TranscriptPipeline.shardIdCol(bigCfg))
      .filter(col("sid") < 5000).drop("sid").as[Turn]
    TranscriptPipeline.runToSinks(spark, half, bigCfg, out)
    val r = TranscriptPipeline.runToSinks(spark, manyTurns, bigCfg, out)
    assert(r.resumed)
    assert(r.shardsBuilt < rf.shardsBuilt,
      "resume must rebuild only uncommitted shards, not the whole table")

    val fin = TranscriptPipeline.readSinks(spark, out)
    val full = TranscriptPipeline.readSinks(spark, outFull)
    assert(fin.exceptAll(full).count() == 0 && full.exceptAll(fin).count() == 0,
      "10k-shard resume diverged from the single-run sinks")

    // plan audit: pending-turn filtering is a LeftAnti JOIN against the lineage
    // parquet, never an In/InSet literal list over shard ids
    val committed = spark.read.parquet(s"$out/lineage")
      .select(col("shard_id").as("__cid")).distinct()
    val pendingPlan = manyTurns.withColumn("__sid", TranscriptPipeline.shardIdCol(bigCfg))
      .join(committed, col("__sid") === col("__cid"), "left_anti")
      .queryExecution.executedPlan.toString
    assert(pendingPlan.contains("LeftAnti"), "resume filter must be an anti-join")
    manyTurns.unpersist()
  }

  test("high-frequency-pattern scan fallback routes identically to the locate path") {
    val shards = TranscriptPipeline.buildShards(spark, turns, cfg).cache()
    val cols = Seq("sink", "conv_id", "turn_idx", "role", "tool", "ts", "n_matches", "text")
    val viaLocate = TranscriptPipeline.route(spark, shards, cfg.rules)
      .selectExpr(cols: _*)
    // locateCap = 0 forces the O(corpus) scan fallback for every matched pattern
    val viaScan = TranscriptPipeline.route(spark, shards, cfg.rules, locateCap = 0)
      .selectExpr(cols: _*)
    assert(viaLocate.exceptAll(viaScan).count() == 0 &&
      viaScan.exceptAll(viaLocate).count() == 0, "scan fallback differs from locate routing")
    shards.unpersist()
  }

  test("alphabet fingerprint prunes shards that cannot match, never drops real matches") {
    import spark.implicits._
    val shards = TranscriptPipeline.buildShards(spark, turns, cfg).cache()
    // a pattern whose char is absent from the whole corpus -> every shard pruned
    val pruned = TranscriptPipeline.route(spark, shards,
      Seq(SinkRule("none", "ㄱㄲ"))).count()
    assert(pruned == 0)
    // pruning must not lose hits: route with pruning equals the Catalyst oracle (already
    // checked above); here check mayContain is sound on real shards
    val sample = shards.take(3)
    sample.foreach { sh =>
      assert(TranscriptPipeline.mayContain(sh.alpha_bits, "ERROR"))
      assert(!TranscriptPipeline.mayContain(sh.alpha_bits, "ㄱ"))
    }
    shards.unpersist()
  }

  test("shard table persists and routes identically after reload") {
    import spark.implicits._
    val dir = Files.createTempDirectory("shardtab").toString
    val shards = TranscriptPipeline.buildShards(spark, turns, cfg)
    TranscriptPipeline.writeShardTable(shards, dir)
    val reloaded = TranscriptPipeline.readShardTable(spark, dir)
    val a = TranscriptPipeline.route(spark, shards, cfg.rules)
      .select("sink", "conv_id", "turn_idx", "n_matches", "text")
    val b = TranscriptPipeline.route(spark, reloaded, cfg.rules)
      .select("sink", "conv_id", "turn_idx", "n_matches", "text")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("windowed running aggregates are ordered and monotone per conversation") {
    val shards = TranscriptPipeline.buildShards(spark, turns, cfg)
    val routed = TranscriptPipeline.route(spark, shards, cfg.rules)
    val win = TranscriptPipeline.runningWindow(routed.toDF())
    val bad = win.filter(col("running_matches") < col("n_matches")).count()
    assert(bad == 0)
    // hit_rank is dense per (sink, conv)
    val chk = win.groupBy("sink", "conv_id")
      .agg(count(lit(1)).as("n"), max("hit_rank").as("mx"))
      .filter(col("n") =!= col("mx")).count()
    assert(chk == 0)
  }
}
