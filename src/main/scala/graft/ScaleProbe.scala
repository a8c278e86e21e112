package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Corpus-growth probe for the content-quadratic-risk operators (the round-4 "sf1
  * stretch": no sf1 testdata exists, so the growth evidence comes from a
  * deterministic generator that mirrors the documents/embeddings shape at 1x/10x/100x
  * the sf0.1 row counts — same schema, same ~300-char docs, ~4% planted exact + near
  * duplicates so dedup/similarity operators stay non-trivial).
  *
  * For each scale it times the operators whose cost could grow super-linearly with
  * corpus size (band joins, inverted indexes, connected components, IVF) and prints
  * one JSON line of seconds per (query, scale). A healthy engine shows ~linear
  * growth; a quadratic candidate blowup shows as ~100x time at 10x rows — exactly
  * the failure q37's 16-bit signature had before round 4.
  *
  *   SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ScaleProbe 1 10 100"
  */
object ScaleProbe {

  /** Bump on ANY generator change — the corpus cache key includes it. */
  private val GenVersion = 2

  private val ProbeQueries = Seq(
    "q30_token_count", "q37_simhash_neardup", "q40_dedup_exact", "q41_minhash_lsh",
    "q42_simhash", "q43_jaccard_ngram", "q44_dup_clusters", "q45_top_terms",
    "q50_knn_brute", "q51b_ivf_kmeans", "q52_embed_neardup", "q52_capped64",
    "q58_semantic_dedup", "q58_kscaled",
    // chunk dedup is chunks ~ 6n rows through one hash agg + equi-join + doc_id
    // regroup — linear by construction; probed to pin the no-window claim
    "q86_chunk_dedup",
    // BPE training's claim is the inverse of the quadratic risks above: after the
    // one corpus-sized agg, all 16 merge rounds run over the VOCAB (fixed 20k words
    // in this generator at every scale), so wall time should stay ~flat at 100x rows
    "q59_bpe_train",
    // the round-5 selection/retrieval family: every cutoff comes from a BOUNDED
    // histogram or a broadcast table, so all three must track the linear scans
    "q88_ccnet_buckets", "q89_dsir", "q90_bm25",
    // exact-substring dedup (r05 VERDICT watch item #2): linear in corpus CHARS
    // but with a priced wire constant — one md5 fingerprint per character
    // position through the duplicate-count window. The probe records wall AND
    // shuffle-write bytes so the B/char budget is measured, not just derived
    "q57_substring_dedup",
    // the round-5 codec-path family: q95 is the band-join class (the dHash twin of
    // q37 — md5-seeded pixels keep cross-cluster hashes independent, so candidate
    // pairs grow ~linearly); q96 is a pure per-row kernel; q97 is q86's chunk
    // stream through a df agg + anti join — all three must track the linear scans
    "q95_image_neardup", "q96_audio_tones", "q97_boilerplate")

  /** Uncapped q52 measured ~31 s at 10x and >14 min at 100x on this generator:
    * RANDOM (non-clustered) embeddings give 4-bit hyperplane bands ~no selectivity,
    * so candidates grow ~n^2/32 — the structural case for the hot-bucket cap
    * (SPARK_GRAFT_LSH_MAXBUCKET). Skip the known-quadratic point; q52_capped64 runs
    * the same pipeline with maxBucket=64 at every scale to demonstrate the lever.
    * q58 at the fixed default k=10 is the same class (pairs ~ n^2/k) — skipped at
    * 100x; q58_kscaled runs the paper's k ~ n/200 at every scale to demonstrate
    * THAT lever (SPARK_GRAFT_SEMDEDUP_K in production).
    */
  private def skip(q: String, scale: Int): Boolean =
    (q == "q52_embed_neardup" || q == "q58_semantic_dedup") && scale >= 100

  private def q58Scaled(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val n = s.read.parquet(s"$dir/embeddings.parquet").count()
    graft.ops.CorpusQueries.semanticDedup(s, dir, k = math.max(10, (n / 200).toInt))
  }

  private def q52Capped(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val bands = graft.ops.SimilarityLsh.bandsKernel(
      emb.repartition(s.sparkContext.defaultParallelism)
        .select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])],
      graft.ops.CorpusQueries.EmbedPlanes, bandBits = 4)
    val cand = graft.ops.SimilarityLsh.candidatePairs(bands, "__id", maxBucket = Some(64))
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"))
    val joined = cand
      .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea")), "vec_a")
      .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb")), "vec_b")
      .select(col("vec_a").cast("long"), col("vec_b").cast("long"), col("ea"), col("eb"))
      .as[(Long, Long, Array[Float], Array[Float])]
    graft.ops.SimilarityLsh.rerankCosineKernel(joined, 0.35).toDF("vec_a", "vec_b")
  }

  /** Deterministic synthetic corpus in the testdata shape. Both outputs are checked:
    * a run killed between the two writes must regenerate, not half-serve.
    */
  private def ensureCorpus(spark: SparkSession, dir: String, scale: Int): Unit = {
    if (Files.exists(Paths.get(s"$dir/documents.parquet", "_SUCCESS")) &&
      Files.exists(Paths.get(s"$dir/embeddings.parquet", "_SUCCESS"))) return
    import spark.implicits._
    val nDocs = 5000 * scale
    val nEmb = 2000 * scale
    val langs = Array("en", "fr", "es", "de", "zh")
    val sources = Array("web", "chat", "code", "paper")
    val vocab = Array.tabulate(20000)(i => s"w$i")
    val docs = spark.range(nDocs.toLong).as[Long].mapPartitions { it =>
      it.map { i =>
        val r = new scala.util.Random(0xC0FFEE + i)
        // ~2% exact duplicates of doc i-1, ~2% near-duplicates of doc i-2 (the base
        // doc EXISTS in the corpus — an edit of the doc's own fresh tokens would just
        // be another unique document, and the probe would measure a dup-free corpus)
        val base = if (i % 50 == 1) i - 1 else if (i % 50 == 2) i - 2 else i
        val rb = new scala.util.Random(0xC0FFEE + base)
        val len = 35 + rb.nextInt(20)
        val toks = Array.fill(len)(vocab(rb.nextInt(vocab.length)))
        if (i % 50 == 2 && len > 3) { // 2-token edit of doc i-2
          toks(1) = vocab(r.nextInt(vocab.length)); toks(len - 2) = vocab(r.nextInt(vocab.length))
        }
        val text = toks.mkString(" ")
        (i, text, langs((i % langs.length).toInt), sources((i % sources.length).toInt),
          text.length.toLong)
      }
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val emb = spark.range(nEmb.toLong).as[Long].mapPartitions { it =>
      it.map { i =>
        val r = new scala.util.Random(0xBEEF + i)
        (i, Array.fill(64)((r.nextGaussian() / 8).toFloat), (i % 10).toInt)
      }
    }.toDF("vec_id", "embedding", "label")
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val scales = (if (args.nonEmpty) args.toSeq else Seq("1", "10")).map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm codegen + noop sink once
    spark.range(1 << 20).selectExpr("sum(id) as s").write.format("noop").mode("overwrite").save()

    // per-probe shuffle-write accounting (the q57 B/char budget evidence)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          shuffleBytes.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val out = scales.map { scale =>
      // GenVersion in the path: a cached corpus from an OLDER generator (e.g. the
      // round-4 dup-planting fix) must never be silently re-measured
      val dir = s"/tmp/graft_scaleprobe_v${GenVersion}_$scale"
      ensureCorpus(spark, dir, scale)
      // SPARK_GRAFT_PROBE_ONLY=<prefix> re-measures a single probe without paying
      // for the whole battery (dev convenience; the recorded artifacts run all)
      val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      val times = ProbeQueries.filter(q => only.forall(q.startsWith))
        .filterNot(skip(_, scale)).map { q =>
        val fn: (SparkSession, String) => org.apache.spark.sql.DataFrame =
          if (q == "q52_capped64") q52Capped
          else if (q == "q58_kscaled") q58Scaled
          // probe-corpus variants: its source values and vocabulary differ from
          // the testdata tables the catalog entries pin for the oracle gate
          else if (q == "q89_dsir")
            (s, d) => graft.ops.CorpusQueries.dsirSelect(s, d, targetSource = "web")
          else if (q == "q90_bm25")
            (s, d) => graft.ops.CorpusQueries.bm25TopK(s, d,
              Seq((1L, "w17"), (1L, "w42"), (1L, "w99"), (2L, "w123"),
                (2L, "w1234"), (3L, "w5"), (3L, "w777"), (3L, "w3141")))
          else SparkEntry.queries(q)
        shuffleBytes.set(0L)
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val mb = shuffleBytes.get() / 1e6
        System.err.println(f"[probe] scale=$scale $q%-22s $sec%.2f s shuffleWriteMB=$mb%.0f")
        q -> sec
      }
      scale -> times
    }
    val json = out.map { case (scale, times) =>
      s""""$scale": {${times.map { case (q, s) => f""""$q": $s%.2f""" }.mkString(", ")}}"""
    }.mkString(", ")
    println(s"""{"metric":"scale_probe","unit":"sec","scales":{$json}}""")
    spark.stop()
  }
}
