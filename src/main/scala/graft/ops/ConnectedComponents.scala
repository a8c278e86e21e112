package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components by min-label propagation — the clustering step of a
  * dedup pipeline (exact-dup + LSH near-dup edges in, cluster ids out; the cluster id is
  * the smallest member id, so "keep the canonical doc" is `doc_id = cluster_id`).
  *
  * Scale shape: every iteration is neighbor-min propagation (one edge join + min-agg)
  * FUSED WITH POINTER JUMPING (labels hop to their label's label, one more equi-join),
  * so reach roughly doubles per round: convergence in O(log diameter) rounds instead of
  * O(diameter) — the property that matters when a transitive near-dup CHAIN (not a
  * clique) spans a web-scale corpus. Labels only decrease, so convergence is checked
  * with a cheap exact `sum(lbl)` fixpoint probe instead of a row-diff join; for dedup
  * graphs components are near-cliques (diameter 2-3) and the loop terminates in a
  * handful of rounds either way. `localCheckpoint` truncates the growing lineage so
  * round N's plan doesn't replan rounds 1..N-1.
  */
object ConnectedComponents {

  /** @param edges two numeric columns (a, b), undirected, self-loops/dups tolerated.
    * @return (node, cluster_id) for every node appearing in `edges`, cluster_id = min
    *         node id reachable; deterministic.
    */
  def run(edges: DataFrame, maxIters: Int = 50): DataFrame = runWithRounds(edges, maxIters)._1

  /** Default edge cap for the local union-find fast path: edge sets at or under
    * this many rows resolve on the driver in ONE bounded job (the adaptive-threshold
    * contract of a broadcast join); larger graphs take the distributed loop
    * unchanged. A dedup edge set is proportional to the number of DUPLICATED docs,
    * so at 100 TB it exceeds the cap and stays distributed — the threshold bounds
    * driver memory, never the corpus.
    */
  def localMaxDefault: Int =
    sys.env.getOrElse("SPARK_GRAFT_CC_LOCAL_MAX", (1 << 20).toString).toInt

  /** run + the number of rounds executed (spec hook: a 2^k chain must finish in
    * O(k) rounds, not O(2^k)). `pointerJump = false` drops the extra per-round join
    * for workloads known to be clique-shaped (diameter 2-3), where jumping cannot
    * save rounds; the jump is always skipped in round 1, where labels are still the
    * identity and the hop is a provable no-op. `localMax = 0` disables the local
    * fast path (the spec pins local == distributed on randomized graphs); the local
    * result reports 0 rounds.
    */
  def runWithRounds(edges: DataFrame, maxIters: Int = 50,
      pointerJump: Boolean = true,
      localMax: Int = localMaxDefault): (DataFrame, Int) = {
    if (localMax > 0) {
      val aC = edges.columns(0)
      val bC = edges.columns(1)
      val head = edges
        .select(col(aC).cast("long").as("a"), col(bC).cast("long").as("b"))
        .limit(localMax + 1).collect()
      if (head.length <= localMax) {
        val spark = edges.sparkSession
        import spark.implicits._
        return (spark.createDataset(
          localComponents(head.map(r => (r.getLong(0), r.getLong(1)))).toSeq)
          .toDF("node", "cluster_id"), 0)
      }
    }
    runDistributed(edges, maxIters, pointerJump)
  }

  /** Union-find with min-id roots over an in-memory edge list — identical labeling
    * to the distributed loop (cluster_id = smallest reachable node id; self-loops
    * and duplicate edges tolerated). Deterministic regardless of edge order.
    */
  private def localComponents(edges: Array[(Long, Long)]): Array[(Long, Long)] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrElse(x, x)
      while (p != x) { // path halving
        val gp = parent.getOrElse(p, p)
        parent.update(x, gp)
        x = gp
        p = parent.getOrElse(x, x)
      }
      x
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) { // smaller id becomes the root, so the root IS the min id
        if (ra < rb) parent.update(rb, ra) else parent.update(ra, rb)
      }
    }
    parent.keysIterator.map(n => (n, find(n))).toArray.sortBy(_._1)
  }

  private def runDistributed(edges: DataFrame, maxIters: Int,
      pointerJump: Boolean): (DataFrame, Int) = {
    val a = edges.columns(0)
    val b = edges.columns(1)
    val sym = edges.select(col(a).cast("long").as("src"), col(b).cast("long").as("dst"))
      .union(edges.select(col(b).cast("long").as("src"), col(a).cast("long").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint()
    // coalesce: sum() over zero rows is NULL — an empty edge set must return an empty
    // labeling, not NPE (the q44 feed is non-empty, but run() is a public API)
    var checksum = labels.agg(coalesce(sum(col("lbl")), lit(0L))).head().getLong(0)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      // each node takes min(own label, labels of neighbors): one join + one min-agg
      val viaNbr = sym.join(labels, col("dst") === col("node"))
        .groupBy(col("src").as("node2")).agg(min(col("lbl")).as("nbr_lbl"))
      val prop = labels.join(viaNbr, col("node") === col("node2"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"))
      // pointer jumping: follow the label one hop (lbl := label-of-lbl). Every label
      // IS a node id present in `labels`, so the lookup side is labels itself; the
      // hop composes paths, doubling effective reach each round (log-d convergence).
      // Round 1 skips it: labels are the identity, so the hop changes nothing.
      val jump =
        if (!pointerJump || iter == 0) prop
        else prop.as("x")
          .join(labels.select(col("node").as("jn"), col("lbl").as("jl")),
            col("x.lbl") === col("jn"), "left")
          .select(col("x.node").as("node"),
            least(col("x.lbl"), coalesce(col("jl"), col("x.lbl"))).as("lbl"))
      // lazy checkpoint: the sum() action below materializes the iteration in ONE job
      // (an eager checkpoint would run a second, separate job per round)
      val next = jump.localCheckpoint(false)
      val nextSum = next.agg(coalesce(sum(col("lbl")), lit(0L))).head().getLong(0)
      converged = nextSum == checksum // labels are monotone non-increasing: equal sum = fixpoint
      checksum = nextSum
      // round N only ever reads round N's checkpoint — free the superseded round's
      // blocks eagerly so storage stays bounded at ONE label snapshot regardless of
      // round count. Dataset.unpersist only clears cacheManager entries, not
      // localCheckpoint blocks, so the unpersist must hit the checkpointed RDD itself
      // (safe here: `next` was just materialized by the sum action, truncating its
      // lineage past the previous round).
      freeCheckpoint(labels)
      labels = next
      iter += 1
    }
    sym.unpersist()
    (labels.select(col("node"), col("lbl").as("cluster_id")), iter)
  }

  /** Unpersists the block store behind a localCheckpoint'd frame (its analyzed plan is
    * a LogicalRDD over the checkpointed RDD). No-op for non-checkpointed frames.
    */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Spec hook: ids of the RDD blocks currently persisted for `df`'s checkpoint. */
  private[graft] def checkpointRddId(df: DataFrame): Option[Int] =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }
}
