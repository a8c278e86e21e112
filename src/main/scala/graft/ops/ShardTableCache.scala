package graft.ops

import graft.pipeline.{ShardRow, TranscriptPipeline, Turn}
import org.apache.spark.sql.{Dataset, SparkSession}
import scala.collection.mutable

/** Session-scoped cache of built shard tables for the query catalog. Production
  * persists the shard table once and re-queries it (`TranscriptPipeline
  * .writeShardTable` / `readShardTable`); the catalog mirrors that by sharing one
  * persisted Dataset across the queries that hit the same (table, config) — q20-q25
  * over the document shards, q71-q73 over the event shards — instead of rebuilding
  * the identical index table per query. Keyed by the live SparkContext so a cached
  * plan can never leak across sessions (Bench starts a fresh session per phase).
  */
private[graft] object ShardTableCache {

  private val cache = mutable.Map[(Int, String), Any]()

  private def key(s: SparkSession, tag: String): (Int, String) =
    (System.identityHashCode(s.sparkContext), tag)

  private def getOrBuild[T](s: SparkSession, tag: String)(build: => Dataset[T]): Dataset[T] =
    synchronized {
      // entries from any other context belong to a previous (stopped) session in this
      // single-driver setup — drop them so stale plans can never be served
      cache.filterInPlace { case ((ctx, _), _) => ctx == System.identityHashCode(s.sparkContext) }
      cache.getOrElseUpdate(key(s, tag), build.persist()).asInstanceOf[Dataset[T]]
    }

  def docShards(s: SparkSession, dir: String, numShards: Int): Dataset[DocShard] =
    getOrBuild(s, s"docs:$dir:$numShards") {
      DocShards.build(s, s.read.parquet(s"$dir/documents.parquet"), numShards)
    }

  def eventShards(s: SparkSession, dir: String, cfg: TranscriptPipeline.Config): Dataset[ShardRow] = {
    import s.implicits._
    getOrBuild(s, s"events:$dir:$cfg") {
      TranscriptPipeline.buildShards(s, CorpusQueries.eventTranscripts(s, dir).as[Turn], cfg)
    }
  }
}
