package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** EXACTLY-ONCE Structured-Streaming sink into a ManifestDataSource table.
  *
  * `foreachBatch` alone is at-least-once: after a crash between the batch's side
  * effect and the checkpoint advance, the restarted query re-runs the same batch id.
  * The manifest's atomic snapshot publication closes that gap: each micro-batch
  * commit stamps `stream-<sinkId>-batch-<id>` INSIDE the snapshot JSON, and the
  * publication loop itself re-checks the note before every claim attempt (see
  * ManifestBatchWrite.commit), so even a zombie driver racing its replacement on the
  * same batch publishes it exactly once — the loser's snapshot-id CAS fails, its
  * retry re-reads the state, sees the winner's note, and no-ops. A crash BEFORE
  * publication leaves only orphan data files no snapshot references. Iceberg's
  * streaming commit-dedup property on the same plain-filesystem manifest layout.
  *
  * `sinkId` scopes the dedup to ONE logical stream: batch ids restart from 0 for
  * every new checkpoint, so deduping on the bare id would silently drop a second
  * stream's early batches. `start` derives it from the checkpoint path (stable
  * across restarts of the same query, distinct for distinct queries).
  *
  * Usage:
  * {{{
  *   ManifestStreamSink.start(streamDf, dir, partCol = "lang_p", checkpoint)
  *     .trigger(Trigger.AvailableNow()).start()
  * }}}
  */
object ManifestStreamSink {

  /** Stable identity for a logical stream: content hash of its checkpoint path. */
  def sinkIdFor(checkpoint: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(checkpoint.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.take(6).map(b => f"$b%02x").mkString
  }

  /** Commits one micro-batch of one logical stream exactly once. Returns false when
    * (sinkId, batchId) was already committed (restart replay) — a pure no-op then.
    * `upsertKey`: MERGE-BY-KEY semantics per micro-batch — the commit additionally
    * carries ONE equality-delete segment over the batch's distinct key values, so
    * earlier rows with those keys vanish at read time while the batch's own rows
    * survive; the write side never opens a data file (O(keys) commit — the Iceberg
    * v2 / Flink-CDC streaming-upsert shape). Exactly-once composes unchanged: the
    * note, the data segment and the delete segment publish in one atomic snapshot.
    */
  def commitBatch(batch: Dataset[Row], batchId: Long, dir: String, partCol: String,
      sinkId: String, upsertKey: Option[String] = None): Boolean = {
    val note = s"stream-$sinkId-batch-$batchId"
    if (ManifestTables.hasCommittedNote(dir, note)) false
    // empty micro-batches (idle restarts, no-data watermark flush rounds that emit
    // nothing) publish no snapshot: replay safety needs no note for a no-op, and an
    // empty snapshot per idle batch would grow table metadata forever
    else if (batch.isEmpty) false
    else {
      // the note travels into the atomic publication; the commit loop re-checks it
      // under contention, so a concurrent duplicate of this call publishes once
      val w = batch.write.format(classOf[ManifestDataSource].getName)
        .option("partcol", partCol)
        .option("commitnote", note)
        .mode("append")
      upsertKey.fold(w)(k => w.option("upsertkey", k)).save(dir)
      true
    }
  }

  /** foreachBatch writer wiring; caller picks the trigger and starts the query. */
  def start(stream: DataFrame, dir: String, partCol: String,
      checkpoint: String, upsertKey: Option[String] = None): DataStreamWriter[Row] = {
    val sinkId = sinkIdFor(checkpoint)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: Dataset[Row], id: Long) =>
        { commitBatch(b, id, dir, partCol, sinkId, upsertKey); () })
  }
}
