package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** EXACTLY-ONCE Structured-Streaming sink into a ManifestDataSource table.
  *
  * `foreachBatch` alone is at-least-once: after a crash between the batch's side
  * effect and the checkpoint advance, the restarted query re-runs the same batch id.
  * The manifest's atomic snapshot publication closes that gap: each micro-batch
  * commit stamps `stream-batch-<id>` INSIDE the snapshot JSON (one atomic hard-link
  * publication, see ManifestTables.tryWriteSnapshot), so "was this batch committed?"
  * and "commit this batch" are the same event. A replayed batch finds its note among
  * the committed snapshots and becomes a no-op; a crash BEFORE publication leaves
  * only orphan data files no snapshot references. Iceberg's streaming
  * commit-dedup property on the same plain-filesystem manifest layout.
  *
  * Usage:
  * {{{
  *   ManifestStreamSink.start(streamDf, dir, partCol = "lang_p", checkpoint)
  *     .trigger(Trigger.AvailableNow()).start()
  * }}}
  */
object ManifestStreamSink {

  /** Commits one micro-batch exactly once. Returns false when the batch id was
    * already committed (restart replay) — the call is then a pure no-op.
    */
  def commitBatch(batch: Dataset[Row], batchId: Long, dir: String, partCol: String): Boolean = {
    val note = s"stream-batch-$batchId"
    if (ManifestTables.committedNotes(dir).contains(note)) false
    else {
      batch.write.format(classOf[ManifestDataSource].getName)
        .option("partcol", partCol)
        .option("commitnote", note)
        .mode("append")
        .save(dir)
      true
    }
  }

  /** foreachBatch writer wiring; caller picks the trigger and starts the query. */
  def start(stream: DataFrame, dir: String, partCol: String,
      checkpoint: String): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: Dataset[Row], id: Long) => { commitBatch(b, id, dir, partCol); () })
}
