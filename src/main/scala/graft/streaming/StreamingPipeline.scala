package graft.streaming

import graft.pipeline.{Transcripts, Turn}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Conversation session state for the stateful streaming aggregation. */
case class ConvState(nTurns: Long, nErrorTurns: Long, firstTsMicros: Long, lastTsMicros: Long)

case class ConvUpdate(
    conv_id: String,
    n_turns: Long,
    n_error_turns: Long,
    first_ts_micros: Long,
    last_ts_micros: Long
)

/** Structured Streaming surface of the transcript pipeline: readStream -> grok parse ->
  * watermarked windowed aggregates, plus arbitrary stateful per-conversation tracking via
  * flatMapGroupsWithState. The reference is strictly batch (SURVEY.md section 2b,
  * streaming row) — this is additional Spark-native surface; shard building itself stays
  * batch (rebuilding an FM-Index per micro-batch would be wrong).
  */
object StreamingPipeline {

  /** Grok/regex parse of a stream of raw transcript lines (same expressions as batch). */
  def parseStream(spark: SparkSession, rawLines: DataFrame): Dataset[Turn] =
    Transcripts.parseRawLines(spark, rawLines)

  /** Tumbling-window per-role aggregates with a watermark for late data. */
  def windowedCounts(turns: Dataset[Turn], window: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    turns
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("role"))
      .agg(count(lit(1)).as("n_turns"), sum(length(col("text"))).as("n_chars"))
      .select(col("window.start").as("window_start"), col("role"), col("n_turns"), col("n_chars"))

  /** Streaming exact dedup: drop turns whose content fingerprint already arrived within
    * the watermark horizon. State is BOUNDED by the watermark (expired fingerprints are
    * evicted), which is what makes dedup-on-a-stream viable at 100 TB/day — an unbounded
    * dropDuplicates would grow state forever.
    */
  def dedupStream(turns: Dataset[Turn], watermark: String = "2 hours"): DataFrame =
    turns.toDF()
      .withColumn("fp", md5(col("text").cast("binary")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Gap sessionization via the native session_window — one aggregation that works
    * identically in batch and streaming (merging windows closer than `gap`).
    */
  def sessionCounts(turns: Dataset[Turn], gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    turns
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("conv_id"))
      .agg(count(lit(1)).as("n_turns"), sum(length(col("text"))).as("n_chars"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("conv_id"),
        col("n_turns"), col("n_chars"))

  /** STREAM-STREAM interval join with watermarks on both sides: each user turn joins
    * the assistant turns of its conversation arriving within `horizon` after it. The
    * time-range condition plus the two watermarks is what BOUNDS the join state (each
    * side can evict rows older than watermark + horizon) — the requirement for joining
    * two unbounded streams at production scale; an un-watermarked stream-stream join
    * grows state forever.
    */
  def requestResponseJoin(turns: Dataset[Turn], horizon: String = "10 minutes",
      watermark: String = "2 hours"): DataFrame = {
    val u = turns.toDF().filter(col("role") === "user")
      .select(col("conv_id").as("u_conv"), col("turn_idx").as("u_idx"),
        col("ts").as("u_ts"))
      .withWatermark("u_ts", watermark)
    val a = turns.toDF().filter(col("role") === "assistant")
      .select(col("conv_id").as("a_conv"), col("turn_idx").as("a_idx"),
        col("ts").as("a_ts"))
      .withWatermark("a_ts", watermark)
    u.join(a, col("u_conv") === col("a_conv") &&
        col("a_ts") >= col("u_ts") &&
        col("a_ts") <= col("u_ts") + expr(s"interval $horizon"))
      .select(col("u_conv").as("conv_id"), col("u_idx"), col("a_idx"),
        col("u_ts"), col("a_ts"))
  }

  /** Stateful per-conversation running aggregates (update mode): each micro-batch emits
    * the refreshed conversation summary.
    */
  def conversationState(spark: SparkSession, turns: Dataset[Turn]): Dataset[ConvUpdate] = {
    import spark.implicits._
    turns
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (convId: String, rows: Iterator[Turn], state: GroupState[ConvState]) => {
          var s = state.getOption.getOrElse(ConvState(0, 0, Long.MaxValue, Long.MinValue))
          rows.foreach { t =>
            val us = graft.pipeline.TsMicros.toMicros(t.ts)
            s = ConvState(
              s.nTurns + 1,
              s.nErrorTurns + (if (t.text.contains("ERROR")) 1 else 0),
              math.min(s.firstTsMicros, us),
              math.max(s.lastTsMicros, us))
          }
          state.update(s)
          Iterator.single(ConvUpdate(convId, s.nTurns, s.nErrorTurns, s.firstTsMicros, s.lastTsMicros))
        })
  }
}
