package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming operators over the `events` stream (SURVEY §7.6.4
  * — purely the extension mandate; the reference is batch-only).
  *
  * Every transform here takes a DataFrame and works identically on a batch
  * frame and a `readStream` frame — that is Spark's unified-semantics
  * story, and it's what the tests exercise: stream output ≡ batch output
  * of the same function.
  *
  * Watermarks bound state: an aggregation over a 100 TB/day stream only
  * retains per-window partial state until `watermark` passes the window
  * end, then emits and evicts.
  */
object StreamingOps {

  /** Event-time tumbling window counts + sums per event type. */
  def tumblingCounts(events: DataFrame, width: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("value_sum"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("value_sum"))

  /** Sliding windows (width, slide). */
  def slidingCounts(events: DataFrame, width: String = "10 minutes",
      slide: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** Session windows per user: events within `gap` of the previous event
    * merge into one session. */
  def sessionCounts(events: DataFrame, gap: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))

  /** Streaming dedup on a key set, with state bounded by the watermark
    * (`dropDuplicatesWithinWatermark` — late duplicates beyond the
    * watermark are already emitted; state is evicted, not unbounded). */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Custom per-key state via mapGroupsWithState (the extension mandate's
    * "custom state" op): running per-user event count + value total,
    * carried across micro-batches in the state store. Emits the updated
    * totals for each key touched in the batch (use outputMode "update"). */
  def runningUserTotals(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)](GroupStateTimeout.NoTimeout) {
        case (user, rows, state) =>
          var (n, total) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { case (_, v) => n += 1; total += v }
          state.update((n, total))
          (user, n, total)
      }
      .toDF("user_id", "n_events", "total_value")
  }

  /** Replay a parquet directory as a file stream (test/dev harness:
    * batch parquet in, stream semantics out; `maxFilesPerTrigger` paces
    * the replay). */
  def replayParquet(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Run a streaming DataFrame to completion against a memory sink and
    * return the materialized result (synchronous test/dev harness). */
  def runToMemory(spark: SparkSession, streamed: DataFrame, name: String,
      outputMode: String = "complete"): DataFrame = {
    val q = streamed.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
