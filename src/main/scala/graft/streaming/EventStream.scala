package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming event analytics (SURVEY §2.6 streaming surface): watermarked
  * tumbling-window aggregation and session windows over an event stream.
  * The batch twins (q40/q41) pin the semantics against the oracle; these
  * produce the same aggregates incrementally.
  *
  * Scale notes: state is bounded by the watermark (late data beyond it is
  * dropped and its state evicted); the shuffle key is (window, event_type) /
  * (user, session) — the same partitioning a 1000-executor cluster would
  * use. `maxFilesPerTrigger` bounds micro-batch size during backfill.
  */
object EventStream {

  /** File-based event stream (parquet events dropped into `dir`). */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "16")
      .parquet(dir)

  /** Watermarked hourly counts/sums per event type (append-mode capable). */
  def hourlyStats(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming exactly-once event dedup: duplicate event_ids within the
    * watermark horizon are dropped (state evicted beyond it) — the
    * streaming twin of exact dedup for at-least-once upstream producers. */
  def deduped(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates("event_id")

  /** Session windows per user with a 30-minute inactivity gap — the
    * streaming twin of the batch gaps-and-islands sessionization (q41). */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
}
