package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
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

  /** Running per-user baseline carried across micro-batches. */
  final case class SpikeState(n: Long, sum: Double)

  /** An emitted anomaly: the value exceeded `factor`× the user's baseline. */
  final case class Spike(user_id: Long, ts: java.sql.Timestamp,
      value: Double, baseline: Double)

  /** Custom arbitrary state (the `flatMapGroupsWithState` surface —
    * semantics no built-in window/agg expresses): per-user spike detection
    * against a RUNNING baseline. Each user's state is the (count, sum) of
    * every value seen so far; an event whose value exceeds `factor`× the
    * baseline mean is emitted the moment it arrives — not at window close,
    * which is why an aggregation cannot express this (emission is per-event
    * and depends on order, and the baseline must NOT include the spike
    * itself before testing it).
    *
    * Scale/state shape: one tiny state row per user key, shuffled once by
    * user; EventTimeTimeout evicts users idle for a day past the watermark,
    * bounding state exactly like the built-in windows bound theirs. */
  def spikes(events: DataFrame, factor: Double = 3.0, minHistory: Int = 3,
      watermark: String = "2 hours"): Dataset[Spike] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"), col("value").cast("double"))
      // a single NULL in any field would throw in the non-nullable tuple
      // encoder and wedge the query permanently (checkpoint restart replays
      // the same poison row); drop unkeyed/unvalued events like the
      // aggregating siblings do implicitly
      .filter(col("user_id").isNotNull && col("ts").isNotNull && col("value").isNotNull)
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SpikeState, Spike](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
            state: GroupState[SpikeState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(SpikeState(0L, 0.0))
            val out = Seq.newBuilder[Spike]
            val rs = rows.toSeq
            // event-time order within the batch; cross-batch order is the
            // stream's arrival order, as for any stateful streaming op
            rs.sortBy(_._2.getTime).foreach { case (_, ts, v) =>
              if (st.n >= minHistory) {
                val mean = st.sum / st.n
                if (mean > 0 && v > factor * mean) out += Spike(user, ts, v, mean)
              }
              st = SpikeState(st.n + 1, st.sum + v)
            }
            state.update(st)
            // evict users idle for a day of EVENT time: anchor the timeout
            // to this batch's max event time, NOT the watermark — a
            // watermark-relative timestamp (0 on the first batch) falls
            // below the next batch's watermark and Spark expires the state
            // before the key's next data is processed (measured: the
            // baseline silently reset every batch)
            state.setTimeoutTimestamp(rs.map(_._2.getTime).max + 86400000L)
            out.result().iterator
          }
      }
  }

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

  /** Stream-stream interval join (the funnel shape): every `leadType` event
    * matched to every `followType` event of the SAME user whose event time
    * falls in [lead.ts, lead.ts + withinUs]. Emits (user, lead event,
    * follow event, delay in µs) per matched pair.
    *
    * One implementation serves both engines: on a streaming frame this is
    * Spark's watermarked stream-stream INNER join — both sides carry a
    * watermark and the join condition bounds follow_ts relative to lead_ts,
    * which is exactly what the state store needs to evict buffered rows
    * (a lead is droppable once the watermark passes lead.ts + withinUs;
    * inner-join matches emit eagerly, no watermark wait). On a batch frame
    * Catalyst's EliminateEventTimeWatermark removes the watermark nodes and
    * the same expression tree runs as a plain equi-join — which is how the
    * q94 oracle gate pins the exact semantics the stream computes.
    *
    * Scale shape: equi-key user_id — both sides shuffle once by user (or
    * co-partition for free when the source is already user-bucketed); the
    * interval predicate rides the join as a post-match filter, never a
    * cartesian. Streaming state per user is bounded by watermark + withinUs,
    * not by stream length. */
  def funnel(events: DataFrame, leadType: String, followType: String,
      withinUs: Long = 30L * 60 * 1000000, watermark: String = "1 hour"): DataFrame = {
    val lead = events.filter(col("event_type") === leadType)
      .select(col("user_id"), col("event_id").as("lead_id"), col("ts").as("lead_ts"))
      .withWatermark("lead_ts", watermark)
    val follow = events.filter(col("event_type") === followType)
      .select(col("user_id").as("follow_user"), col("event_id").as("follow_id"),
        col("ts").as("follow_ts"))
      .withWatermark("follow_ts", watermark)
    lead.join(follow,
        col("user_id") === col("follow_user") &&
          col("follow_ts") >= col("lead_ts") &&
          col("follow_ts") <= col("lead_ts") + expr(s"INTERVAL $withinUs MICROSECOND"))
      .select(col("user_id"), col("lead_id"), col("follow_id"),
        (unix_micros(col("follow_ts")) - unix_micros(col("lead_ts"))).as("delay_us"))
  }
}
