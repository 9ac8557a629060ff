package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.Registry

/** The streaming aggregates must agree with their oracle-pinned batch twins
  * when the stream is fully drained (complete/update modes over a finite
  * backlog). */
class EventStreamSpec extends SparkSpec {

  // stage the events table (µs-truncated) as a parquet "stream input" dir
  private lazy val streamDir: String = {
    val d = Files.createTempDirectory("graft-events-stream").toString
    Registry.table(spark, sf0001, "events").write.mode("overwrite").parquet(d)
    d
  }

  private lazy val batchEvents = spark.read.parquet(streamDir)

  test("watermarked hourly window agg matches the batch aggregation") {
    val stream = EventStream.read(spark, streamDir, batchEvents.schema)
    val q = EventStream.hourlyStats(stream).writeStream
      .format("memory").queryName("hourly").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("hourly")
      .orderBy("hour", "event_type").collect().toSeq
    val batch = EventStream.hourlyStats(batchEvents.withColumn("dummy", lit(1)))
      .orderBy("hour", "event_type").collect().toSeq
    // batch reuse of the same streaming transform (no watermark effect on
    // complete data)
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("watermark drops late data in append mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val agg = EventStream.hourlyStats(events, watermark = "30 minutes")
    val q = agg.writeStream.format("memory").queryName("late_test")
      .outputMode(OutputMode.Append).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      input.addData((t("2024-01-01 10:05:00"), "click", 1.0))
      q.processAllAvailable()
      // advance the watermark far past hour 10 (12:00 - 30min > 11:00)
      input.addData((t("2024-01-01 12:00:00"), "click", 1.0))
      q.processAllAvailable()
      // hour-10 window is now closed and emitted; a late hour-10 event must be dropped
      input.addData((t("2024-01-01 10:10:00"), "click", 99.0))
      // push the watermark again so everything pending flushes
      input.addData((t("2024-01-01 14:00:00"), "click", 1.0))
      q.processAllAvailable()
      val hour10 = spark.table("late_test")
        .filter(col("hour") === t("2024-01-01 10:00:00")).collect()
      assert(hour10.length === 1)
      assert(hour10.head.getAs[Long]("n") === 1L) // the late 99.0 event was dropped
    } finally q.stop()
  }

  test("streaming dedup drops duplicate event_ids within the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("event_id", "ts", "value")
    val q = EventStream.deduped(events).writeStream
      .format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      input.addData((1L, t("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // the same event redelivered in a later micro-batch
      input.addData((1L, t("2024-01-01 10:00:00"), 1.0),
        (2L, t("2024-01-01 10:01:00"), 2.0))
      q.processAllAvailable()
      val got = spark.table("dedup_stream").select("event_id").as[Long]
        .collect().sorted.toSeq
      assert(got === Seq(1L, 2L)) // id 1 appears once despite redelivery
    } finally q.stop()
  }

  test("custom state: spikes emit per event against the running baseline") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val q = EventStream.spikes(events, factor = 3.0, minHistory = 3)
      .writeStream.format("memory").queryName("spikes")
      .outputMode("append").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // batch 1: baseline builds (history < 3 → nothing can emit)
      input.addData((1L, t("2024-01-01 10:00:00"), 10.0),
        (1L, t("2024-01-01 10:01:00"), 10.0),
        (1L, t("2024-01-01 10:02:00"), 10.0))
      q.processAllAvailable()
      // batch 2: state carried across batches — 100 > 3×mean(10) spikes,
      // 11 does not; the spike inflates the baseline for later events
      input.addData((1L, t("2024-01-01 10:03:00"), 11.0),
        (1L, t("2024-01-01 10:04:00"), 100.0),
        (2L, t("2024-01-01 10:04:00"), 500.0)) // user 2 has no history → silent
      q.processAllAvailable()
      val got = spark.table("spikes")
        .as[EventStream.Spike].collect().toSeq
      assert(got.map(s => (s.user_id, s.value)) === Seq((1L, 100.0)))
      assert(math.abs(got.head.baseline - 10.25) < 1e-9) // mean(10,10,10,11)
    } finally q.stop()
  }

  test("session windows: gap merge matches batch sessionization counts") {
    val stream = EventStream.read(spark, streamDir, batchEvents.schema)
    val q = EventStream.sessions(stream).writeStream
      .format("memory").queryName("sessions").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("sessions")
    // must agree with the oracle-pinned batch sessionization (q41): same
    // total session count and per-user counts
    val batchSessions = Registry.byName("q41_sessionize").run(spark, sf0001)
      .select(col("user_id"), col("n_sessions"))
    val streamedCounts = streamed.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"))
    val mismatches = streamedCounts.as("a")
      .join(batchSessions.as("b"), "user_id")
      .filter(col("a.n_sessions") =!= col("b.n_sessions"))
      .count()
    assert(mismatches === 0)
    assert(streamed.count() > 0)
  }

  test("stream-stream funnel join matches the oracle-pinned batch twin") {
    // the streaming path: watermarked stream-stream inner join over the
    // file-backed event stream, drained fully (inner matches emit eagerly,
    // so AvailableNow + append yields every pair without a watermark push)
    val stream = EventStream.read(spark, streamDir, batchEvents.schema)
    val q = EventStream.funnel(stream, "view", "click").writeStream
      .format("memory").queryName("funnel").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("funnel")
      .orderBy("user_id", "lead_id", "follow_id").collect().toSeq
    // the batch twin is the SAME funnel call on the same rows — the path
    // q94 pins against DuckDB — so streaming must reproduce it exactly
    val batch = EventStream.funnel(batchEvents, "view", "click")
      .orderBy("user_id", "lead_id", "follow_id").collect().toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // every emitted delay respects the interval bound
    assert(streamed.forall { r =>
      val d = r.getAs[Long]("delay_us"); d >= 0 && d <= 30L * 60 * 1000000
    })
  }

  test("funnel restart: join state recovers from checkpoint, exactly-once") {
    import java.sql.Timestamp
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val in = Files.createTempDirectory("graft-funnel-in").toString
    val out = Files.createTempDirectory("graft-funnel-out").toString
    val ckpt = Files.createTempDirectory("graft-funnel-ckpt").toString
    def t(s: String) = Timestamp.valueOf(s)
    def drop(name: String, rows: Seq[(Timestamp, Long, Long, String)]): Unit =
      rows.toDF("ts", "user_id", "event_id", "event_type")
        .coalesce(1).write.parquet(s"$in/$name")
    // batch 1: user 1 completes a pair; user 2's view has NO click yet —
    // it must survive in the join state store across the restart
    drop("b1", Seq(
      (t("2024-01-01 10:00:00"), 1L, 100L, "view"),
      (t("2024-01-01 10:05:00"), 1L, 101L, "click"),
      (t("2024-01-01 10:10:00"), 2L, 200L, "view")))
    val schema = spark.read.parquet(s"$in/b1").schema
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "16").parquet(s"$in/*")
      val q = EventStream.funnel(stream, "view", "click").writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000); q.stop()
    }
    runOnce()
    def pairs() = spark.read.parquet(out)
      .select("lead_id", "follow_id").as[(Long, Long)].collect().toSeq.sorted
    assert(pairs() === Seq((100L, 101L)))
    // restart with nothing new: checkpoint prevents any reprocessing
    runOnce()
    assert(pairs() === Seq((100L, 101L)))
    // batch 2 arrives AFTER a full stop: user 2's click (matches the
    // view buffered before the restart — state-store recovery) and a
    // complete pair for user 3
    drop("b2", Seq(
      (t("2024-01-01 10:20:00"), 2L, 201L, "click"),
      (t("2024-01-01 10:30:00"), 3L, 300L, "view"),
      (t("2024-01-01 10:31:00"), 3L, 301L, "click")))
    runOnce()
    assert(pairs() === Seq((100L, 101L), (200L, 201L), (300L, 301L)))
  }

  test("funnel state is droppable: late lead beyond the watermark is dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    // two independent sources so each side's watermark advances explicitly
    val leads = MemoryStream[(Long, Long, Timestamp)]
    val follows = MemoryStream[(Long, Long, Timestamp)]
    def shape(df: org.apache.spark.sql.DataFrame, ty: String) =
      df.toDF("user_id", "event_id", "ts").withColumn("event_type", lit(ty))
    val events = shape(leads.toDF(), "view")
      .unionByName(shape(follows.toDF(), "click"))
    val q = EventStream.funnel(events, "view", "click",
        watermark = "10 minutes").writeStream
      .format("memory").queryName("funnel_late").outputMode("append").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      leads.addData((1L, 100L, t("2024-01-01 10:00:00")))
      follows.addData((1L, 200L, t("2024-01-01 10:05:00")))
      q.processAllAvailable()
      // advance BOTH watermarks far past 10:00 + 30min + 10min slack
      leads.addData((9L, 101L, t("2024-01-01 12:00:00")))
      follows.addData((9L, 201L, t("2024-01-01 12:00:01")))
      q.processAllAvailable()
      // a lead older than the watermark arrives: its state was evicted —
      // a click that would have matched it must produce nothing
      leads.addData((2L, 102L, t("2024-01-01 10:00:00")))
      follows.addData((2L, 202L, t("2024-01-01 10:05:00")))
      q.processAllAvailable()
      val got = spark.table("funnel_late")
        .select("lead_id", "follow_id").as[(Long, Long)].collect().toSet
      assert(got.contains((100L, 200L)))  // in-watermark pair matched
      assert(got.contains((101L, 201L)))  // watermark-advancing pair matched
      assert(!got.exists(_._1 == 102L))   // late lead's pair suppressed
    } finally q.stop()
  }
}
