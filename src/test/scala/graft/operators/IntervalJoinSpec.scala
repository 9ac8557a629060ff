package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.Registry

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Registry.table(spark, sf0001, "events")

  private def naive(points: org.apache.spark.sql.DataFrame,
      iv: org.apache.spark.sql.DataFrame) =
    points.alias("p").join(iv.alias("i"),
      col("p.user_id") === col("i.user_id") &&
        col("p.ts") >= col("i.w_start") && col("p.ts") <= col("i.w_end"))
      .select(col("p.user_id"), col("p.event_id"), col("i.w_start"))

  private lazy val intervals = events.groupBy(col("user_id"))
    .agg(min(col("ts")).as("w_start"))
    .withColumn("w_end", col("w_start") + expr("INTERVAL 30 MINUTES"))

  test("bucketized == naive BETWEEN join, at several bucket widths") {
    val expected = naive(events, intervals)
      .as[(Long, Long, java.sql.Timestamp)].collect().toSet
    assert(expected.nonEmpty)
    Seq(60L, 600L, 3600L).foreach { secs =>
      val got = IntervalJoin.pointInInterval(
          events.select(col("event_id"), col("user_id"), col("ts")), "ts",
          intervals, "w_start", "w_end",
          bucketMicros = secs * 1000000, keyCols = Seq("user_id"))
        .select(col("user_id"), col("event_id"), col("w_start"))
        .as[(Long, Long, java.sql.Timestamp)].collect()
      // exactly once per qualifying pair — set equality AND no duplicates
      assert(got.length === got.toSet.size, s"duplicate pairs at bucket=${secs}s")
      assert(got.toSet === expected, s"divergence at bucket=${secs}s")
    }
  }

  test("boundaries are inclusive on both ends") {
    val pts = Seq((1L, 100L, "2024-01-01 00:00:00"),
      (2L, 100L, "2024-01-01 00:30:00"), (3L, 100L, "2024-01-01 00:30:00.000001"))
      .toDF("event_id", "user_id", "s")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val iv = Seq((100L, "2024-01-01 00:00:00", "2024-01-01 00:30:00"))
      .toDF("user_id", "s0", "s1")
      .withColumn("w_start", to_timestamp(col("s0")))
      .withColumn("w_end", to_timestamp(col("s1"))).select("user_id", "w_start", "w_end")
    val got = IntervalJoin.pointInInterval(pts, "ts", iv, "w_start", "w_end",
        bucketMicros = 600L * 1000000, keyCols = Seq("user_id"))
      .select("event_id").as[Long].collect().toSet
    assert(got === Set(1L, 2L)) // start and end included, 1µs past excluded
  }

  test("bounded == unbounded when every interval fits maxSpan; long spans clip") {
    // the sf fixture's intervals are exactly 30 minutes — a 30-minute
    // maxSpan covers them all, so bounded must reproduce pointInInterval
    val pts = events.select(col("event_id"), col("user_id"), col("ts"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id"), col("event_id"), col("w_start"))
        .as[(Long, Long, java.sql.Timestamp)].collect().toSet
    val unbounded = canon(IntervalJoin.pointInInterval(pts, "ts",
      intervals, "w_start", "w_end",
      bucketMicros = 600L * 1000000, keyCols = Seq("user_id")))
    val bounded = canon(IntervalJoin.pointInIntervalBounded(pts, "ts",
      intervals, "w_start", "w_end",
      bucketMicros = 600L * 1000000, maxSpanUs = 30L * 60 * 1000000,
      keyCols = Seq("user_id")))
    assert(bounded === unbounded)
    assert(bounded.nonEmpty)
    // a tighter bound clips to EXACTLY the pairs within maxSpan of start
    val spanUs = 5L * 60 * 1000000
    val clipped = canon(IntervalJoin.pointInIntervalBounded(pts, "ts",
      intervals, "w_start", "w_end",
      bucketMicros = 600L * 1000000, maxSpanUs = spanUs,
      keyCols = Seq("user_id")))
    val expectClipped = canon(naive(events, intervals
      .withColumn("w_end",
        least(col("w_end"), col("w_start") + expr(s"INTERVAL $spanUs MICROSECOND")))))
    assert(clipped === expectClipped)
    assert(clipped.subsetOf(unbounded))
  }

  test("streaming interval join: streamed == batch twin, equi-keyed bounded state") {
    import java.sql.Timestamp
    import java.nio.file.Files
    def t(s: String) = Timestamp.valueOf(s)
    val ptRows = Seq(
      (1L, 10L, t("2024-01-01 10:00:30")), // inside u10's interval
      (2L, 10L, t("2024-01-01 10:14:00")), // inside (near end)
      (3L, 10L, t("2024-01-01 10:20:00")), // outside (after end)
      (4L, 20L, t("2024-01-01 10:05:00")), // u20: no interval → no match
      (5L, 30L, t("2024-01-01 11:00:00")), // u30 second window
      (6L, 30L, t("2024-01-01 10:00:00"))) // u30 before its window
    val ivRows = Seq(
      (10L, t("2024-01-01 10:00:00"), t("2024-01-01 10:15:00")),
      (30L, t("2024-01-01 10:55:00"), t("2024-01-01 11:10:00")))
    val ptsB = ptRows.toDF("event_id", "user_id", "ts")
    val ivB = ivRows.toDF("user_id", "w_start", "w_end")
    def join(p: org.apache.spark.sql.DataFrame,
        iv: org.apache.spark.sql.DataFrame) =
      IntervalJoin.pointInIntervalBounded(p, "ts", iv, "w_start", "w_end",
        bucketMicros = 300L * 1000000, maxSpanUs = 20L * 60 * 1000000,
        keyCols = Seq("user_id"), watermark = "10 minutes")
    val batch = join(ptsB, ivB)
      .select("user_id", "event_id", "w_start")
      .as[(Long, Long, Timestamp)].collect().toSet
    assert(batch === Set(
      (10L, 1L, t("2024-01-01 10:00:00")), (10L, 2L, t("2024-01-01 10:00:00")),
      (30L, 5L, t("2024-01-01 10:55:00"))))
    // the streaming twin over file sources, drained with processAllAvailable
    val pDir = Files.createTempDirectory("graft-ivj-p").toString
    val iDir = Files.createTempDirectory("graft-ivj-i").toString
    ptsB.coalesce(1).write.mode("overwrite").parquet(pDir)
    ivB.coalesce(1).write.mode("overwrite").parquet(iDir)
    val pS = spark.readStream.schema(ptsB.schema).parquet(pDir)
    val iS = spark.readStream.schema(ivB.schema).parquet(iDir)
    val q = join(pS, iS).writeStream
      .format("memory").queryName("ivj").outputMode("append").start()
    try {
      q.processAllAvailable()
      // late batch far in the future pushes the watermark past everything
      // above; the NEXT batch evicts the now-unmatchable state
      Seq((7L, 10L, t("2024-03-01 00:00:00")))
        .toDF("event_id", "user_id", "ts")
        .coalesce(1).write.mode("append").parquet(pDir)
      Seq((10L, t("2024-03-01 00:00:10"), t("2024-03-01 00:00:20")))
        .toDF("user_id", "w_start", "w_end")
        .coalesce(1).write.mode("append").parquet(iDir)
      q.processAllAvailable()
      Seq((8L, 10L, t("2024-03-01 00:00:15")))
        .toDF("event_id", "user_id", "ts")
        .coalesce(1).write.mode("append").parquet(pDir)
      q.processAllAvailable()
      val streamed = spark.table("ivj")
        .select("user_id", "event_id", "w_start")
        .as[(Long, Long, Timestamp)].collect().toSet
      // january pairs == the batch twin; the march rows add their own pair
      // (event 7 precedes the march interval — a negative case both ways)
      assert(streamed === batch + ((10L, 8L, t("2024-03-01 00:00:10"))))
      // the join ran as a watermarked symmetric hash join (equi-keyed via
      // the bucket even though keyCols alone would qualify) and EVICTED
      // the january state: bounded by watermark + span, not stream length
      val lastPlan = q.asInstanceOf[
          org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(lastPlan.contains("StreamingSymmetricHashJoin"), lastPlan)
      assert(!lastPlan.contains("BroadcastNestedLoopJoin") &&
        !lastPlan.contains("CartesianProduct"), lastPlan)
      val state = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      val fed = 8L + 3L // every point + interval row ever sent
      assert(state < fed, s"state $state did not evict (fed $fed rows)")
    } finally q.stop()
  }

  test("the plan is a hash equi-join — no nested loop, no cartesian") {
    val df = IntervalJoin.pointInInterval(
      events.select(col("event_id"), col("user_id"), col("ts")), "ts",
      intervals, "w_start", "w_end",
      bucketMicros = 600L * 1000000, keyCols = Seq("user_id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"non-equi join shape leaked into the plan:\n$plan")
  }
}
