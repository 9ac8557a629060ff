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
