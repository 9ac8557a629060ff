package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Registry.table

/** Event-stream analytics over `events` — the batch formulations of the
  * streaming operators (tumbling windows, sessionization, semi-structured
  * extraction). The live Structured Streaming path (watermarks, append mode,
  * session_window state) is exercised in the test suite; these queries pin
  * the SEMANTICS against the oracle so the streaming versions have a golden
  * batch answer to agree with.
  */
object EventQueries {

  val queries: Seq[Q] = Seq(

    // ---- Tumbling time-window aggregation ---------------------------------
    // Scale: group key is (hour, type) — partial agg collapses before the
    // shuffle; with streaming this is the watermarked windowed agg.
    Q("q40_event_window", (s, dir) => {
      val e = table(s, dir, "events")
      e.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
    }, Some("""
      SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        MIN(value) AS min_value, MAX(value) AS max_value
      FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) GROUP BY 1, 2"""), headline = true),

    // ---- Sessionization (gaps-and-islands) --------------------------------
    // 30-minute inactivity gap; integer microsecond arithmetic only (no FP).
    // Scale: one shuffle on user_id; in-partition sort by (ts, event_id);
    // the streaming twin is session_window/flatMapGroupsWithState.
    Q("q41_sessionize", (s, dir) => {
      val e = table(s, dir, "events")
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val gapUs = 30L * 60 * 1000000
      val sessions = e
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sessions.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("dur_us"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          max(col("dur_us")).as("max_session_us"),
          sum(col("dur_us")).as("total_session_us"))
    }, Some("""
      SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n_events) AS BIGINT) AS n_events,
        MAX(dur_us) AS max_session_us, CAST(SUM(dur_us) AS BIGINT) AS total_session_us
      FROM (
        SELECT user_id, session_id, COUNT(*) AS n_events,
          MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS dur_us
        FROM (
          SELECT user_id, ts,
            SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM (
            SELECT user_id, ts, event_id,
              CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
                   THEN 1 ELSE 0 END AS new_session
            FROM (
              SELECT user_id, ts, event_id,
                LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS prev_us
              FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events))))
        GROUP BY user_id, session_id)
      GROUP BY user_id""")),

    // ---- Semi-structured extraction ---------------------------------------
    // props is a JSON-ish string; the regex form keeps both engines on the
    // exact same parse (Spark also offers from_json — tested in the suite).
    Q("q42_json_extract", (s, dir) => {
      val e = table(s, dir, "events")
      e.withColumn("k", regexp_extract(col("props"), "\"k\":\\s*(-?[0-9]+)", 1).cast("long"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          countDistinct(col("k")).as("n_distinct_k"))
    }, Some("""
      SELECT k % 10 AS k_bucket, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
        COUNT(DISTINCT k) AS n_distinct_k
      FROM (SELECT CAST(NULLIF(regexp_extract(props, '"k":\s*(-?[0-9]+)', 1), '') AS BIGINT) AS k
            FROM events)
      GROUP BY 1""")),

    // ---- Stream-stream interval join (funnel), batch-pinned ---------------
    // view→click within 30 min per user, through the SAME EventStream.funnel
    // the streaming path runs (watermark nodes eliminate on batch). Delay
    // arithmetic is integer µs on both engines — no FP, no ns/µs skew (both
    // sides read ts µs-truncated). Scale: one shuffle by user_id each side;
    // streaming state bounded by watermark + interval, not stream length.
    Q("q94_event_funnel", (s, dir) => {
      graft.streaming.EventStream.funnel(
        table(s, dir, "events"), "view", "click")
    }, Some("""
      SELECT v.user_id, v.event_id AS lead_id, c.event_id AS follow_id,
        epoch_us(c.ts) - epoch_us(v.ts) AS delay_us
      FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) v
      JOIN (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) c
        ON v.user_id = c.user_id
       AND v.event_type = 'view' AND c.event_type = 'click'
       AND epoch_us(c.ts) >= epoch_us(v.ts)
       AND epoch_us(c.ts) - epoch_us(v.ts) <= 1800000000""")),

    // ---- Running / moving window over an ordered stream -------------------
    // Per-user running event count + moving 5-event average value.
    Q("q43_running_window", (s, dir) => {
      val e = table(s, dir, "events")
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      e.filter(col("user_id") < 20)
        .withColumn("running_n", count(lit(1)).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("moving_sum", sum(col("value").cast("decimal(18,2)")).over(
          byUser.rowsBetween(-4, Window.currentRow)).cast("double"))
        .select(col("event_id"), col("user_id"), col("running_n"), col("moving_sum"))
    }, Some("""
      SELECT event_id, user_id,
        COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
          ORDER BY ts, event_id
          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum
      FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) WHERE user_id < 20""")),

    // ---- Cohort retention matrix ------------------------------------------
    // The classic product-analytics workload: users cohorted by first-seen
    // week, retention = distinct users active k weeks after their cohort
    // week. Scale: two aggregations keyed on user_id (first-seen + distinct
    // active weeks — Spark plans both off one exchange when AQE reuses it),
    // a user-keyed join, then a tiny (cohort, offset) rollup. Week
    // truncation is Monday-based in both engines; offsets are integer-day
    // div arithmetic — no FP anywhere.
    Q("q107_cohort_retention", (s, dir) => {
      val e = table(s, dir, "events")
      val firsts = e.groupBy(col("user_id"))
        .agg(min(date_trunc("week", col("ts"))).as("cohort_week"))
      val active = e
        .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
        .distinct()
      active.join(firsts, Seq("user_id"))
        .withColumn("week_no",
          expr("datediff(week, cohort_week) div 7").cast("long"))
        .groupBy(col("cohort_week"), col("week_no"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }, Some("""
      WITH ev AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      f AS (
        SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
        FROM ev GROUP BY user_id),
      a AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM ev)
      SELECT f.cohort_week,
        CAST(date_diff('day', f.cohort_week, a.week) // 7 AS BIGINT) AS week_no,
        COUNT(DISTINCT a.user_id) AS n_users
      FROM a JOIN f USING (user_id)
      GROUP BY 1, 2""")),

    // ---- Time-RANGE window frames -----------------------------------------
    // q43 gates ROWS frames; this gates VALUE-range frames over event time
    // ("sum of the trailing hour per user") — a different window executor
    // path (frame bounds move by timestamp arithmetic, not row counts), and
    // the frame every rate-limit/rolling-metric query needs. RANGE frames
    // are tie-insensitive by construction (equal timestamps are all in
    // frame), so the gate is exact without tie-break gymnastics. Scale: one
    // shuffle on user_id + in-partition sort — the q41 shape.
    Q("q108_time_range_window", (s, dir) => {
      table(s, dir, "events").createOrReplaceTempView("events_v")
      s.sql("""
        SELECT user_id, event_id,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h,
          COUNT(*) OVER w AS n_1h
        FROM events_v
        WHERE user_id < 10
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""")
    }, Some("""
      SELECT user_id, event_id,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h,
        COUNT(*) OVER w AS n_1h
      FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
      WHERE user_id < 10
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""")),

    // ---- Bucketized point-in-interval join --------------------------------
    // Each user's first-30-minutes window joined back to their event
    // stream. A bare BETWEEN join is a nested-loop plan (the non-equi
    // scale killer); IntervalJoin aligns both sides on 10-minute buckets
    // — intervals explode to covered buckets, each point owns ONE bucket
    // — so the plan is a plain hash equi-join on (user_id, bucket) with
    // the exact containment as a join-condition filter, each pair emitted
    // once by construction. The oracle runs the naive BETWEEN join: two
    // routes, one answer (the bucketing is invisible in the result).
    Q("q121_interval_join", (s, dir) => {
      val ev = table(s, dir, "events")
      val iv = ev.groupBy(col("user_id"))
        .agg(min(col("ts")).as("w_start"))
        .withColumn("w_end", col("w_start") + expr("INTERVAL 30 MINUTES"))
      graft.operators.IntervalJoin.pointInInterval(
          ev.select(col("event_id"), col("user_id"), col("ts")), "ts",
          iv, "w_start", "w_end",
          bucketMicros = 10L * 60 * 1000000, keyCols = Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_in_window"),
          sum(col("event_id")).as("sum_ids"))
    }, Some("""
      WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                 FROM events),
      iv AS (SELECT user_id, MIN(ts) AS w_start,
               MIN(ts) + INTERVAL 30 MINUTE AS w_end
             FROM e GROUP BY user_id)
      SELECT e.user_id, COUNT(*) AS n_in_window,
        CAST(SUM(event_id) AS BIGINT) AS sum_ids
      FROM e JOIN iv ON e.user_id = iv.user_id
        AND e.ts >= iv.w_start AND e.ts <= iv.w_end
      GROUP BY e.user_id""")),

    // ---- Bounded-span interval join (the STREAMABLE subclass) -------------
    // q121's bucketized shape restricted to spans ≤ maxSpan (20 min here,
    // clipping the 30-min windows — the clip is live in this gate, not a
    // no-op): the restriction that lets the SAME operator run as a
    // watermarked stream-stream symmetric hash join with state bounded by
    // watermark + span (IntervalJoinSpec proves streamed == batch and the
    // eviction). On this batch frame Catalyst eliminates the watermark
    // nodes and the oracle is the naive BETWEEN join against the clipped
    // interval end — pinning that bounding changes STATE semantics, not
    // join semantics.
    Q("q122_interval_join_bounded", (s, dir) => {
      val ev = table(s, dir, "events")
      val iv = ev.groupBy(col("user_id"))
        .agg(min(col("ts")).as("w_start"))
        .withColumn("w_end", col("w_start") + expr("INTERVAL 30 MINUTES"))
      graft.operators.IntervalJoin.pointInIntervalBounded(
          ev.select(col("event_id"), col("user_id"), col("ts")), "ts",
          iv, "w_start", "w_end",
          bucketMicros = 10L * 60 * 1000000,
          maxSpanUs = 20L * 60 * 1000000,
          keyCols = Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_in_window"),
          sum(col("event_id")).as("sum_ids"))
    }, Some("""
      WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                 FROM events),
      iv AS (SELECT user_id, MIN(ts) AS w_start,
               LEAST(MIN(ts) + INTERVAL 30 MINUTE,
                     MIN(ts) + INTERVAL 20 MINUTE) AS w_end
             FROM e GROUP BY user_id)
      SELECT e.user_id, COUNT(*) AS n_in_window,
        CAST(SUM(event_id) AS BIGINT) AS sum_ids
      FROM e JOIN iv ON e.user_id = iv.user_id
        AND e.ts >= iv.w_start AND e.ts <= iv.w_end
      GROUP BY e.user_id"""))
  )
}
