package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval join without the nested-loop trap.
  *
  * Spark plans a bare `ts BETWEEN start AND end` join as a broadcast
  * nested loop (or a cartesian when neither side broadcasts) — every
  * point × every interval, the classic non-equi-join scale killer. The
  * bucketized form aligns both sides on fixed-width time buckets: each
  * interval EXPLODES to the buckets it covers (`sequence`), each point
  * maps to exactly ONE bucket, and the join becomes a plain hash
  * equi-join on (key?, bucket) with the exact BETWEEN predicate as a
  * join-condition filter. Each qualifying pair appears exactly once —
  * the point's single bucket is covered at most once by a given
  * interval's explode — so no post-join dedup is needed.
  *
  * Scale: the shuffle is keyed by (key, bucket), so cost is
  * |points| + Σ interval spans/bucketWidth — linear, tunable by
  * `bucketMicros` (wider buckets ⇒ fewer replicas of long intervals but
  * more non-matching pairs filtered post-join; set it near the typical
  * interval length). The same shape Flink/KDB range joins and Spark's own
  * `sequence`-bucketed geospatial joins use — composition of built-ins,
  * no custom strategy needed (SURVEY preference order (a)).
  */
object IntervalJoin {

  /** Join `points` (timestamp `tsCol`) to `intervals`
    * ([`startCol`, `endCol`] inclusive, timestamps) on containment,
    * optionally co-keyed by `keyCols` (equi-columns present on both
    * sides — e.g. user_id — which also bound the bucket fan-out to
    * per-key traffic). Returns the joined row set (point columns +
    * interval columns, key columns once). */
  def pointInInterval(points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketMicros: Long, keyCols: Seq[String] = Nil): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive, got $bucketMicros")
    def bucketOf(c: Column): Column = floor(unix_micros(c) / bucketMicros)
    // subquery aliases + qualified names: the interval side is routinely
    // DERIVED from the point side (e.g. per-user windows aggregated from
    // the same events), and unqualified p(k) === iv(k) would trip Spark's
    // ambiguous-self-join detection
    val ptsCols = points.columns.toSeq
    val ivCols = intervals.columns.toSeq.filterNot(keyCols.contains)
    val p = points.withColumn("__bucket", bucketOf(col(tsCol))).alias("__pts")
    val iv = intervals
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
      .alias("__iv")
    val cond = (keyCols :+ "__bucket")
      .map(k => col(s"__pts.$k") === col(s"__iv.$k")).reduce(_ && _) &&
      col(s"__pts.$tsCol") >= col(s"__iv.$startCol") &&
      col(s"__pts.$tsCol") <= col(s"__iv.$endCol")
    p.join(iv, cond)
      .select((ptsCols.map(c => col(s"__pts.$c")) ++
        ivCols.map(c => col(s"__iv.$c"))): _*)
  }

  /** The STREAMABLE point-in-interval join: same bucketized equi-join
    * shape as [[pointInInterval]], restricted to the bounded-span
    * subclass (`end - start ≤ maxSpanUs`; longer intervals are CLIPPED at
    * `start + maxSpanUs`) — the restriction that makes unbounded streams
    * joinable with bounded state, exactly as Flink's interval join
    * requires relative bounds.
    *
    * One implementation serves both engines (the [[graft.streaming
    * .EventStream.funnel]] pattern): on streaming frames both sides carry
    * a watermark and the condition `ts ∈ [start, start + maxSpan]` is the
    * funnel shape the state store can evict on — an interval row is
    * droppable once the point watermark passes `start + maxSpan`, a point
    * once the interval watermark passes its `ts`; state per side is
    * bounded by watermark delay + maxSpan, never stream length. The
    * bucket column keeps the join EQUI-KEYED even with no `keyCols`, so
    * the streaming plan is a symmetric hash join and the batch plan a
    * plain hash join — the nested-loop trap is absent from both. On batch
    * frames Catalyst's EliminateEventTimeWatermark drops the watermark
    * nodes and this is [[pointInInterval]] with the span clip — which is
    * how a batch twin pins the exact pairs the stream must emit. */
  def pointInIntervalBounded(points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketMicros: Long, maxSpanUs: Long,
      keyCols: Seq[String] = Nil, watermark: String = "1 hour"): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive, got $bucketMicros")
    require(maxSpanUs > 0, s"maxSpanUs must be positive, got $maxSpanUs")
    def bucketOf(c: Column): Column = floor(unix_micros(c) / bucketMicros)
    val ptsCols = points.columns.toSeq
    val ivCols = intervals.columns.toSeq.filterNot(keyCols.contains)
    val p = points.withWatermark(tsCol, watermark)
      .withColumn("__bucket", bucketOf(col(tsCol))).alias("__pts")
    val span = expr(s"INTERVAL $maxSpanUs MICROSECOND")
    val capped = least(col(endCol), col(startCol) + span)
    val iv = intervals.withWatermark(startCol, watermark)
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(startCol)), bucketOf(capped))))
      .alias("__iv")
    val cond = (keyCols :+ "__bucket")
      .map(k => col(s"__pts.$k") === col(s"__iv.$k")).reduce(_ && _) &&
      col(s"__pts.$tsCol") >= col(s"__iv.$startCol") &&
      col(s"__pts.$tsCol") <= col(s"__iv.$endCol") &&
      col(s"__pts.$tsCol") <= col(s"__iv.$startCol") + span
    p.join(iv, cond)
      .select((ptsCols.map(c => col(s"__pts.$c")) ++
        ivCols.map(c => col(s"__iv.$c"))): _*)
  }
}
