package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.CommittedTable

/** Incrementally-maintained aggregate VIEW over a committed table — the
  * materialized-view closure of the CDF loop: `COUNT(*)`, `SUM`, `MIN`,
  * `MAX` (and AVG, derived) per group, kept current by REPLAYING
  * [[ChangeFeed.readCdf]] batches instead of rescanning the source.
  *
  * COUNT/SUM are exact because CDF rows are SIGNED: an insert or
  * update_postimage contributes `(+1, +value)`, an update_preimage or
  * delete contributes `(−1, −value)` — an in-group update nets to the
  * value change, a row MOVING between groups debits its old group and
  * credits its new one, and a delete debits cleanly. AVG follows at read
  * time ([[readView]]: `sum_value / n`).
  *
  * MIN/MAX are NOT invertible under retraction, so they fold
  * asymmetrically: inserts/postimages only ever EXTEND the extremes
  * (`least`/`greatest` — exact); a retraction whose value touches a
  * candidate extreme triggers a PER-GROUP RESCAN of the source —
  * manifest-pruned when the source is partitioned by the group column,
  * a pushed-down filter scan otherwise. The rescan reads the source's
  * CURRENT state, which may be ahead of the batch's generation; that is
  * convergent (later batches' inserts fold idempotently via
  * least/greatest, later retractions re-trigger the rescan), and under
  * the normal AvailableNow drain the batch's last generation IS the
  * current state. Retraction values strictly inside the (min, max)
  * candidates rescan nothing.
  *
  * Idempotence (exactly-once EFFECT under at-least-once delivery): each
  * group row carries `applied_gen`, the newest generation folded into
  * it; a replayed batch's rows with `_change_gen <= applied_gen` are
  * filtered out per group BEFORE the delta aggregation, so re-applying a
  * batch (foreachBatch retry, stream restart before the sink commit) is
  * a no-op. The view itself is a [[CommittedTable]] partitioned by the
  * group column (atomic publish, time travel, retention all inherited).
  *
  * Scale shape: the delta aggregation touches only the BATCH (bounded by
  * what the writer rewrote); the read-modify-write touches only the
  * affected groups' partitions via the manifest-pruned read; rescans
  * touch only retraction-hit groups. Nothing is proportional to the
  * source-table or view size — including on the DRIVER: the
  * touched-group and rescan-group value lists (which feed manifest
  * pruning) are collected only up to [[MaxGroupValueList]] values
  * ([[boundedValues]] — a LIMIT-bounded probe, never the full set);
  * above that the fold switches to a distributed LEFT SEMI join of the
  * view / source against the batch's group keys, so a per-user view
  * over a 100 TB corpus cannot OOM the driver. (The publish itself
  * still holds the touched PARTITION NAMES as manifest entries —
  * that is metadata, the same O(touched-partitions) every
  * Delta/Iceberg-shaped commit carries.) */
object IncrementalAgg {

  /** Cardinality ceiling for driver-side group-value lists: at or below
    * it the fold prunes the view/source read by explicit partition
    * values (manifest-metadata pruning, zero listings of untouched
    * groups); above it the value list is never materialized and a
    * semi-join does the filtering instead. 10k strings is comfortably
    * driver-safe; a view with more touched groups per batch is reading
    * most of its partitions anyway, so the lost prune is cheap. */
  val MaxGroupValueList = 10000

  /** Collect at most `max` values of `df`'s single string column —
    * `None` when the cardinality exceeds `max`. The probe is
    * `LIMIT max+1`, so the driver materializes max+1 rows in the
    * worst case regardless of the true cardinality. */
  private[streaming] def boundedValues(df: DataFrame, max: Int): Option[Seq[String]] = {
    val sample = df.limit(max + 1).collect().map(_.getString(0))
    if (sample.length <= max) Some(sample.toIndexedSeq) else None
  }

  /** Bootstrap the view at `dst` from the CURRENT contents of the source
    * committed table: one full aggregation, stamped with the source's
    * current generation so the paired [[apply]] stream (started at the
    * NEXT generation) continues seamlessly. Returns that generation —
    * pass it to [[ChangeFeed.readCdf]] as `startingGeneration = gen+1`,
    * or stream from "earliest" and let idempotence skip the prefix. */
  def init(spark: SparkSession, src: String, dst: String,
      groupCol: String, valueCol: String): Long = {
    val table = new org.apache.hadoop.fs.Path(src)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gen = CommittedTable.readManifestRoot(fs, table).map(_.gen).getOrElse(
      throw new java.io.IOException(s"no committed table at $src"))
    // the group value doubles as the view's PARTITION value — string-typed
    // so batch-side joins and manifest pruning agree on the encoding.
    // Every measure is DOUBLE by contract: apply()'s fold arithmetic
    // produces doubles, and a bootstrap that wrote int64 for an integral
    // valueCol would leave untouched partitions unreadable after the
    // first fold (parquet cannot serve INT64 as the view's probed
    // DoubleType)
    val v = col(valueCol).cast("double")
    val agg = CommittedTable.read(spark, src)
      .groupBy(col(groupCol).cast("string").as(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol)).cast("double").as("sum_value"),
        min(v).as("min_value"),
        max(v).as("max_value"))
      .withColumn("applied_gen", lit(gen))
    CommittedTable.write(agg, dst, groupCol)
    gen
  }

  /** The view with its derived measure: `avg_value = sum_value / n`
    * (NULL for a retired n = 0 group). */
  def readView(spark: SparkSession, dst: String): DataFrame =
    CommittedTable.read(spark, dst)
      .withColumn("avg_value",
        when(col("n") > 0, col("sum_value") / col("n")))

  /** Fold one [[ChangeFeed.readCdf]] micro-batch into the view at `dst`
    * (from `foreachBatch`). Signed delta per group → read-modify-write
    * of the affected groups only, published as one merge (version =
    * the batch's newest generation per group, monotone). Groups whose
    * count reaches zero KEEP their row (n = 0, NULL extremes) —
    * retiring them would make `applied_gen` forgettable and break
    * replay idempotence. `src` (the source table path) is required only
    * when a retraction touches a group's extreme and the view maintains
    * MIN/MAX — the rescan path; views bootstrapped before the min/max
    * columns existed fold COUNT/SUM exactly as before.
    * `maxGroupValueList` is the driver-safety valve (see
    * [[MaxGroupValueList]]); it changes plans, never answers. */
  def apply(batch: DataFrame, dst: String, groupCol: String,
      valueCol: String, src: Option[String] = None,
      maxGroupValueList: Int = MaxGroupValueList): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val signed = batch
      .withColumn(groupCol, col(groupCol).cast("string"))
      .withColumn("__sign",
        when(col(CommittedTable.ChangeTypeColumn)
          .isin("insert", "update_postimage"), lit(1L)).otherwise(lit(-1L)))
    // current state of ONLY the groups the batch touches: value-list
    // manifest prune while the touched set is driver-small, a
    // distributed semi-join above the valve (no group-value collect)
    val touched = signed.select(col(groupCol).cast("string").as(groupCol))
      .distinct()
    val curAll = boundedValues(touched, maxGroupValueList) match {
      case Some(vs) => CommittedTable.read(spark, dst, Some(vs))
      case None => CommittedTable.read(spark, dst)
        .join(touched, Seq(groupCol), "left_semi")
    }
    val hasMinMax = curAll.columns.contains("min_value")
    val cur = curAll.select(
      (Seq(col(groupCol), col("n"), col("sum_value"), col("applied_gen")) ++
        (if (hasMinMax) Seq(col("min_value"), col("max_value"))
        else Nil)): _*)
    // replay guard BEFORE aggregation: drop generations already folded in
    val fresh = signed.join(
        cur.select(col(groupCol), col("applied_gen")), Seq(groupCol), "left")
      .filter(col(ChangeFeed.GenColumn) >
        coalesce(col("applied_gen"), lit(0L)))
    if (fresh.isEmpty) return
    val vd = coalesce(col(valueCol).cast("double"), lit(0.0))
    val vraw = col(valueCol).cast("double")
    val aggCols = Seq(
      sum(col("__sign")).as("__dn"),
      sum(col("__sign") * vd).as("__dsum"),
      max(col(ChangeFeed.GenColumn)).as("__gen")) ++
      (if (hasMinMax) Seq(
        min(when(col("__sign") === 1L, vraw)).as("__pmin"),
        max(when(col("__sign") === 1L, vraw)).as("__pmax"),
        min(when(col("__sign") === -1L, vraw)).as("__rmin"),
        max(when(col("__sign") === -1L, vraw)).as("__rmax"))
      else Nil)
    val delta = fresh.groupBy(col(groupCol))
      .agg(aggCols.head, aggCols.tail: _*)
    val joined = delta.join(cur, Seq(groupCol), "left")

    if (!hasMinMax) {
      val next = joined.select(col(groupCol),
        (coalesce(col("n"), lit(0L)) + col("__dn")).as("n"),
        (coalesce(col("sum_value"), lit(0.0)) + col("__dsum")).as("sum_value"),
        col("__gen").as("applied_gen"))
      CommittedTable.merge(spark, dst, next, groupCol, "applied_gen", groupCol)
      return
    }

    // inserts extend extremes exactly; a retraction ENDANGERS one when its
    // value reaches a candidate extreme (equality included: the candidate
    // may be exactly the retracted row) — those groups rescan the source
    val minCand = least(col("min_value"), col("__pmin"))
    val maxCand = greatest(col("max_value"), col("__pmax"))
    val endangered = coalesce(
      col("__rmin") <= minCand || col("__rmax") >= maxCand, lit(false))
    val staged = joined.select(col(groupCol),
      (coalesce(col("n"), lit(0L)) + col("__dn")).as("n"),
      (coalesce(col("sum_value"), lit(0.0)) + col("__dsum")).as("sum_value"),
      minCand.as("__cmin"), maxCand.as("__cmax"),
      endangered.as("__rescan"),
      col("__gen").as("applied_gen"))
    staged.persist()
    try {
      val rescan = staged.filter(col("__rescan") && col("n") > 0)
        .select(col(groupCol))
      val rescanList = boundedValues(rescan, maxGroupValueList)
      val withScan =
        if (rescanList.exists(_.isEmpty))
          staged.withColumn("__smin", lit(null).cast("double"))
            .withColumn("__smax", lit(null).cast("double"))
        else {
          val srcPath = src.getOrElse(throw new IllegalArgumentException(
            s"view at $dst maintains MIN/MAX and this batch retracts a " +
              "group extreme: pass src=Some(<source table path>) so the " +
              "affected groups can be rescanned"))
          val m = CommittedTable.manifestAt(spark, srcPath)
          // manifest-pruned when the source is partitioned by the group
          // column and the rescan set is driver-small; a pushed-down
          // filter scan / distributed semi-join otherwise
          val srcRows = rescanList match {
            case Some(vs) if m.partitionCol.contains(groupCol) =>
              CommittedTable.read(spark, srcPath, Some(vs))
            case Some(vs) =>
              CommittedTable.read(spark, srcPath)
                .filter(col(groupCol).cast("string").isin(vs: _*))
            case None =>
              CommittedTable.read(spark, srcPath).join(
                rescan.select(col(groupCol).as("__rg")),
                col(groupCol).cast("string") === col("__rg"), "left_semi")
          }
          val scan = srcRows
            .groupBy(col(groupCol).cast("string").as(groupCol))
            .agg(min(vraw).as("__smin"), max(vraw).as("__smax"))
          staged.join(scan, Seq(groupCol), "left")
        }
      val nullD = lit(null).cast("double")
      val next = withScan.select(col(groupCol), col("n"), col("sum_value"),
        when(col("n") === 0L, nullD)
          .when(col("__rescan"), col("__smin"))
          .otherwise(col("__cmin")).as("min_value"),
        when(col("n") === 0L, nullD)
          .when(col("__rescan"), col("__smax"))
          .otherwise(col("__cmax")).as("max_value"),
        col("applied_gen"))
      CommittedTable.merge(spark, dst, next, groupCol, "applied_gen", groupCol)
    } finally { staged.unpersist(); () }
  }

  /** The assembled pipeline: a `foreachBatch` streaming query keeping
    * `dst` current against `src`'s change feed. AvailableNow by default
    * (drain-and-stop; restart to catch up — the spec's cadence). */
  def sync(spark: SparkSession, src: String, dst: String, key: String,
      versionCol: String, groupCol: String, valueCol: String,
      checkpoint: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    ChangeFeed.readCdf(spark, src, key, versionCol)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.persist()
        try apply(b, dst, groupCol, valueCol, Some(src))
        finally { b.unpersist(); () }
      }
}
