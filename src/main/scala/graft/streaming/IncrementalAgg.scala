package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.CommittedTable

/** Incrementally-maintained aggregate VIEW over a committed table — the
  * materialized-view closure of the CDF loop: `COUNT(*)` + `SUM(value)`
  * per group, kept current by REPLAYING [[ChangeFeed.readCdf]] batches
  * instead of rescanning the source.
  *
  * The increment is exact because CDF rows are SIGNED: an insert or
  * update_postimage contributes `(+1, +value)`, an update_preimage or
  * delete contributes `(−1, −value)` — an in-group update nets to the
  * value change, a row MOVING between groups debits its old group and
  * credits its new one, and a delete debits cleanly. Averages and other
  * sum/count-derived measures follow at read time; measures that are not
  * incrementally maintainable from (pre, post) pairs (MIN/MAX after a
  * retraction) are out of scope by design — recompute those.
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
  * affected groups' partitions via the manifest-pruned read. Nothing is
  * proportional to the source-table or view size. */
object IncrementalAgg {

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
    val gen = CommittedTable.readManifest(fs, table).map(_.gen).getOrElse(
      throw new java.io.IOException(s"no committed table at $src"))
    // the group value doubles as the view's PARTITION value — string-typed
    // so batch-side joins and manifest pruning agree on the encoding
    // sum_value is DOUBLE by contract: apply()'s fold arithmetic produces
    // doubles, and a bootstrap that wrote int64 for an integral valueCol
    // would leave untouched partitions unreadable after the first fold
    // (parquet cannot serve INT64 as the view's probed DoubleType)
    val agg = CommittedTable.read(spark, src)
      .groupBy(col(groupCol).cast("string").as(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol)).cast("double").as("sum_value"))
      .withColumn("applied_gen", lit(gen))
    CommittedTable.write(agg, dst, groupCol)
    gen
  }

  /** Fold one [[ChangeFeed.readCdf]] micro-batch into the view at `dst`
    * (from `foreachBatch`). Signed delta per group → read-modify-write
    * of the affected groups only, published as one merge (version =
    * the batch's newest generation per group, monotone). Groups whose
    * count reaches zero KEEP their row (n = 0) — retiring them would
    * make `applied_gen` forgettable and break replay idempotence. */
  def apply(batch: DataFrame, dst: String, groupCol: String,
      valueCol: String): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val signed = batch
      .withColumn(groupCol, col(groupCol).cast("string"))
      .withColumn("__sign",
        when(col(CommittedTable.ChangeTypeColumn)
          .isin("insert", "update_postimage"), lit(1L)).otherwise(lit(-1L)))
    // current state of ONLY the groups the batch touches (manifest-pruned)
    val touchedGroups: Array[String] = signed
      .select(col(groupCol).cast("string")).distinct()
      .collect().map(_.getString(0))
    val cur = CommittedTable.read(spark, dst,
      Some(touchedGroups.toIndexedSeq))
      .select(col(groupCol), col("n"), col("sum_value"), col("applied_gen"))
    // replay guard BEFORE aggregation: drop generations already folded in
    val fresh = signed.join(
        cur.select(col(groupCol), col("applied_gen")), Seq(groupCol), "left")
      .filter(col(ChangeFeed.GenColumn) >
        coalesce(col("applied_gen"), lit(0L)))
    if (fresh.isEmpty) return
    val delta = fresh.groupBy(col(groupCol))
      .agg(sum(col("__sign")).as("__dn"),
        sum(col("__sign") * coalesce(col(valueCol).cast("double"), lit(0.0)))
          .as("__dsum"),
        max(col(ChangeFeed.GenColumn)).as("__gen"))
    val next = delta.join(cur, Seq(groupCol), "left")
      .select(col(groupCol),
        (coalesce(col("n"), lit(0L)) + col("__dn")).as("n"),
        (coalesce(col("sum_value"), lit(0.0)) + col("__dsum")).as("sum_value"),
        col("__gen").as("applied_gen"))
    CommittedTable.merge(spark, dst, next, groupCol, "applied_gen", groupCol)
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
        try apply(b, dst, groupCol, valueCol)
        finally { b.unpersist(); () }
      }
}
