package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.sources.Warehouse

/** CDC-style streaming upsert: a stream of keyed update rows applied to the
  * partitioned warehouse, one [[Warehouse.merge]] per micro-batch. The
  * 100 TB ingest loop this models: change batches land continuously, each
  * touches a handful of partitions, and the table is always the
  * latest-version-wins view — without ever rewriting untouched partitions.
  *
  * Delivery semantics: foreachBatch is at-least-once (a crashed batch can
  * re-run), but `merge` is IDEMPOTENT per batch — replaying the same batch
  * converges to the same table (WarehouseSpec pins this) — so the sink is
  * effectively exactly-once. Out-of-order delivery is also safe:
  * latest-version-wins means a stale batch arriving late cannot clobber a
  * newer row (StreamingMergeSpec pins this too). Within one micro-batch,
  * multiple versions of a key collapse to the highest, same as across
  * batches.
  *
  * Backpressure is the source's concern (`maxFilesPerTrigger` /
  * `maxOffsetsPerTrigger` on the read side): each micro-batch's merge cost
  * scales with batch size + affected partitions, so bounded batches keep
  * merge latency flat under a burst. */
object StreamingMerge {

  /** Writer applying `updates` (a STREAMING DataFrame whose schema matches
    * the table at `path`) batch-by-batch. `availableNow` drains the backlog
    * then stops (backfill/test mode); otherwise micro-batches run per
    * `interval`. Callers `.start()` the result. */
  def toWarehouse(
      updates: DataFrame,
      path: String,
      key: String,
      versionCol: String,
      partitionCol: String,
      checkpoint: String,
      availableNow: Boolean = true,
      interval: String = "30 seconds"): DataStreamWriter[Row] = {
    val trigger =
      if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime(interval)
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // persist first: merge drives several independent jobs over the
        // batch (the isEmpty probe, the affected-partition collects, the
        // staging write) — unpersisted, each would re-pull the micro-batch
        // from the source
        batch.persist()
        try {
          // isEmpty is a cheap limit-1 probe; an empty micro-batch must
          // not pay a merge's staging write
          if (!batch.isEmpty)
            Warehouse.merge(batch.sparkSession, path, batch,
              key, versionCol, partitionCol)
        } finally batch.unpersist()
      }
  }

  /** [[toWarehouse]] against a [[graft.sources.CommittedTable]]: identical
    * delivery semantics (at-least-once foreachBatch × idempotent
    * latest-version-wins merge ⇒ effectively exactly-once; stale batches
    * cannot clobber), with the ATOMIC publish on top — readers polling the
    * table between micro-batches resolve one committed generation, never a
    * mid-publish mix, and a batch that crashes mid-merge leaves the
    * previous generation fully visible until the retry lands.
    *
    * Writer fencing: the stream is NORMALLY the one writer, but an ad-hoc
    * maintenance publish (a manual backfill, a [[graft.sources
    * .CommittedTable.compact]]) can race a micro-batch; the table's
    * optimistic fence then makes exactly one side win and the loser raise
    * `ConcurrentModificationException` with its staging cleaned up.
    * Failing the whole stream for that is wrong — the documented remedy
    * IS "re-run the merge", and the merge is idempotent — so the batch
    * retries the merge up to `maxMergeRetries` times on top of whatever
    * won before surfacing the failure (a persistent conflict means a
    * second CONTINUOUS writer, which is a deployment bug worth failing
    * loudly over). */
  def toCommitted(
      updates: DataFrame,
      path: String,
      key: String,
      versionCol: String,
      partitionCol: String,
      checkpoint: String,
      availableNow: Boolean = true,
      interval: String = "30 seconds",
      maxMergeRetries: Int = 3,
      mor: Boolean = false): DataStreamWriter[Row] = {
    val trigger =
      if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime(interval)
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try {
          if (!batch.isEmpty)
            mergeWithRetry(batch, path, key, versionCol, partitionCol,
              maxMergeRetries, mor = mor)
        } finally batch.unpersist()
      }
  }

  /** One micro-batch's merge with rebase-and-retry on a lost fence race
    * (see [[toCommitted]]). `crashPoint` is the same test seam
    * [[graft.sources.CommittedTable.merge]] exposes, threaded through so
    * specs can interleave a competing publish deterministically.
    *
    * `mor = true` routes through [[graft.sources.CommittedTable
    * .mergeMor]] — the steady-state streaming-upsert shape at 100 TB:
    * every micro-batch costs O(its own rows) (a deletion vector + delta
    * segments) instead of rewriting each touched partition whole, and
    * the fragmentation it accrues is exactly what
    * [[graft.sources.CommittedTable.fragmentedPartitions]] +
    * `compactPartitions` absorb out-of-band (maintenance rebases over
    * disjoint micro-batches, so it never blocks ingestion). Replay
    * idempotence is STRONGER than the CoW merge's: a replayed batch's
    * rows all TIE on (key, version), tie keeps the existing row, and the
    * no-op publish is skipped entirely — the table doesn't even burn a
    * generation. */
  private[streaming] def mergeWithRetry(batch: DataFrame, path: String,
      key: String, versionCol: String, partitionCol: String,
      maxMergeRetries: Int,
      crashPoint: String => Unit = _ => (),
      mor: Boolean = false): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      try {
        if (mor)
          graft.sources.CommittedTable.mergeMor(batch.sparkSession, path,
            batch, key, versionCol, partitionCol, crashPoint = crashPoint)
        else
          graft.sources.CommittedTable.merge(batch.sparkSession, path,
            batch, key, versionCol, partitionCol, crashPoint = crashPoint)
        done = true
      } catch {
        case _: java.util.ConcurrentModificationException
            if attempt < maxMergeRetries =>
          attempt += 1 // rebase on the winner and re-apply
      }
    }
  }
}
