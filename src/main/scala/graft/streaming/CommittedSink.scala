package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.sources.CommittedTable

/** DSv1 streaming SINK for committed tables — the write-side complement
  * of the `graft-changefeed` source, so a table→table pipeline is pure
  * format() plumbing:
  *
  * {{{
  * df.writeStream.format("graft-table")
  *   .option("path", "/warehouse/t")
  *   .option("checkpointLocation", ckpt)
  *   // key/versionCol/partitionCol read from the table's own manifest
  *   // roles when it exists; required as options only to BIRTH a table
  *   .start()
  * }}}
  *
  * Semantics are exactly [[StreamingMerge.toCommitted]]'s: each
  * micro-batch is ONE keyed latest-version-wins merge with the atomic
  * manifest publish, and a fence race against an ad-hoc maintenance
  * publish rebases and retries ([[StreamingMerge.mergeWithRetry]]).
  * Delivery is at-least-once × idempotent-by-version ⇒ effectively
  * exactly-once: a replayed micro-batch (crash between merge and
  * checkpoint commit) re-merges rows whose (key, version) already won
  * and changes nothing, so `batchId` needs no side-channel fencing
  * state. If no table exists yet, the first non-empty batch BIRTHS it
  * (one atomic first publish) with the roles the options declare —
  * key/versionCol/partitionCol all required at birth, recorded in the
  * manifest, and never needed again.
  *
  * Scale: per-batch work is the merge's — bounded by the batch and the
  * partitions it touches, never table size; the sink adds zero state of
  * its own (the table's manifest is the only bookkeeping). */
class CommittedSinkProvider extends StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-table"

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-table sink needs a 'path' option"))
    require(outputMode == OutputMode.Append() || outputMode == OutputMode.Update(),
      s"graft-table upserts by key: outputMode must be append or update, " +
        s"got $outputMode (complete mode would imply a full-table overwrite " +
        "per batch — use foreachBatch + CommittedTable.overwrite if that is " +
        "really wanted)")
    new CommittedSink(path, parameters)
  }
}

private[streaming] class CommittedSink(path: String,
    parameters: Map[String, String]) extends Sink {

  private val maxMergeRetries =
    parameters.get("maxMergeRetries").map(_.toInt).getOrElse(3)

  // 'mergeMode'='mor' routes each micro-batch through
  // CommittedTable.mergeMor (deletion vector + delta segments —
  // O(batch rows) written per trigger instead of rewriting every touched
  // partition; compactPartitions absorbs the accrued fragmentation
  // out-of-band). Default stays copy-on-write.
  private val morMerge = parameters.get("mergeMode").map(_.trim) match {
    case None | Some("cow") => false
    case Some("mor") => true
    case Some(other) => throw new IllegalArgumentException(
      s"graft-table sink at $path: mergeMode must be 'cow' or 'mor', " +
        s"got '$other'")
  }

  private def role(name: String, fromManifest: Option[String]): String =
    parameters.get(name).orElse(fromManifest).getOrElse(
      throw new IllegalArgumentException(
        s"graft-table sink at $path: no '$name' option and the table's " +
          "manifest records none — declare it as an option (it is recorded " +
          "at the first publish and optional afterwards)"))

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the engine hands a streaming-tagged frame backed by this batch's
    // IncrementalExecution; re-wrap as a re-queryable batch frame (the
    // merge runs several independent jobs over it) and persist once
    val batch = bridge.asBatchDataFrame(data)
    batch.persist()
    try {
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        val table = new Path(path)
        val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
        CommittedTable.readManifest(fs, table) match {
          case Some(m) =>
            StreamingMerge.mergeWithRetry(batch, path,
              role("key", m.keyCol), role("versionCol", m.verCol),
              role("partitionCol", m.partitionCol), maxMergeRetries,
              mor = morMerge)
          case None =>
            // birth: one atomic first publish declaring the roles, so
            // every later batch (and every other front end) reads them
            // from the manifest. The batch gets the SAME latest-version-
            // wins arbitration merge applies — a first micro-batch can
            // legitimately carry several versions of a key (a change-feed
            // backlog drained in one AvailableNow batch does), and writing
            // them raw would duplicate keys
            val key = role("key", None)
            val ver = role("versionCol", None)
            val pc = role("partitionCol", None)
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(org.apache.spark.sql.functions.col(key))
              .orderBy(org.apache.spark.sql.functions.col(ver).desc)
            val collapsed = batch
              .withColumn("__graft_rn",
                org.apache.spark.sql.functions.row_number().over(w))
              .filter(org.apache.spark.sql.functions.col("__graft_rn") === 1)
              .drop("__graft_rn")
            CommittedTable.write(collapsed, path, pc,
              keyCol = Some(key), versionCol = Some(ver))
        }
      }
    } finally batch.unpersist()
  }

  override def toString: String = s"CommittedSink[$path]"
}
