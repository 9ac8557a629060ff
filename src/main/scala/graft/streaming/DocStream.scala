package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType

import graft.operators.TextAnalysis

/** Streaming curation: the continuous-ingest twin of [[graft.operators
  * .Curation]] for a corpus that arrives as files over time. Enrichment
  * (language, quality, token counts, fingerprint) is map-side and identical
  * to the batch operator; deduplication is EXACT-WITHIN-HORIZON — duplicate
  * fingerprints arriving within the watermark are dropped, and state is
  * evicted beyond it, so executor state stays bounded no matter how long
  * the stream runs. Global historical dedup across horizons is the batch
  * job's responsibility ([[graft.operators.Dedup]] over the accumulated
  * warehouse) — unbounded streaming state is not a 100 TB design.
  *
  * Near-dup (MinHash) detection is deliberately NOT in the hot path: LSH
  * banding needs a self-join, which streaming cannot express incrementally;
  * the incremental shape is the batch [[graft.operators.Dedup
  * .minhashCandidatesAgainst]] run per micro-batch or per day against the
  * persisted signature table.
  */
object DocStream {

  /** File-based document stream (parquet files dropped into `dir`).
    * `maxFilesPerTrigger` is the same backpressure valve as
    * [[FileArrival.readRaw]]: a burst drains as bounded micro-batches. */
  def read(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 16): DataFrame = {
    require(maxFilesPerTrigger > 0, "maxFilesPerTrigger must be positive")
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
  }

  /** Enrich + dedup-within-horizon. The ingest timestamp (arrival time —
    * documents carry no event time) carries the watermark that bounds
    * dedup state. */
  def curate(docs: DataFrame, watermark: String = "1 hour",
      textCol: String = "text"): DataFrame =
    TextAnalysis.enrich(docs, textCol)
      .withColumn("__ingest_ts", current_timestamp())
      .withWatermark("__ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")
      .drop("__ingest_ts")

  /** Append the curated stream to a warehouse path, exactly-once via the
    * checkpoint (same discipline as [[FileArrival]]). */
  def toWarehouse(curated: DataFrame, path: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    curated.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
}
