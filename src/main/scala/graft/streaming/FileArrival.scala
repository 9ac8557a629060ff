package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

import graft.schema.Schemas.Raw

/** S4+S9 (SURVEY §2.1, §3.3): event-driven incremental ingestion.
  *
  * The reference needs a GCS-finalize Cloud Function (cloud_function/main.py)
  * that REST-launches a staged Dataflow template per arriving file
  * (etl_pipeline_beam_auto.py), giving at-least-once, append-only loads with
  * a worker-pool spin-up per file. Structured Streaming's file source
  * replaces that machinery outright: the driver discovers new files matching
  * `pathGlobFilter` each micro-batch, the checkpoint gives exactly-once
  * per-file processing across restarts, and no per-file cluster is spun up.
  */
object FileArrival {

  /** Streaming read of raw CSVs landing in `dir` (only `*a.csv`, mirroring
    * the trigger's suffix filter at cloud_function/main.py:8). The schema
    * must be supplied — a streaming source cannot infer it (pass
    * `rawSchema(cols)` built from one sample file).
    *
    * `maxFilesPerTrigger` is the backpressure valve: a burst of N files
    * (a backfill drop, an upstream outage flushing) drains as ⌈N/max⌉
    * BOUNDED micro-batches instead of one giant batch that would size
    * executor memory to the burst instead of the steady state. Progress is
    * checkpointed per batch, so a crash mid-burst resumes at the next
    * unprocessed file, not the start. Applies to AvailableNow backfills
    * too (Spark honors the cap per availableNow sub-batch). */
  def readRaw(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 64): DataFrame = {
    require(maxFilesPerTrigger > 0, "maxFilesPerTrigger must be positive")
    spark.readStream
      .format("csv")
      .schema(schema)
      .option("header", "true")
      .option("pathGlobFilter", "*a.csv")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .load(dir)
      .filter(!col(Raw.transactionSign).isin("transaction sign", "transaction_sign"))
      .withColumn("source_file", input_file_name())
  }

  /** All-string schema for the raw CSV contract (streaming needs it fixed). */
  def rawSchema(columns: Seq[String]): StructType =
    columns.foldLeft(new StructType)((s, c) => s.add(c, "string"))

  /** Append-only sink into the Parquet warehouse with checkpointing —
    * exactly-once per input file vs the reference's at-least-once
    * (WRITE_APPEND at etl_pipeline_beam_auto.py:178). `availableNow` processes
    * the backlog then stops (batch-like operation for tests/backfills);
    * otherwise it runs continuously per `interval`. */
  def toWarehouse(
      transformed: DataFrame,
      path: String,
      checkpoint: String,
      availableNow: Boolean = true,
      interval: String = "30 seconds"): DataStreamWriter[Row] = {
    val trigger =
      if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime(interval)
    transformed.writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
  }
}
