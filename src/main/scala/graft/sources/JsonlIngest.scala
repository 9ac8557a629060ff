package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) source/sink — the interchange format
  * LLM corpora actually ship in (one document object per line). Spark's
  * json reader/writer already handles the hard parts (string escaping of
  * embedded newlines/quotes/unicode, splittable line records); this
  * wrapper pins the two at-scale disciplines:
  *
  *  - reads take an EXPLICIT schema — schema inference is a full extra
  *    pass over the data (at 100 TB, a second 100 TB scan) and can type a
  *    column differently per batch;
  *  - malformed lines go to a quarantine column instead of killing the
  *    job or being silently dropped (PERMISSIVE + columnNameOfCorruptRecord
  *    — a crawler's output always contains some broken lines).
  */
object JsonlIngest {

  val CORRUPT_COL = "_corrupt_record"

  /** Write one JSON object per row (sharded; gzip-free so files stay
    * splittable — compression at scale belongs to columnar storage, JSONL
    * is the interchange/export step). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Read JSONL with the given schema; rows whose line failed to parse
    * carry the raw line in [[CORRUPT_COL]] (all data fields NULL).
    *
    * Implemented as a TEXT scan + `from_json` rather than the json
    * source's columnNameOfCorruptRecord: Spark refuses scans whose
    * referenced columns reduce to only the internal corrupt column (the
    * exact projection a dead-letter sink makes), while the text-scan form
    * has no such restriction and still parses each line exactly once,
    * map-side. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    checkSchema(schema)
    parseLines(spark.read.text(path), schema)
  }

  /** Streaming twin of [[read]]: JSONL files landing in `dir` become a
    * micro-batched stream with the same schema'd parse + dead-letter
    * column (route [[corrupt]] to a quarantine sink, [[parsed]] onward —
    * e.g. into [[graft.streaming.DocStream.curate]]). Exactly-once per
    * file via the caller's checkpoint, same as FileArrival. */
  def readStream(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    checkSchema(schema)
    parseLines(
      spark.readStream.option("maxFilesPerTrigger", "64").text(dir), schema)
  }

  /** A caller schema already containing the corrupt column would produce a
    * duplicate field and silently shadow the quarantine — collisions fail
    * loudly at the API boundary, before the filesystem is touched. */
  private def checkSchema(schema: StructType): Unit =
    require(!schema.fieldNames.contains(CORRUPT_COL),
      s"input schema must not contain reserved column $CORRUPT_COL")

  /** The one parse pipeline both [[read]] and [[readStream]] use (batch
    * and streaming must never diverge). The corrupt-record column rides
    * INSIDE the from_json struct (PERMISSIVE mode fills it with the raw
    * line on parse failure — and unlike the file source, from_json has no
    * corrupt-only-projection restriction). */
  private def parseLines(lines: DataFrame,
      schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions._
    val fullSchema = schema.add(CORRUPT_COL, "string")
    lines
      // blank/whitespace-only lines are JSONL format noise (ignorable
      // separators), not records: from_json("") returns a NULL struct —
      // not a bad record — so without this filter every blank line would
      // become a phantom all-NULL "valid" document
      .filter(length(trim(col("value"))) > 0)
      .select(col("value"), from_json(col("value"), fullSchema,
        java.util.Map.of("mode", "PERMISSIVE",
          "columnNameOfCorruptRecord", CORRUPT_COL)).as("__p"))
      // getField, not col("__p.name"): a field name containing a dot is
      // legal in JSON and must resolve literally, not as a nested path.
      // A line holding the bare JSON literal `null` is VALID JSON, so
      // from_json returns a NULL struct (not a corrupt record) — getField
      // would surface it as a phantom all-NULL "parsed" document; route the
      // raw line to quarantine instead (jq-style pipelines do emit `null`).
      .select(fullSchema.fieldNames.toIndexedSeq.map { f =>
        val v = col("__p").getField(f)
        (if (f == CORRUPT_COL) when(col("__p").isNull, col("value")).otherwise(v)
         else v).as(f)
      }: _*)
  }

  /** Parsed rows only (the happy path after [[read]]). */
  def parsed(df: DataFrame): DataFrame =
    df.filter(df.col(CORRUPT_COL).isNull).drop(CORRUPT_COL)

  /** Quarantined raw lines (route to a dead-letter sink, never drop). */
  def corrupt(df: DataFrame): DataFrame =
    df.filter(df.col(CORRUPT_COL).isNotNull).select(df.col(CORRUPT_COL))
}
