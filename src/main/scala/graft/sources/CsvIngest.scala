package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.Schemas.Raw

/** S1–S3 + F1 + P6 (SURVEY §2.1/§2.2): glob CSV ingestion of the raw
  * actual-price registration files.
  *
  * Raw-file contract (FIXTURES.md §A):
  *  - filename `{season}_{cityletter}_lvr_land_{class}.csv`, city letter at
  *    basename index 6 (etl_pipeline_spark.py:13-14);
  *  - row 1: Chinese header (first name BOM-polluted, etl_pipeline_beam.py:21);
  *  - row 2: an *English* header as a data row — dropped by value predicate,
  *    not position (positional drop is unsafe under distributed splits,
  *    SURVEY §7.4.1);
  *  - rows 3+: data, all columns read as strings (no inferSchema — typing is
  *    explicit downstream, matching the reference's stringly-typed contract).
  */
object CsvIngest {

  /** Values the embedded second header row carries in the 交易標的 column —
    * generalized form of the reference's single-value predicate
    * (etl_pipeline_spark.py:53). */
  private val embeddedHeaderValues = Seq("transaction sign", "transaction_sign")

  /** Read every file matching `glob` (e.g. dir + "&#47;*_a.csv"): header-aware,
    * string-typed, BOM-stripped, English header row dropped, source path
    * attached as `source_file` (P4 — the city letter lives in the filename,
    * SURVEY §1.4). */
  def readRaw(spark: SparkSession, glob: String): DataFrame = {
    // read through the isolated contract session (non-ANSI/UTC semantics
    // without reconfiguring the caller's own session)
    val s = graft.queries.Registry.contractSession(spark)
    val df = s.read
      .format("csv")
      .option("header", "true")
      .option("encoding", "UTF-8")
      .load(glob)
    // Defensive BOM strip on column names (P6): Spark's UnivocityParser
    // handles the common case, but a re-encoded file can sneak one through.
    val cleaned = df.toDF(df.columns.toIndexedSeq.map(_.stripPrefix("﻿")): _*)
    cleaned
      .filter(!col(Raw.transactionSign).isin(embeddedHeaderValues: _*))
      .withColumn("source_file", input_file_name())
  }
}
