package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HousePrice._
import graft.schema.Schemas.Raw
import graft.sources.CsvIngest

/** The two reference dataflow DAGs (SURVEY §2, §3) as single declarative
  * DataFrame expression chains — one shuffle-free scan each, fully inside
  * whole-stage codegen (the reference needed three Python-UDF barriers and,
  * on the Beam path, a gather-to-one-worker concat; both are gone here).
  */
object Pipelines {

  /** Building-transaction pipeline (etl_pipeline_spark.py DAG):
    * filter 房地* → city from filename → select/rename → ROC date (invalid →
    * dropped) → casts → zero-unit-price repair → m²→ping.
    * E5 uses the Beam semantics (divide by area, etl_pipeline_beam.py:99);
    * the Spark file's divide-by-zero-column at :73-74 is a reference bug we
    * do not reproduce (SURVEY §7.4.2).
    *
    * `convertCompletionDate` (SURVEY §1.2): the reference keeps 建築完成年月
    * as a raw ROC string (etl_pipeline_spark.py:44,59-61 converts only the
    * transaction date); this engine also offers the conversion — an appended
    * `completion_date_iso` DATE column (NULL on empty/invalid, same E2
    * kernel), without dropping rows (only an invalid TRANSACTION date is a
    * row filter). Default off keeps the reference-shaped schema. */
  def building(spark: SparkSession, glob: String,
      convertCompletionDate: Boolean = false): DataFrame = {
    val base = buildingBase(spark, glob)
    if (convertCompletionDate)
      base.withColumn("completion_date_iso", rocToDate(col("completion_date")))
    else base
  }

  /** The 房地*-class filter over the raw read — the stage boundary
    * [[buildingObserved]] instruments. */
  private def buildingClassed(spark: SparkSession, glob: String): DataFrame =
    CsvIngest.readRaw(spark, glob)
      .filter(col(Raw.transactionSign).startsWith("房地"))

  /** Everything after the class filter (select/rename, ROC date, casts,
    * repair, ping) — shared verbatim by [[building]] and
    * [[buildingObserved]] so the two can never diverge. */
  private def buildingShape(classed: DataFrame): DataFrame =
    classed
      .select(
        cityFromFilename(col("source_file")).as("city"),
        col(Raw.townshipDist).as("township_dist"),
        col(Raw.transactionSign).as("transaction_sign"),
        col(Raw.position).as("position"),
        col(Raw.buildingAreaM2).cast("double").as("building_area_m2"),
        col(Raw.completionDate).as("completion_date"),
        rocToDate(col(Raw.transactionDate)).as("transaction_date"),
        col(Raw.totalPrice).cast("long").as("total_price"),
        col(Raw.unitPriceM2).cast("double").as("unit_price_m2"))
      .filter(col("transaction_date").isNotNull) // F3: invalid dates out
      .withColumn("unit_price_m2",
        repairUnitPrice(col("unit_price_m2"), col("total_price"), col("building_area_m2")))
      .select(
        col("city"), col("township_dist"), col("transaction_sign"), col("position"),
        m2ToPing(col("building_area_m2")).as("building_area_ping"),
        col("completion_date"), col("transaction_date"), col("total_price"),
        priceM2ToPing(col("unit_price_m2")).as("unit_price_ping"))

  private def buildingBase(spark: SparkSession, glob: String): DataFrame =
    buildingShape(buildingClassed(spark, glob))

  /** Land-transaction pipeline (etl_pipeline_beam.py DAG): filter == 土地 →
    * section regex → city/date/casts → repair → ping conversion. */
  def land(spark: SparkSession, glob: String): DataFrame =
    CsvIngest.readRaw(spark, glob)
      .filter(col(Raw.transactionSign) === "土地")
      .select(
        cityFromFilename(col("source_file")).as("city"),
        col(Raw.townshipDist).as("township_dist"),
        col(Raw.transactionSign).as("transaction_sign"),
        col(Raw.position).as("position"),
        extractSection(col(Raw.position)).as("section"),
        col(Raw.landAreaM2).cast("double").as("land_area_m2"),
        rocToDate(col(Raw.transactionDate)).as("transaction_date"),
        col(Raw.totalPrice).cast("long").as("total_price"),
        col(Raw.unitPriceM2).cast("double").as("unit_price_m2"))
      .filter(col("transaction_date").isNotNull)
      .withColumn("unit_price_m2",
        repairUnitPrice(col("unit_price_m2"), col("total_price"), col("land_area_m2")))
      .select(
        col("city"), col("township_dist"), col("transaction_sign"), col("position"),
        col("section"),
        m2ToPing(col("land_area_m2")).as("land_area_ping"),
        col("transaction_date"), col("total_price"),
        priceM2ToPing(col("unit_price_m2")).as("unit_price_ping"))

  /** Per-stage row accounting for the building pipeline, with ZERO extra
    * passes: the reference logs how many rows each cleaning stage dropped;
    * Spark's `Observation` API collects the same counts as a side effect of
    * whatever action the caller runs on the returned frame (metrics fire
    * when the action completes — no second scan, no cache).
    *
    * Metrics: `n_class` (rows surviving the 房地* class filter, i.e. past
    * F1/F2) and `n_valid_date` (rows additionally surviving F3) — dropped =
    * differences between stages and the final count the caller already has.
    */
  def buildingObserved(spark: SparkSession, glob: String):
      (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation("building_stages")
    // stage the parsed date once so the metric does not re-parse per row
    val classed = buildingClassed(spark, glob)
      .withColumn("__txn_date_parsed", rocToDate(col(Raw.transactionDate)))
      .observe(obs,
        count(lit(1)).as("n_class"),
        sum(when(col("__txn_date_parsed").isNotNull, 1L).otherwise(0L))
          .as("n_valid_date"))
      .drop("__txn_date_parsed")
    (buildingShape(classed), obs)
  }

  /** A5 (README.md:103-106): the reference's one demonstrated analytical
    * query — average unit price by transaction year (and optionally city).
    * Partition-prunes when run over the warehouse (partitioned by city/year).
    */
  def avgPriceByYear(txns: DataFrame, byCity: Boolean = false): DataFrame = {
    val keys = (if (byCity) Seq(col("city")) else Nil) :+
      year(col("transaction_date")).as("txn_year")
    txns.groupBy(keys: _*)
      .agg(round(avg("unit_price_ping"), 2).as("avg_unit_price_ping"),
        count(lit(1)).as("n_txns"))
  }
}
