package graft.schema

import java.sql.Date
import org.apache.spark.sql.types._

/** Output schemas of the two reference pipelines (SURVEY §1.3) plus typed
  * case classes for the Dataset API. Type widths deliberately upgraded from
  * the reference's 32-bit casts (etl_pipeline_spark.py:69-71): TWD total
  * prices exceed 2³¹ for large deals → LongType; areas/prices → DoubleType.
  */
object Schemas {

  /** Building-transaction output (etl_pipeline_spark.py:43-45,63-79). */
  val building: StructType = StructType(Seq(
    StructField("city", StringType),
    StructField("township_dist", StringType),
    StructField("transaction_sign", StringType),
    StructField("position", StringType),
    StructField("building_area_ping", DoubleType),
    StructField("completion_date", StringType), // kept raw ROC form (by design)
    StructField("transaction_date", DateType),
    StructField("total_price", LongType),
    StructField("unit_price_ping", DoubleType)))

  /** Land-transaction output (etl_pipeline_beam.py:142). */
  val land: StructType = StructType(Seq(
    StructField("city", StringType),
    StructField("township_dist", StringType),
    StructField("transaction_sign", StringType),
    StructField("position", StringType),
    StructField("section", StringType),
    StructField("land_area_ping", DoubleType),
    StructField("transaction_date", DateType),
    StructField("total_price", LongType),
    StructField("unit_price_ping", DoubleType)))

  /** Raw Chinese column names consumed from the CSVs (superset across both
    * pipelines; the raw files carry ~30 columns — we prune to these). */
  object Raw {
    val townshipDist = "鄉鎮市區"
    val transactionSign = "交易標的"
    val position = "土地位置建物門牌"
    val landAreaM2 = "土地移轉總面積平方公尺"
    val buildingAreaM2 = "建物移轉總面積平方公尺"
    val completionDate = "建築完成年月"
    val transactionDate = "交易年月日"
    val totalPrice = "總價元"
    val unitPriceM2 = "單價元平方公尺"
  }
}

/** Typed rows for the Dataset[T] surface. */
final case class BuildingTxn(
    city: String, township_dist: String, transaction_sign: String,
    position: String, building_area_ping: Option[Double],
    completion_date: String, transaction_date: Date,
    total_price: Option[Long], unit_price_ping: Option[Double])

final case class LandTxn(
    city: String, township_dist: String, transaction_sign: String,
    position: String, section: String, land_area_ping: Option[Double],
    transaction_date: Date, total_price: Option[Long],
    unit_price_ping: Option[Double])
