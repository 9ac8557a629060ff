package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S5–S7 (SURVEY §2.1): the analytical store. The reference loads BigQuery
  * (overwrite / truncate / append dispositions); in this engine the warehouse
  * is partitioned Parquet — columnar, stats-pruned, splittable — which is the
  * Spark-native equivalent and what a 100 TB deployment would use (object
  * store + partition layout + vectorized scan).
  *
  * Partitioning: `city` (26 values) × `txn_year` (~15 values) ⇒ a few hundred
  * partitions — right-sized so the A5-style queries (avg by year/city)
  * partition-prune instead of scanning everything, and small enough to avoid
  * the many-tiny-files problem at scale.
  */
object Warehouse {

  /** Overwrite-load (S5/S6: WRITE_TRUNCATE semantics). */
  def overwrite(df: DataFrame, path: String): Unit =
    write(df, path, SaveMode.Overwrite)

  /** Append-load (S7: WRITE_APPEND semantics, per-file incremental). */
  def append(df: DataFrame, path: String): Unit =
    write(df, path, SaveMode.Append)

  private def write(df: DataFrame, path: String, mode: SaveMode): Unit =
    df.withColumn("txn_year", year(col("transaction_date")))
      .write
      .partitionBy("city", "txn_year")
      .mode(mode)
      .parquet(path)

  /** Read the warehouse back; filters on city/txn_year prune partitions. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compact an append-accumulated warehouse into `dst`: the small-files
    * problem is the operational cost of S7 at scale (every `append` batch
    * adds a file per partition; a year of daily loads = hundreds of files
    * per partition, and scan planning degrades with file COUNT, not size).
    * One shuffle keyed by the partition columns rewrites each (city, year)
    * as a single file (splittable: `maxRecordsPerFile` re-splits the giants)
    * sorted by transaction_date, so parquet row-group stats support date
    * range skipping within the partition. Callers swap `dst` for the old
    * path once the write commits — same publish discipline as overwrite. */
  def compact(spark: SparkSession, src: String, dst: String,
      maxRecordsPerFile: Long = 1L << 22): Unit =
    read(spark, src)
      .repartition(col("city"), col("txn_year"))
      .sortWithinPartitions(col("city"), col("txn_year"), col("transaction_date"))
      .write
      .partitionBy("city", "txn_year")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(SaveMode.Overwrite)
      .parquet(dst)
}
