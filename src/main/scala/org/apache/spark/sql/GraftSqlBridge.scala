package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` door this project needs: turn an
  * already-constructed logical plan into a DataFrame so an analysis rule
  * can compose reads with the DataFrame API (the deletion-vector
  * anti-join in `graft.sql.GraftAnalysis` — `_metadata` resolution needs
  * the real analyzer). The same bridge pattern Delta Lake and Iceberg's
  * Spark runtime use; nothing else from the internal API is touched. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
