package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column↔Expression conversions (the
  * sanctioned pattern for third-party Catalyst expressions: a tiny shim
  * compiled into the org.apache.spark.sql namespace). */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Materialize a resolved LogicalPlan as a DataFrame (`Dataset.ofRows`,
    * `private[sql]`) — how the SQL surface's routed `MERGE INTO` hands
    * its analyzed source subplan to the committed-table merge. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The inverse of [[asStreamingDataFrame]]: wrap a micro-batch's
    * streaming-tagged DataFrame (the `data` a DSv1 `Sink.addBatch`
    * receives, backed by an IncrementalExecution) as an ordinary BATCH
    * DataFrame over its materialized RDD — the same move Spark's
    * ForeachBatchSink makes before handing the user function a
    * re-queryable frame. Callers should persist it: the wrapper
    * re-evaluates the RDD lineage per action otherwise. */
  def asBatchDataFrame(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = false)
  }

  /** Re-tag a batch DataFrame as STREAMING — the contract a DSv1
    * streaming `Source.getBatch` must satisfy (the same
    * internalCreateDataFrame(isStreaming = true) call FileStreamSource
    * makes; MicroBatchExecution asserts the flag). */
  def asStreamingDataFrame(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }
}
