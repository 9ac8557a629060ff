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

  /** Schema of ONE parquet file from its footer, read driver-side —
    * what `spark.read.parquet(dir).schema` computes by listing the dir,
    * resolving the DataSource and running a footer-merge pass over
    * every file (ParquetFileFormat.mergeSchemasInParallel — measured as
    * the second-hottest driver frame in a multi-publish lakehouse gate).
    * For segment dirs written by ONE Spark job all footers agree, so
    * one footer IS the answer: prefer the Spark schema the writer
    * embedded under the standard metadata key (exact round trip,
    * including nullability and timestamp variants), fall back to the
    * parquet→Catalyst conversion with the session's inference flags. */
  def parquetFooterSchema(spark: org.apache.spark.sql.SparkSession,
      file: org.apache.hadoop.fs.Path)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.execution.datasources.parquet.{
      ParquetFooterReader, ParquetToSparkSchemaConverter}
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val conf = cs.sessionState.newHadoopConf()
    val footer = ParquetFooterReader.readFooter(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf),
      org.apache.parquet.format.converter.ParquetMetadataConverter.SKIP_ROW_GROUPS)
    val meta = footer.getFileMetaData
    val s = Option(meta.getKeyValueMetaData
        .get("org.apache.spark.sql.parquet.row.metadata"))
      .flatMap(s => scala.util.Try(
        org.apache.spark.sql.types.DataType.fromJson(s)
          .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption)
      .getOrElse(new ParquetToSparkSchemaConverter(cs.sessionState.conf)
        .convert(meta.getSchema))
    // inference returns everything nullable (FileSourceScan NULL-fills a
    // column a file lacks); the writer-embedded schema may record
    // required fields — match inference or mixed-generation reads throw
    s.asNullable
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
