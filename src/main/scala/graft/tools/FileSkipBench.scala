package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.queries.Registry
import graft.sources.CommittedTable

/** Evidence run for BENCH_NOTES: the per-file zone-map win, measured.
  *
  * Builds TWO committed copies of `lineitem` partitioned by
  * `l_returnflag` — one range-clustered into many files per partition
  * (`compact(sortCols = l_orderkey, filesPerPartition = N)`), one with
  * a single file per partition — and times the same 1%-of-keyspace
  * range aggregate over both. Prints one JSON line with planned file
  * counts and best-of-3 seconds. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=target/sf1.0 sbt "runMain graft.tools.FileSkipBench"
  */
object FileSkipBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("graft-fileskip-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = java.nio.file.Files.createTempDirectory("graft-fsb").toString
    val clustered = s"$base/clustered"
    val flat = s"$base/flat"
    val src = Registry.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"),
        col("l_extendedprice"), col("l_quantity"))
    CommittedTable.write(src, clustered, "l_returnflag",
      statsCols = Seq("l_orderkey"))
    CommittedTable.compact(spark, clustered, "l_returnflag",
      sortCols = Seq("l_orderkey"), filesPerPartition = 16)
    CommittedTable.write(src, flat, "l_returnflag",
      statsCols = Seq("l_orderkey"))

    // a 1%-of-rows key band from actual percentiles (the key space may
    // have gaps — replica shifting at sf1.0)
    val pct = spark.sql(
      s"""SELECT percentile_approx(l_orderkey, array(0.50, 0.51), 10000)
          FROM graft.`$clustered`""").head().getSeq[Long](0)
    val (lo, hi) = (pct(0), math.max(pct(1), pct(0) + 1))

    def q(path: String): DataFrame = spark.sql(
      s"""SELECT CAST(SUM(l_extendedprice * l_quantity) AS DOUBLE) AS v
          FROM graft.`$path`
          WHERE l_orderkey BETWEEN $lo AND $hi""")
    def planned(df: DataFrame): Long = {
      val p = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case other => other
      }
      p.collect {
        case s: FileSourceScanExec
            if s.relation.location.isInstanceOf[graft.sql.GraftFileIndex] =>
          s.selectedPartitions.totalNumberOfFiles
      }.sum
    }
    def time(path: String): Double = (1 to 3).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      q(path).queryExecution.toRdd.foreachPartition(_ => ())
      (System.nanoTime() - t0) / 1e9
    }.min

    // answers must agree before any timing claim
    val a = q(clustered).head().getDouble(0)
    val b = q(flat).head().getDouble(0)
    require(math.abs(a - b) < 1e-6 * math.max(1.0, math.abs(b)),
      s"clustered=$a flat=$b")

    def total(path: String): Long =
      planned(spark.sql(s"SELECT * FROM graft.`$path`"))
    val out =
      s"""{"metric":"file_skip","sf":"$sfDir","range":[$lo,$hi],""" +
      s""""clustered_files_planned":${planned(q(clustered))},""" +
      s""""clustered_files_total":${total(clustered)},""" +
      s""""flat_files_planned":${planned(q(flat))},""" +
      s""""flat_files_total":${total(flat)},""" +
      s""""clustered_sec":${f"${time(clustered)}%.3f"},""" +
      s""""flat_sec":${f"${time(flat)}%.3f"}}"""
    // scrub the fixtures before reporting
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(base))
    try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
    finally walk.close()
    println(out)
    spark.stop()
  }
}
