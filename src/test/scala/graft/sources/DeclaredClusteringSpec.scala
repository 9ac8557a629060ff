package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Declared clustering (TBLPROPERTIES 'clusterby' + 'clusterfiles' /
  * [[CommittedTable.setClustering]]): once declared, EVERY row-writing
  * publish range-clusters its staged partitions — per-file zone maps
  * stay skip-tight with no maintenance job (the liquid-clustering UX).
  * Pre-existing segments cluster at their next rewrite; a bare
  * compact() re-establishes the layout over history. */
class DeclaredClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-dclust-$tag").toString + "/t"

  private def scanned(df: DataFrame): Long = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collect {
      case s: FileSourceScanExec
          if s.relation.location.isInstanceOf[graft.sql.GraftFileIndex] => s
    }.map(_.selectedPartitions.totalNumberOfFiles).sum
  }

  /** fs= entries keyed by segment leaf → (min, max) longs. */
  private def bounds(dir: String): Seq[(String, Long, Long)] = {
    val m = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_commit")), "UTF-8")
    m.linesIterator.filter(_.startsWith("fs=")).map { l =>
      val a = l.stripPrefix("fs=").split('\t')
      (a(0).replace("%2F", "/"),
        a(1).stripPrefix("v:").toLong, a(2).stripPrefix("v:").toLong)
    }.toSeq
  }

  private def disjointWithin(bs: Seq[(String, Long, Long)]): Unit =
    bs.groupBy(_._1.split('/')(0)).foreach { case (leaf, fs) =>
      fs.sortBy(_._2).sliding(2).foreach {
        case Seq((_, _, mxA), (_, mnB, _)) =>
          assert(mxA < mnB, s"overlapping files in $leaf: $fs")
        case _ =>
      }
    }

  private def seed(dir: String): Unit = {
    val src = spark.range(0, 4000)
      .select(when(col("id") % 2 === 0, "A").otherwise("B").as("part"),
        col("id").as("value"), lit(1L).as("version"))
    CommittedTable.write(src, dir, "part", statsCols = Seq("value"),
      keyCol = Some("value"), versionCol = Some("version"))
  }

  test("after setClustering, a MERGE's rewritten partitions come out " +
      "range-clustered (disjoint per-file ranges) and range SQL skips") {
    val dir = freshDir("merge")
    seed(dir)
    assert(bounds(dir).size === 2, "one file per partition before")
    CommittedTable.setClustering(spark, dir, Some((Seq("value"), 4)))
    // merge touches BOTH partitions: upsert one key per partition
    CommittedTable.merge(spark, dir,
      Seq(("A", 100L, 2L), ("B", 101L, 2L))
        .toDF("part", "value", "version"),
      "value", "version", "part")
    val bs = bounds(dir)
    assert(bs.size >= 6, s"~4 clustered files per partition after: $bs")
    disjointWithin(bs)
    val expTop = bs.count(_._3 >= 3500L)
    val top = spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$dir` " +
      "WHERE value >= 3500")
    assert(scanned(top) === expTop && expTop < bs.size)
    assert(top.as[Long].head() === 500L)
    // DELETE keeps the layout on its rewrites too
    spark.sql(s"DELETE FROM graft.`$dir` WHERE value % 100 = 7")
    val bs2 = bounds(dir)
    assert(bs2.size >= 6, s"layout survives the delete rewrite: $bs2")
    disjointWithin(bs2)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$dir` " +
      "WHERE value >= 3500").as[Long].head() === 500L - 5L)
  }

  test("SQL: CTAS declares clustering via TBLPROPERTIES; UPDATE rewrites " +
      "clustered; ALTER with an empty value clears it") {
    val dir = freshDir("sql")
    spark.range(0, 2000)
      .select(lit("A").as("part"), col("id").as("value"),
        lit(1L).as("version"))
      .createOrReplaceTempView("dclust_src")
    spark.sql(
      s"""CREATE TABLE graft.`$dir` PARTITIONED BY (part)
          TBLPROPERTIES('keycol'='value', 'vercol'='version',
                        'statscols'='value',
                        'clusterby'='value', 'clusterfiles'='4')
          AS SELECT * FROM dclust_src""")
    spark.sql(
      s"""UPDATE graft.`$dir` SET version = 2
          WHERE value % 500 = 3""") // rewrites partition A, clustered
    val bs = bounds(dir)
    assert(bs.size >= 3, s"clustered rewrite: $bs")
    disjointWithin(bs)
    val q = spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$dir` " +
      "WHERE value < 500")
    assert(scanned(q) < bs.size)
    assert(q.as[Long].head() === 500L)
    // clearing the property restores the single-file rewrite layout
    spark.sql(s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES('clusterby'='')")
    spark.sql(s"UPDATE graft.`$dir` SET version = 3 WHERE value % 500 = 3")
    assert(bounds(dir).size <= 1, "cleared: one file per rewritten partition")
  }

  test("a bare compact() re-establishes the declared layout over history") {
    val dir = freshDir("compact")
    seed(dir)
    CommittedTable.setClustering(spark, dir, Some((Seq("value"), 4)))
    assert(bounds(dir).size === 2, "history still single-file")
    CommittedTable.compact(spark, dir, "part")
    val bs = bounds(dir)
    assert(bs.size >= 6, s"compact clustered history: $bs")
    disjointWithin(bs)
  }

  test("loud contracts: unknown column, bucketing conflict, degenerate " +
      "file count") {
    val dir = freshDir("err")
    seed(dir)
    val e1 = intercept[IllegalArgumentException](
      CommittedTable.setClustering(spark, dir, Some((Seq("nope"), 4))))
    assert(e1.getMessage.contains("does not exist"))
    val e2 = intercept[IllegalArgumentException](
      CommittedTable.setClustering(spark, dir, Some((Seq("value"), 1))))
    assert(e2.getMessage.contains("clusterfiles"))
    val bDir = freshDir("bucketed")
    CommittedTable.write(
      spark.range(0, 100).select(lit("A").as("part"), col("id").as("k"),
        col("id").as("v")),
      bDir, "part", bucketBy = Some((4, Seq("k"))))
    val e3 = intercept[IllegalArgumentException](
      CommittedTable.setClustering(spark, bDir, Some((Seq("v"), 4))))
    assert(e3.getMessage.contains("competing physical layouts"))
  }
}
