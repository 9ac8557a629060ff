package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.CommittedTable

/** Deletion vectors through the SQL surface: 'deletemode'='mor' routes
  * DELETE FROM through [[CommittedTable.deleteMor]], every SELECT
  * anti-joins live vectors, metadata COUNT stays scan-free and exact,
  * MIN/MAX bails to the scan with the identical answer. */
class DeleteVectorSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-dvsql-$tag").toString + "/t"

  private def hasScan(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("FileScan")

  private def segDirs(dir: String): Set[String] = {
    val s = Files.list(java.nio.file.Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("seg-")).toSet
    } finally s.close()
  }

  test("CTAS with deletemode=mor: SQL DELETE rewrites zero segments; " +
      "SELECT, COUNT, and time travel all read through the vector") {
    val dir = freshDir("mor")
    Seq((1L, "A", 10.0, 1L), (2L, "A", 20.0, 1L), (3L, "B", 30.0, 1L),
      (4L, "B", 40.0, 1L), (5L, "C", 50.0, 1L))
      .toDF("id", "status", "value", "version")
      .createOrReplaceTempView("dv_src")
    spark.sql(
      s"""CREATE TABLE graft.`$dir` PARTITIONED BY (status)
          TBLPROPERTIES('keycol'='id', 'vercol'='version',
                        'statscols'='value', 'deletemode'='mor')
          AS SELECT * FROM dv_src""")
    val segsBefore = segDirs(dir)
    spark.sql(s"DELETE FROM graft.`$dir` WHERE value >= 20.0 AND value <= 30.0")
    assert(segDirs(dir) === segsBefore) // merge-on-read: nothing rewritten
    assert(spark.sql(s"SELECT id FROM graft.`$dir`")
      .as[Long].collect().toSet === Set(1L, 4L, 5L))
    // metadata COUNT folds through the anti-join wrap: exact, no scan
    val c = spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$dir`")
    assert(!hasScan(c), c.queryExecution.executedPlan.toString)
    assert(c.as[Long].head() === 3L)
    val cf = spark.sql(
      s"SELECT COUNT(*) AS n FROM graft.`$dir` WHERE status = 'A'")
    assert(!hasScan(cf))
    assert(cf.as[Long].head() === 1L)
    // MIN/MAX on a dv'd partition: zone maps are conservative → scans,
    // same answer
    val mx = spark.sql(s"SELECT MAX(value) AS mx FROM graft.`$dir`")
    assert(hasScan(mx))
    assert(mx.as[Double].head() === 50.0)
    // time travel: the pre-delete generation has no vector
    val gens = CommittedTable.generations(spark, dir)
    val pre = spark.sql(
      s"SELECT COUNT(*) AS n FROM graft.`$dir` VERSION AS OF ${gens.init.last}")
    assert(pre.as[Long].head() === 5L)
  }

  test("ALTER TABLE toggles deletemode; empty value restores " +
      "copy-on-write; GROUP BY metadata fold stays exact through dvs") {
    val dir = freshDir("alter")
    Seq((1L, "A", 10.0, 1L), (2L, "A", 20.0, 1L), (3L, "B", 30.0, 1L),
      (4L, "B", 40.0, 1L))
      .toDF("id", "status", "value", "version")
      .createOrReplaceTempView("dv_src2")
    spark.sql(
      s"""CREATE TABLE graft.`$dir` PARTITIONED BY (status)
          TBLPROPERTIES('keycol'='id', 'vercol'='version')
          AS SELECT * FROM dv_src2""")
    spark.sql(
      s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES('deletemode'='mor')")
    val segsBefore = segDirs(dir)
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id = 1")
    assert(segDirs(dir) === segsBefore)
    // grouped metadata fold subtracts the vector
    val g = spark.sql(
      s"""SELECT status, COUNT(*) AS n FROM graft.`$dir` GROUP BY status""")
    assert(!hasScan(g), g.queryExecution.executedPlan.toString)
    assert(g.as[(String, Long)].collect().toSet === Set(("A", 1L), ("B", 2L)))
    // back to copy-on-write: the next delete rewrites its partition
    // (a fresh B segment — the old one lingers until GC ages it out)
    spark.sql(s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES('deletemode'='')")
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id = 3")
    assert((segDirs(dir) -- segsBefore).nonEmpty) // B was rewritten
    assert(spark.sql(s"SELECT id FROM graft.`$dir`")
      .as[Long].collect().toSet === Set(2L, 4L))
  }

  test("a SHARDED (>64-partition) table: the root's dvn summary turns " +
      "the wrap on without hydration; answers stay exact") {
    val dir = freshDir("sharded")
    spark.range(300).select(col("id"),
      format_string("p%03d", col("id") % 100).as("part"))
      .withColumn("version", lit(1L))
      .createOrReplaceTempView("dv_wide")
    spark.sql(
      s"""CREATE TABLE graft.`$dir` PARTITIONED BY (part)
          TBLPROPERTIES('keycol'='id', 'vercol'='version',
                        'deletemode'='mor')
          AS SELECT * FROM dv_wide""")
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id % 3 = 0")
    val c = spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$dir`")
    assert(!hasScan(c), c.queryExecution.executedPlan.toString)
    assert(c.as[Long].head() === 200L)
    assert(spark.sql(
      s"SELECT COUNT(*) AS n FROM graft.`$dir` WHERE id % 3 <> 0")
      .as[Long].head() === 200L)
    assert(spark.sql(
      s"SELECT SUM(id) AS s FROM graft.`$dir` WHERE part = 'p007'")
      .as[Long].head() === Seq(7L, 107L, 207L).filter(_ % 3 != 0).sum)
  }

  test("contracts: deletemode validates; MoR DELETE matching nothing " +
      "burns no generation through SQL") {
    val dir = freshDir("contracts")
    Seq((1L, "A", 1L)).toDF("id", "status", "version")
      .createOrReplaceTempView("dv_src3")
    spark.sql(
      s"""CREATE TABLE graft.`$dir` PARTITIONED BY (status)
          TBLPROPERTIES('keycol'='id', 'vercol'='version')
          AS SELECT * FROM dv_src3""")
    val e = intercept[Exception] {
      spark.sql(
        s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES('deletemode'='magic')")
    }
    assert(e.getMessage.contains("cow") && e.getMessage.contains("mor"))
    spark.sql(
      s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES('deletemode'='mor')")
    val g0 = CommittedTable.generations(spark, dir).last
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id = 999")
    assert(CommittedTable.generations(spark, dir).last === g0)
  }
}
