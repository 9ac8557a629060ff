package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.CommittedTable

/** [[GraftMetadataAgg]]: groupless COUNT(*)/MIN/MAX over a committed
  * table answer from the manifest (row counts + zone maps) as a
  * LocalRelation — zero scan nodes — including under a partition-only
  * WHERE; every unanswerable shape falls back to the ordinary scan with
  * the identical result. */
class MetadataAggSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-ma-$tag").toString + "/t"

  private def hasScan(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("FileScan")

  private def fixture(): String = {
    val dir = freshDir("t")
    val df = Seq(
      (1L, "A", 10.5, "2026-01-03"), (2L, "A", 20.0, "2026-01-01"),
      (3L, "B", -5.0, "2026-02-10"), (4L, "C", 40.0, "2026-03-05"))
      .toDF("id", "status", "value", "day")
      .withColumn("day", to_date(col("day")))
      .withColumn("version", lit(1L))
    CommittedTable.write(df, dir, "status",
      statsCols = Seq("id", "value", "day"),
      keyCol = Some("id"), versionCol = Some("version"))
    dir
  }

  test("COUNT(*)/MIN/MAX fold from the manifest: no scan, exact answers, " +
      "types preserved") {
    val dir = fixture()
    val q = spark.sql(
      s"""SELECT COUNT(*) AS n, MIN(id) AS mn_id, MAX(id) AS mx_id,
                 MIN(value) AS mn_v, MAX(value) AS mx_v,
                 MIN(day) AS mn_d, MAX(day) AS mx_d
          FROM graft.`$dir`""")
    assert(!hasScan(q), q.queryExecution.executedPlan.toString)
    val r = q.head()
    assert(r.getLong(0) === 4L)
    assert(r.getLong(1) === 1L && r.getLong(2) === 4L)
    assert(r.getDouble(3) === -5.0 && r.getDouble(4) === 40.0)
    assert(r.getDate(5).toString === "2026-01-01")
    assert(r.getDate(6).toString === "2026-03-05")
  }

  test("partition-only WHERE composes: the fold restricts to surviving " +
      "partitions, still no scan") {
    val dir = fixture()
    val q = spark.sql(
      s"""SELECT MAX(value) AS mx, MIN(id) AS mn, COUNT(*) AS n
          FROM graft.`$dir` WHERE status = 'A'""")
    assert(!hasScan(q), q.queryExecution.executedPlan.toString)
    assert(q.as[(Double, Long, Long)].head() === ((20.0, 1L, 2L)))
    val in = spark.sql(
      s"""SELECT MIN(value) AS mn FROM graft.`$dir`
          WHERE status IN ('B', 'C')""")
    assert(!hasScan(in))
    assert(in.as[Double].head() === -5.0)
  }

  test("the fold tracks DML: a delete's rewritten stats answer the " +
      "post-delete extremes") {
    val dir = fixture()
    CommittedTable.delete(spark, dir, col("value") === -5.0, "status")
    val q = spark.sql(
      s"SELECT MIN(value) AS mn, COUNT(*) AS n FROM graft.`$dir`")
    assert(!hasScan(q))
    assert(q.as[(Double, Long)].head() === ((10.5, 3L)))
  }

  test("bails to the scan — same answer — for non-partition WHERE, " +
      "expressions, DISTINCT, and un-zone-mapped columns") {
    val dir = fixture()
    // non-partition filter: must scan
    val f = spark.sql(
      s"SELECT MIN(id) AS mn FROM graft.`$dir` WHERE value > 0")
    assert(hasScan(f))
    assert(f.as[Long].head() === 1L)
    // MIN of an expression: must scan
    val e = spark.sql(s"SELECT MIN(id + 1) AS mn FROM graft.`$dir`")
    assert(hasScan(e))
    assert(e.as[Long].head() === 2L)
    // COUNT DISTINCT: must scan
    val d = spark.sql(s"SELECT COUNT(DISTINCT status) AS n FROM graft.`$dir`")
    assert(hasScan(d))
    assert(d.as[Long].head() === 3L)
    // version is not in statsCols: must scan
    val u = spark.sql(s"SELECT MAX(version) AS mx FROM graft.`$dir`")
    assert(hasScan(u))
    assert(u.as[Long].head() === 1L)
  }

  test("MIN/MAX ignore NULLs: all-NULL segments skip the fold; an " +
      "all-NULL column answers typed NULL without a scan") {
    val dir = freshDir("nulls")
    val df = Seq(
      (1L, "A", Some(10.0)), (2L, "B", None), (3L, "B", None))
      .toDF("id", "status", "value").withColumn("version", lit(1L))
    CommittedTable.write(df, dir, "status", statsCols = Seq("value"),
      keyCol = Some("id"), versionCol = Some("version"))
    val q = spark.sql(s"SELECT MAX(value) AS mx FROM graft.`$dir`")
    assert(!hasScan(q))
    assert(q.head().getDouble(0) === 10.0)
    val b = spark.sql(
      s"SELECT MAX(value) AS mx FROM graft.`$dir` WHERE status = 'B'")
    assert(!hasScan(b))
    assert(b.head().isNullAt(0))
  }

  test("a schema-only-created EMPTY table answers COUNT 0 and NULL " +
      "extremes from metadata") {
    val dir = freshDir("empty")
    spark.sql(
      s"""CREATE TABLE graft.`$dir`
          (id BIGINT, status STRING, value DOUBLE, version BIGINT)
          PARTITIONED BY (status)
          TBLPROPERTIES('keycol'='id', 'vercol'='version',
                        'statscols'='value')""")
    val q = spark.sql(
      s"SELECT COUNT(*) AS n, MAX(value) AS mx FROM graft.`$dir`")
    assert(!hasScan(q))
    val r = q.head()
    assert(r.getLong(0) === 0L)
    assert(r.isNullAt(1))
  }

  test("string extremes use the column ordering, and the SQL result " +
      "matches the scan result on a sharded (>64-partition) table") {
    val dir = freshDir("sharded")
    val wide = spark.range(300).select(col("id"),
      format_string("p%03d", col("id") % 100).as("part"),
      (col("id") * 3 % 7).cast("double").as("v"))
      .withColumn("version", lit(1L)).toDF()
    CommittedTable.write(wide, dir, "part", statsCols = Seq("id", "v"),
      keyCol = Some("id"), versionCol = Some("version"))
    val q = spark.sql(
      s"""SELECT COUNT(*) AS n, MIN(id) AS mn, MAX(id) AS mx,
                 MAX(v) AS mxv
          FROM graft.`$dir`""")
    assert(!hasScan(q))
    assert(q.as[(Long, Long, Long, Double)].head() === ((300L, 0L, 299L, 6.0)))
    val filtered = spark.sql(
      s"""SELECT MAX(id) AS mx FROM graft.`$dir` WHERE part = 'p007'""")
    assert(!hasScan(filtered))
    assert(filtered.as[Long].head() === 207L)
  }

  test("GROUP BY the partition column folds per-partition: no scan, one " +
      "row per partition, composes with a partition-only WHERE") {
    val dir = fixture()
    val q = spark.sql(
      s"""SELECT status, COUNT(*) AS n, MIN(value) AS mn, MAX(id) AS mx
          FROM graft.`$dir` GROUP BY status""")
    assert(!hasScan(q), q.queryExecution.executedPlan.toString)
    assert(q.as[(String, Long, Double, Long)].collect().sortBy(_._1)
      .toSeq === Seq(("A", 2L, 10.5, 2L), ("B", 1L, -5.0, 3L),
        ("C", 1L, 40.0, 4L)))
    val w = spark.sql(
      s"""SELECT status, MAX(value) AS mx FROM graft.`$dir`
          WHERE status IN ('A', 'B') GROUP BY status""")
    assert(!hasScan(w))
    assert(w.as[(String, Double)].collect().sortBy(_._1).toSeq ===
      Seq(("A", 20.0), ("B", -5.0)))
  }

  test("GROUP BY fold tracks DML — a fully-deleted partition emits no " +
      "group, matching the scan") {
    val dir = fixture()
    CommittedTable.delete(spark, dir, col("status") === "B", "status")
    val q = spark.sql(
      s"""SELECT status, COUNT(*) AS n FROM graft.`$dir` GROUP BY status""")
    assert(!hasScan(q))
    assert(q.as[(String, Long)].collect().sortBy(_._1).toSeq ===
      Seq(("A", 2L), ("C", 1L)))
  }

  test("GROUP BY bails — same answer — for a non-partition column, an " +
      "expression over the partition column, and multi-key grouping") {
    val dir = fixture()
    val np = spark.sql(
      s"SELECT id, COUNT(*) AS n FROM graft.`$dir` GROUP BY id")
    assert(hasScan(np))
    assert(np.count() === 4L)
    val ex = spark.sql(
      s"""SELECT substring(status, 1, 1) AS s, COUNT(*) AS n
          FROM graft.`$dir` GROUP BY substring(status, 1, 1)""")
    assert(hasScan(ex))
    assert(ex.count() === 3L)
    val mk = spark.sql(
      s"""SELECT status, version, COUNT(*) AS n FROM graft.`$dir`
          GROUP BY status, version""")
    assert(hasScan(mk))
    assert(mk.count() === 3L)
  }
}
