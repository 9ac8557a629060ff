package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[CommittedTable.restore]] / `CALL graft.restore` — roll back to a
  * retained generation as a NEW generation: content (data, schema,
  * vectors) is the anchor's, history rolls forward, retention knobs
  * keep their current values, aged-out targets are refused loudly. */
class RestoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-restore-$tag").toString + "/t"

  private def base() = Seq(
    (1L, "A", 10.0, 1L), (2L, "A", 20.0, 1L),
    (3L, "B", 30.0, 1L), (4L, "C", 40.0, 1L))
    .toDF("id", "status", "value", "version")

  private def ids(dir: String): Set[Long] =
    CommittedTable.read(spark, dir).select("id").as[Long].collect().toSet

  test("restore undoes DML as a new generation; the undone generations " +
      "stay readable; a second restore re-does") {
    val dir = freshDir("core")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"),
      retainGenerations = 5)
    CommittedTable.merge(spark, dir,
      Seq((5L, "C", 50.0, 1L)).toDF("id", "status", "value", "version"),
      "id", "version", "status")                        // gen 2
    CommittedTable.delete(spark, dir, $"id" <= 2L, "status") // gen 3
    assert(ids(dir) === Set(3L, 4L, 5L))
    CommittedTable.restore(spark, dir, 1L)              // gen 4
    assert(ids(dir) === Set(1L, 2L, 3L, 4L))
    val h = CommittedTable.history(spark, dir)
    assert(h.map(_.gen) === Seq(1L, 2L, 3L, 4L))
    assert(h.last.current)
    // the undone generation is still time-travel readable
    assert(CommittedTable.readAt(spark, dir, 3L)
      .select("id").as[Long].collect().toSet === Set(3L, 4L, 5L))
    // restoring the restore: back to the post-delete view
    CommittedTable.restore(spark, dir, 3L)              // gen 5
    assert(ids(dir) === Set(3L, 4L, 5L))
    // restoring the CURRENT generation is a no-op (no generation burned)
    CommittedTable.restore(spark, dir, 5L)
    assert(CommittedTable.history(spark, dir).last.gen === 5L)
  }

  test("retention knobs keep their CURRENT values across a restore " +
      "(rolling back data must not rewind the compliance clock)") {
    val dir = freshDir("retain")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"),
      retainGenerations = 2)
    CommittedTable.setRetention(spark, dir, 6)          // gen 2: retain 6
    CommittedTable.delete(spark, dir, $"id" === 1L, "status") // gen 3
    CommittedTable.restore(spark, dir, 2L)              // gen 4
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val m = CommittedTable.readManifest(fs,
      new org.apache.hadoop.fs.Path(dir)).get
    assert(m.retain === 6) // gen-1's retain=2 did NOT come back
    assert(ids(dir) === Set(1L, 2L, 3L, 4L))
  }

  test("an aged-out target is refused loudly with the readable range") {
    val dir = freshDir("aged")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"),
      retainGenerations = 2)
    CommittedTable.delete(spark, dir, $"id" === 1L, "status") // gen 2
    CommittedTable.delete(spark, dir, $"id" === 2L, "status") // gen 3
    val e = intercept[java.io.IOException] {
      CommittedTable.restore(spark, dir, 1L)
    }
    assert(e.getMessage.contains("not retained"), e.getMessage)
    // and a future generation is refused as unpublished
    intercept[java.io.IOException] {
      CommittedTable.restore(spark, dir, 99L)
    }
  }

  test("restore brings a generation's DELETION VECTORS back, and " +
      "restores the schema of its day") {
    val dir = freshDir("dv")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"),
      retainGenerations = 5)
    CommittedTable.deleteMor(spark, dir, $"id" === 2L, "status") // gen 2
    CommittedTable.compactPartitions(spark, dir, Seq("A"))       // gen 3
    CommittedTable.addColumns(spark, dir, Seq(("note", "STRING"))) // gen 4
    assert(CommittedTable.read(spark, dir).columns.contains("note"))
    CommittedTable.restore(spark, dir, 2L)                       // gen 5
    // the vector is live again: id=2 invisible, count metadata-exact
    assert(ids(dir) === Set(1L, 3L, 4L))
    assert(CommittedTable.count(spark, dir) === 3L)
    // gen-2 schema has no 'note'
    assert(!CommittedTable.read(spark, dir).columns.contains("note"))
  }

  test("SQL: CALL graft.restore rolls a sharded (>64-partition) table " +
      "back by reference") {
    val dir = freshDir("sql")
    spark.range(200).select(col("id"),
      format_string("p%03d", col("id") % 100).as("part"))
      .withColumn("version", lit(1L))
      .createOrReplaceTempView("restore_wide")
    spark.sql(
      s"""CREATE TABLE graft.`$dir` PARTITIONED BY (part)
          TBLPROPERTIES('keycol'='id', 'vercol'='version', 'retain'='4')
          AS SELECT * FROM restore_wide""")
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id % 2 = 0") // gen 2
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$dir`")
      .as[Long].head() === 100L)
    spark.sql(s"CALL graft.restore(table => '$dir', version => 1)")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$dir`")
      .as[Long].head() === 200L)
    assert(spark.sql(s"SELECT SUM(id) AS s FROM graft.`$dir`")
      .as[Long].head() === (0L until 200L).sum)
  }
}
