package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.CommittedTable

/** The `graft_changes` table-valued function (GraftTableFunctions):
  * Delta's `table_changes` surface — a generation range's CDF as one
  * SQL relation, each batch manifest-pruned to the partitions its
  * generation touched, tagged _commit_version/_commit_timestamp. */
class TableChangesSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-tvf-$tag").toString + "/t"

  private def seed(dir: String): Unit = {
    Seq((1L, "A", 10.0, 1L), (2L, "A", 20.0, 1L), (3L, "B", 30.0, 1L),
      (4L, "B", 40.0, 1L), (5L, "C", 50.0, 1L))
      .toDF("id", "status", "value", "version")
      .createOrReplaceTempView("tvf_src")
    spark.sql(
      s"""CREATE TABLE graft.`$dir` PARTITIONED BY (status)
          TBLPROPERTIES('keycol'='id', 'vercol'='version', 'retain'='5')
          AS SELECT * FROM tvf_src""") // gen 1
    spark.sql(
      s"""UPDATE graft.`$dir` SET value = value + 100.0, version = 2
          WHERE id IN (2, 3)""") // gen 2
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id = 4") // gen 3
  }

  test("range CDF == the per-generation changesCdf batches, tagged with " +
      "version and the anchor's publish timestamp") {
    val dir = freshDir("basic")
    seed(dir)
    val rows = spark.sql(
      s"""SELECT _commit_version, _change_type, id, value, version
          FROM graft_changes('$dir', 2)""")
      .as[(Long, String, Long, Double, Long)].collect().toSet
    assert(rows === Set(
      (2L, "update_preimage", 2L, 20.0, 1L),
      (2L, "update_postimage", 2L, 120.0, 2L),
      (2L, "update_preimage", 3L, 30.0, 1L),
      (2L, "update_postimage", 3L, 130.0, 2L),
      (3L, "delete", 4L, 40.0, 1L)))
    // every change row is attributed to the verb that published it
    assert(spark.sql(
      s"""SELECT DISTINCT _commit_version, _commit_operation
          FROM graft_changes('$dir', 2)""")
      .as[(Long, String)].collect().toSet ===
      Set((2L, "update"), (3L, "delete")))
    // defaulted to_version == explicit current; an explicit sub-range
    // restricts; gen 1 is all inserts
    val all = spark.sql(s"SELECT * FROM graft_changes('$dir', 1, 3)")
    assert(all.filter(col("_commit_version") === 1L &&
      col("_change_type") === "insert").count() === 5L)
    assert(spark.sql(s"SELECT * FROM graft_changes('$dir', 2, 2)")
      .count() === 4L)
    // _commit_timestamp is the generation anchor's publish time
    val hist = CommittedTable.history(spark, dir)
      .map(g => g.gen -> g.publishedAtMillis).toMap
    val ts = spark.sql(
      s"""SELECT DISTINCT _commit_version,
            CAST(_commit_timestamp AS LONG) * 1000 AS ms
          FROM graft_changes('$dir', 1)""")
      .as[(Long, Long)].collect().toMap
    ts.foreach { case (g, ms) =>
      assert(math.abs(ms - hist(g)) < 2000, s"gen $g: $ms vs ${hist(g)}") }
  }

  test("a deletion-vector generation feeds the TVF the same tombstones " +
      "a copy-on-write delete would") {
    val dir = freshDir("mor")
    seed(dir)
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "SET TBLPROPERTIES('deletemode'='mor')") // gen 4 (metadata-only)
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id = 5") // gen 5, MoR
    val rows = spark.sql(
      s"""SELECT _change_type, id FROM graft_changes('$dir', 4)""")
      .as[(String, Long)].collect().toSet
    // gen 4 rewrote nothing (empty batch); gen 5's vector reads as a
    // delete tombstone
    assert(rows === Set(("delete", 5L)))
  }

  test("loud contracts: missing roles, unpublished to_version, empty " +
      "range, non-literal args") {
    val dir = freshDir("err")
    Seq((1L, "A", 1.0)).toDF("id", "status", "value")
      .createOrReplaceTempView("tvf_bare")
    spark.sql(s"CREATE TABLE graft.`$dir` PARTITIONED BY (status) " +
      "AS SELECT * FROM tvf_bare")
    val e1 = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_changes('$dir', 1)").collect())
    assert(e1.getMessage.contains("keycol"))
    val dir2 = freshDir("err2")
    seed(dir2)
    val e2 = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_changes('$dir2', 1, 99)").collect())
    assert(e2.getMessage.contains("not been published"))
    val e3 = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_changes('$dir2', 3, 2)").collect())
    assert(e3.getMessage.contains("empty version range"))
    val e4 = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_changes('$dir2', id)").collect())
    assert(e4 != null)
  }

  test("a widened schema across the range aligns by name: pre-widen " +
      "batches NULL-fill the new column") {
    val dir = freshDir("widen")
    Seq((1L, "A", 10.0, 1L)).toDF("id", "status", "value", "version")
      .createOrReplaceTempView("tvf_w1")
    spark.sql(
      s"""CREATE TABLE graft.`$dir` PARTITIONED BY (status)
          TBLPROPERTIES('keycol'='id', 'vercol'='version', 'retain'='4')
          AS SELECT * FROM tvf_w1""") // gen 1
    CommittedTable.merge(spark, dir,
      Seq((2L, "A", 20.0, 1L, "x")).toDF("id", "status", "value", "version",
        "note"),
      "id", "version", "status",
      allowAddColumns = true) // gen 2: widens with `note`
    val rows = spark.sql(
      s"""SELECT _commit_version, _change_type, id, note
          FROM graft_changes('$dir', 1)""")
      .as[(Long, String, Long, Option[String])].collect().toSet
    assert(rows === Set(
      (1L, "insert", 1L, None),
      (2L, "insert", 2L, Some("x"))))
  }
}
