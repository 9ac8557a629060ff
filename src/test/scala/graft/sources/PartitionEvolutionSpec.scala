package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[CommittedTable.repartitionTable]] — partition evolution: one
  * content-preserving generation re-keys the layout to a new partition
  * column; history serves each generation under its own layout, the
  * change feed sees a layout-only generation, roles survive, and the
  * contracts stay loud. */
class PartitionEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-pe-$tag").toString + "/t"

  private def base() = Seq(
    (1L, "A", "x", 10.0, 1L), (2L, "A", "y", 20.0, 1L),
    (3L, "B", "x", 30.0, 1L), (4L, "B", "y", 40.0, 1L),
    (5L, "C", "x", 50.0, 1L))
    .toDF("id", "status", "region", "value", "version")

  private def rows(dir: String): Set[(Long, String, String, Double, Long)] =
    CommittedTable.read(spark, dir)
      .select($"id", $"status", $"region", $"value", $"version")
      .as[(Long, String, String, Double, Long)].collect().toSet

  private def manifest(dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    CommittedTable.readManifest(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration), p).get
  }

  test("re-keys the layout, preserves content, carries roles; the new " +
      "column drives partition pruning") {
    val dir = freshDir("core")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"),
      statsCols = Seq("value"), retainGenerations = 4)
    val before = rows(dir)
    CommittedTable.repartitionTable(spark, dir, "region")
    assert(rows(dir) === before)
    val m = manifest(dir)
    assert(m.partitionCol === Some("region"))
    assert(m.segments.keySet === Set("x", "y"))
    assert(m.keyCol === Some("id") && m.verCol === Some("version"))
    assert(m.statsCols === Seq("value"))
    // metadata counts answer by the NEW key
    assert(CommittedTable.count(spark, dir, Some(Seq("x"))) === 3L)
    assert(CommittedTable.count(spark, dir, Some(Seq("y"))) === 2L)
    // DML keyed by the new layout works (partition col is now region)
    CommittedTable.merge(spark, dir,
      Seq((6L, "D", "y", 60.0, 1L))
        .toDF("id", "status", "region", "value", "version"),
      "id", "version", "region")
    assert(CommittedTable.count(spark, dir, Some(Seq("y"))) === 3L)
  }

  test("history serves each generation under its own layout; the " +
      "evolution generation's CDF is empty (layout is not change)") {
    val dir = freshDir("tt")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"),
      retainGenerations = 4)
    CommittedTable.repartitionTable(spark, dir, "region") // gen 2
    // the old anchor reads under the OLD layout
    assert(CommittedTable.readAt(spark, dir, 1L)
      .select($"id").as[Long].collect().toSet === Set(1L, 2L, 3L, 4L, 5L))
    assert(CommittedTable.rowCounts(spark, dir, gen = Some(1L))
      .get.keySet === Set("A", "B", "C"))
    assert(CommittedTable.rowCounts(spark, dir, gen = Some(2L))
      .get.keySet === Set("x", "y"))
    // a (key, version)-keyed feed sees NOTHING in a layout generation
    assert(CommittedTable.changesForKeys(spark, dir, 2L, "id", "version")
      .count() === 0L)
    assert(CommittedTable.changesCdf(spark, dir, 2L, "id", "version")
      .count() === 0L)
  }

  test("materializes MoR state: vectors and deltas die with the old " +
      "layout, answers unchanged") {
    val dir = freshDir("mor")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    CommittedTable.mergeMor(spark, dir,
      Seq((2L, "A", "y", 21.0, 2L))
        .toDF("id", "status", "region", "value", "version"),
      "id", "version", "status")
    CommittedTable.deleteMor(spark, dir, $"id" === 5L, "status")
    val before = rows(dir)
    CommittedTable.repartitionTable(spark, dir, "region")
    assert(rows(dir) === before)
    assert(CommittedTable.count(spark, dir) === 4L)
    val m = manifest(dir)
    assert(m.segments.keys.forall(p =>
      CommittedTable.liveDv(m, p).isEmpty &&
        CommittedTable.liveDeltas(m, p).isEmpty))
  }

  test("SQL: CALL graft.repartition_by evolves the layout; routed DML " +
      "keeps working against the new key") {
    val dir = freshDir("sql")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    spark.sql(s"CALL graft.repartition_by(table => '$dir', " +
      "column => 'region')")
    assert(manifest(dir).partitionCol === Some("region"))
    spark.sql(s"UPDATE graft.`$dir` SET value = value + 1.0, " +
      "version = version + 1 WHERE id = 1")
    assert(rows(dir).contains((1L, "A", "x", 11.0, 2L)))
    assert(spark.sql(
      s"SELECT COUNT(*) FROM graft.`$dir` WHERE region = 'x'")
      .as[Long].head === 3L)
  }

  test("contracts: same column, non-string column, unknown column, and " +
      "crash atomicity") {
    val dir = freshDir("refuse")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    val e1 = intercept[IllegalArgumentException] {
      CommittedTable.repartitionTable(spark, dir, "status")
    }
    assert(e1.getMessage.contains("already partitioned"))
    val e2 = intercept[IllegalArgumentException] {
      CommittedTable.repartitionTable(spark, dir, "value")
    }
    assert(e2.getMessage.contains("STRING"))
    val e3 = intercept[IllegalArgumentException] {
      CommittedTable.repartitionTable(spark, dir, "nope")
    }
    assert(e3.getMessage.contains("nope"))
    for (point <- Seq("before-staging", "after-staging", "before-swap")) {
      val before = rows(dir)
      intercept[RuntimeException] {
        CommittedTable.repartitionTable(spark, dir, "region",
          crashPoint = p => if (p == point) throw new RuntimeException(point))
      }
      assert(rows(dir) === before, s"mix visible after crash at $point")
      assert(manifest(dir).partitionCol === Some("status"))
    }
    CommittedTable.recover(spark, dir)
    CommittedTable.repartitionTable(spark, dir, "region")
    assert(manifest(dir).partitionCol === Some("region"))
  }
}
