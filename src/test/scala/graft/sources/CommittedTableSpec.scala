package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CommittedTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-ct-$tag").toString + "/t"

  private def base() = Seq(
    (1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 30.0), (4L, "C", 40.0))
    .toDF("id", "status", "value")
    .withColumn("version", lit(1L))

  // upsert id=1 (A), move id=3 B→A, retire C by moving its only row, insert id=9 (N)
  private def updates() = Seq(
    (1L, "A", 11.0, 2L), (3L, "A", 31.0, 2L), (4L, "N", 41.0, 2L),
    (9L, "N", 90.0, 2L))
    .toDF("id", "status", "value", "version")

  private val mergedExpected = Set(
    (1L, "A", 11.0, 2L), (2L, "A", 20.0, 1L), (3L, "A", 31.0, 2L),
    (4L, "N", 41.0, 2L), (9L, "N", 90.0, 2L))

  private def content(dir: String): Set[(Long, String, Double, Long)] =
    CommittedTable.read(spark, dir)
      .select($"id", $"status", $"value", $"version")
      .as[(Long, String, Double, Long)].collect().toSet

  test("write + read roundtrip; partition column survives as string data column") {
    val dir = freshDir("rt")
    CommittedTable.write(base(), dir, "status")
    assert(content(dir) === Set(
      (1L, "A", 10.0, 1L), (2L, "A", 20.0, 1L), (3L, "B", 30.0, 1L),
      (4L, "C", 40.0, 1L)))
    assert(CommittedTable.read(spark, dir).schema("status").dataType ===
      org.apache.spark.sql.types.StringType)
  }

  test("merge: upsert + partition move + retirement + insert, latest version wins") {
    val dir = freshDir("merge")
    CommittedTable.write(base(), dir, "status")
    CommittedTable.merge(spark, dir, updates(), "id", "version", "status")
    assert(content(dir) === mergedExpected)
    // B and C each lost their only row to a move: their entries are retired
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = CommittedTable.readManifest(fs, new org.apache.hadoop.fs.Path(dir)).get
    assert(m.segments.keySet === Set("A", "N"))
    assert(m.gen === 2L)
  }

  test("manifest pruning: a partition-value read plans ONLY selected segments") {
    val dir = freshDir("prune")
    CommittedTable.write(base(), dir, "status")
    val pruned = CommittedTable.read(spark, dir, Some(Seq("A")))
    // metadata-level pruning: the unselected segments never reach the plan
    assert(pruned.inputFiles.forall(_.contains("seg-g1-A")),
      pruned.inputFiles.mkString(","))
    assert(pruned.select("id").as[Long].collect().toSet === Set(1L, 2L))
    // prune-to-nothing keeps the schema, returns no rows
    val none = CommittedTable.read(spark, dir, Some(Seq("ZZZ")))
    assert(none.count() === 0 && none.columns.contains("value"))
  }

  test("schema evolution: widened batch NULL-fills old segments through the manifest column list") {
    val dir = freshDir("evolve")
    CommittedTable.write(base(), dir, "status")
    val widened = Seq((1L, "A", 11.0, 2L, "feed-7"))
      .toDF("id", "status", "value", "version", "origin")
    // widening is opt-in (typo protection), same contract as Warehouse.merge
    val e0 = intercept[IllegalArgumentException] {
      CommittedTable.merge(spark, dir, widened, "id", "version", "status")
    }
    assert(e0.getMessage.contains("allowAddColumns"))
    CommittedTable.merge(spark, dir, widened, "id", "version", "status",
      allowAddColumns = true)
    // only partition A was rewritten; B/C's old segments NULL-fill `origin`
    val back = CommittedTable.read(spark, dir)
      .select($"id", $"value", $"origin")
      .as[(Long, Double, Option[String])].collect().toSet
    assert(back === Set(
      (1L, 11.0, Some("feed-7")), (2L, 20.0, None), (3L, 30.0, None),
      (4L, 40.0, None)))
    // the manifest now pins the widened schema: old-schema batches rejected
    val old = Seq((2L, "A", 21.0, 3L)).toDF("id", "status", "value", "version")
    val e = intercept[IllegalArgumentException] {
      CommittedTable.merge(spark, dir, old, "id", "version", "status")
    }
    assert(e.getMessage.contains("missing table columns"))
    // widened follow-ups keep working without re-opting-in
    val next = Seq((3L, "B", 31.0, 3L, "feed-8"))
      .toDF("id", "status", "value", "version", "origin")
    CommittedTable.merge(spark, dir, next, "id", "version", "status")
    assert(CommittedTable.read(spark, dir).filter($"id" === 3L)
      .select($"origin").as[Option[String]].collect().toSeq === Seq(Some("feed-8")))
  }

  test("crash at every point before the swap leaves the OLD table fully visible; rerun converges") {
    val baseExpected = Set(
      (1L, "A", 10.0, 1L), (2L, "A", 20.0, 1L), (3L, "B", 30.0, 1L),
      (4L, "C", 40.0, 1L))
    Seq("before-staging", "after-staging", "before-swap").foreach { stage =>
      val dir = freshDir(s"crash-$stage")
      CommittedTable.write(base(), dir, "status")
      val boom = intercept[RuntimeException] {
        CommittedTable.merge(spark, dir, updates(), "id", "version", "status",
          crashPoint = s => if (s == stage) throw new RuntimeException(s"kill@$s"))
      }
      assert(boom.getMessage === s"kill@$stage")
      // reader sees the old generation EXACTLY — not partial, not mixed,
      // even with every new segment already renamed into the table dir
      assert(content(dir) === baseExpected, s"stage=$stage leaked a partial publish")
      // rerunning the same merge converges (idempotent latest-version-wins)
      CommittedTable.merge(spark, dir, updates(), "id", "version", "status")
      assert(content(dir) === mergedExpected, s"stage=$stage rerun diverged")
    }
  }

  test("crash after the swap: the NEW table is fully visible; rerun is a no-op on content") {
    val dir = freshDir("crash-post")
    CommittedTable.write(base(), dir, "status")
    val boom = intercept[RuntimeException] {
      CommittedTable.merge(spark, dir, updates(), "id", "version", "status",
        crashPoint = s => if (s == "after-swap") throw new RuntimeException("kill@after-swap"))
    }
    assert(boom.getMessage === "kill@after-swap")
    assert(content(dir) === mergedExpected)
    CommittedTable.merge(spark, dir, updates(), "id", "version", "status")
    assert(content(dir) === mergedExpected)
  }

  test("in-flight reader of the previous manifest survives one concurrent publish") {
    val dir = freshDir("grace")
    CommittedTable.write(base(), dir, "status")
    // the reader resolves the manifest at PLAN time (read()), collects later
    val snapshot = CommittedTable.read(spark, dir)
      .select($"id", $"status", $"value", $"version")
    CommittedTable.merge(spark, dir, updates(), "id", "version", "status")
    // superseded segments survive one merge cycle, so the pinned plan still reads
    assert(snapshot.as[(Long, String, Double, Long)].collect().toSet === Set(
      (1L, "A", 10.0, 1L), (2L, "A", 20.0, 1L), (3L, "B", 30.0, 1L),
      (4L, "C", 40.0, 1L)))
    // ...and a SECOND merge collects them (bounded garbage, not unbounded history)
    val more = Seq((2L, "A", 21.0, 3L)).toDF("id", "status", "value", "version")
    CommittedTable.merge(spark, dir, more, "id", "version", "status")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("seg-")).toSet
    assert(!segs.exists(_.startsWith("seg-g1-A")), s"two-cycles-old segment leaked: $segs")
  }

  test("orphaned segments from a crashed publish are collected and their names reused") {
    val dir = freshDir("gc")
    CommittedTable.write(base(), dir, "status")
    // crash after staging: gen-2 segments exist, manifest still gen-1
    intercept[RuntimeException] {
      CommittedTable.merge(spark, dir, updates(), "id", "version", "status",
        crashPoint = s => if (s == "before-swap") throw new RuntimeException("kill"))
    }
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(table).exists(_.getPath.getName.startsWith("seg-g2-")))
    // the rerun GCs the orphans, reuses generation 2, publishes cleanly
    CommittedTable.merge(spark, dir, updates(), "id", "version", "status")
    assert(content(dir) === mergedExpected)
    val m = CommittedTable.readManifest(fs, table).get
    assert(m.gen === 2L)
  }
}
