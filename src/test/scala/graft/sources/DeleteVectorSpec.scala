package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[CommittedTable.deleteMor]] — merge-on-read DELETE via deletion
  * vectors: answers identical to the copy-on-write delete with ZERO
  * segments rewritten; logical counts stay metadata-exact; rewrites
  * materialize and self-invalidate the vectors; time travel and CDF see
  * each generation's own vector state. */
class DeleteVectorSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-dv-$tag").toString + "/t"

  private def base() = Seq(
    (1L, "A", 10.0, 1L), (2L, "A", 20.0, 1L), (3L, "A", 30.0, 1L),
    (4L, "B", 40.0, 1L), (5L, "B", 50.0, 1L),
    (6L, "C", 60.0, 1L))
    .toDF("id", "status", "value", "version")

  private def segDirs(dir: String): Set[String] = {
    val s = Files.list(java.nio.file.Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("seg-")).toSet
    } finally s.close()
  }

  private def dvDirs(dir: String): Set[String] = {
    val s = Files.list(java.nio.file.Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("dv-")).toSet
    } finally s.close()
  }

  private def ids(dir: String): Set[Long] =
    CommittedTable.read(spark, dir).select("id").as[Long].collect().toSet

  test("MoR delete: answer == copy-on-write, zero segments rewritten, " +
      "metadata count stays exact") {
    val dir = freshDir("core")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"),
      statsCols = Seq("value"))
    val segsBefore = segDirs(dir)
    CommittedTable.deleteMor(spark, dir, $"value" >= 30.0 && $"value" <= 40.0,
      "status")
    // no segment written or removed — only a dv dir + manifest swap
    assert(segDirs(dir) === segsBefore)
    assert(dvDirs(dir).size === 1)
    assert(ids(dir) === Set(1L, 2L, 5L, 6L))
    // manifest-only count is LOGICAL
    assert(CommittedTable.count(spark, dir) === 4L)
    assert(CommittedTable.count(spark, dir, Some(Seq("A"))) === 2L)
    // a second MoR delete folds the prior vector (disjoint sets, exact)
    CommittedTable.deleteMor(spark, dir, $"id" === 2L, "status")
    assert(segDirs(dir) === segsBefore)
    assert(ids(dir) === Set(1L, 5L, 6L))
    assert(CommittedTable.count(spark, dir) === 3L)
    assert(CommittedTable.count(spark, dir, Some(Seq("A"))) === 1L)
  }

  test("matching nothing burns no generation; NULL predicate rows are " +
      "not matched (SQL DELETE contract)") {
    val dir = freshDir("noop")
    val df = Seq((1L, "A", Some(10.0), 1L), (2L, "A", None, 1L))
      .toDF("id", "status", "value", "version")
    CommittedTable.write(df, dir, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    val g0 = CommittedTable.history(spark, dir).last.gen
    CommittedTable.deleteMor(spark, dir, $"value" > 99.0, "status")
    assert(CommittedTable.history(spark, dir).last.gen === g0)
    // NULL comparison → not matched → row survives
    CommittedTable.deleteMor(spark, dir, $"value" < 99.0, "status")
    assert(ids(dir) === Set(2L))
  }

  test("time travel reads each generation's own vector state") {
    val dir = freshDir("tt")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"),
      retainGenerations = 4)
    CommittedTable.deleteMor(spark, dir, $"id" === 1L, "status") // gen 2
    CommittedTable.deleteMor(spark, dir, $"id" === 4L, "status") // gen 3
    assert(CommittedTable.readAt(spark, dir, 1L)
      .select("id").as[Long].collect().toSet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(CommittedTable.readAt(spark, dir, 2L)
      .select("id").as[Long].collect().toSet === Set(2L, 3L, 4L, 5L, 6L))
    assert(ids(dir) === Set(2L, 3L, 5L, 6L))
  }

  test("a rewrite of the partition MATERIALIZES the deletes and the " +
      "vector self-invalidates; a fresh MoR delete works after") {
    val dir = freshDir("mat")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    CommittedTable.deleteMor(spark, dir, $"id" === 1L, "status")
    // merge rewrites partition A: reads through the vector, restages
    CommittedTable.merge(spark, dir,
      Seq((3L, "A", 33.0, 2L)).toDF("id", "status", "value", "version"),
      "id", "version", "status")
    assert(ids(dir) === Set(2L, 3L, 4L, 5L, 6L))
    // the dv entry died with the rewrite: manifest serializes none
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val manifest = new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(
      fs.open(new Path(dir, "_commit"))), "UTF-8")
    assert(!manifest.contains("dv="), manifest)
    // counts exact post-materialization
    assert(CommittedTable.count(spark, dir) === 5L)
    CommittedTable.deleteMor(spark, dir, $"id" === 3L, "status")
    assert(ids(dir) === Set(2L, 4L, 5L, 6L))
  }

  test("compactPartitions sheds vectors; GC collects the unreferenced " +
      "vector dir once aged (recover path exercises the sweep)") {
    val dir = freshDir("shed")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"),
      retainGenerations = 1)
    CommittedTable.deleteMor(spark, dir, $"id".isin(1L, 4L), "status")
    assert(dvDirs(dir).size === 1)
    CommittedTable.compactPartitions(spark, dir, Seq("A", "B"))
    assert(ids(dir) === Set(2L, 3L, 5L, 6L))
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val manifest = new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(
      fs.open(new Path(dir, "_commit"))), "UTF-8")
    assert(!manifest.contains("dv="), manifest)
    // the dir survives the age gate for in-flight protection, but is
    // unreferenced by every retained manifest — the sweep is the shard
    // pattern (age-gated); content correctness doesn't depend on it
    assert(CommittedTable.count(spark, dir) === 4L)
  }

  test("CDF of a MoR generation emits the delete tombstones, exactly " +
      "like the copy-on-write delete's") {
    val cow = freshDir("cdfc"); val mor = freshDir("cdfm")
    for (d <- Seq(cow, mor))
      CommittedTable.write(base(), d, "status",
        keyCol = Some("id"), versionCol = Some("version"),
        retainGenerations = 3)
    CommittedTable.delete(spark, cow, $"id".isin(2L, 4L), "status")
    CommittedTable.deleteMor(spark, mor, $"id".isin(2L, 4L), "status")
    def cdf(d: String) = CommittedTable
      .changesCdf(spark, d, 2L, "id", "version")
      .select("id", CommittedTable.ChangeTypeColumn)
      .as[(Long, String)].collect().toSet
    assert(cdf(mor) === cdf(cow))
    assert(cdf(mor) === Set((2L, "delete"), (4L, "delete")))
    // keys-mode: a delete emits zero rows on both paths
    assert(CommittedTable.changesForKeys(spark, mor, 2L, "id", "version")
      .count() === 0L)
  }

  test("clone inherits vectors absolutely; the clone reads the MoR'd " +
      "view and can MoR-delete independently") {
    val src = freshDir("clsrc"); val dst = freshDir("cldst")
    CommittedTable.write(base(), src, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    CommittedTable.deleteMor(spark, src, $"id" === 6L, "status")
    CommittedTable.cloneShallow(spark, src, dst)
    assert(ids(dst) === Set(1L, 2L, 3L, 4L, 5L))
    assert(CommittedTable.count(spark, dst) === 5L)
    CommittedTable.deleteMor(spark, dst, $"id" === 1L, "status")
    assert(ids(dst) === Set(2L, 3L, 4L, 5L))
    assert(ids(src) === Set(1L, 2L, 3L, 4L, 5L)) // source untouched
  }
}
