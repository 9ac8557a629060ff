package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** CommittedTable.cloneShallow — metadata-only table branching:
  * zero-copy birth, copy-on-write divergence, source independence, time
  * travel across the inherited history, and the documented
  * source-GC hazard with its compact remedy. */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-clone-$tag").toString + "/t"

  private def base() = Seq(
    (1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 30.0), (4L, "C", 40.0))
    .toDF("id", "status", "value")
    .withColumn("version", lit(1L))

  private def content(dir: String): Set[(Long, String, Double, Long)] =
    CommittedTable.read(spark, dir)
      .select($"id", $"status", $"value", $"version")
      .as[(Long, String, Double, Long)].collect().toSet

  private def localSegDirs(dir: String): Seq[String] = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(p)) Nil
    else {
      val s = java.nio.file.Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("seg-")).toSeq
      } finally s.close()
    }
  }

  private def writeSrc(): String = {
    val src = freshDir("src")
    CommittedTable.write(base(), src, "status", retainGenerations = 4,
      keyCol = Some("id"), versionCol = Some("version"),
      statsCols = Seq("value"))
    CommittedTable.merge(spark, src,
      Seq((1L, "A", 11.0, 2L), (9L, "D", 90.0, 1L))
        .toDF("id", "status", "value", "version"),
      "id", "version", "status")
    src
  }

  test("clone is metadata-only and reads identically to the source") {
    val src = writeSrc(); val dst = freshDir("dst")
    CommittedTable.cloneShallow(spark, src, dst)
    assert(localSegDirs(dst).isEmpty) // ZERO data files under the clone
    assert(content(dst) === content(src))
    // zone maps carried: a range read on the clone prunes from its own
    // manifest metadata and matches the filter recompute
    val pruned = CommittedTable.readRange(spark, dst, "value",
      Some(15.0), Some(35.0)).select($"id").as[Long].collect().toSet
    assert(pruned === Set(2L, 3L))
    // roles carried: routed SQL DML works on the clone out of the box
    spark.sql(s"DELETE FROM graft.`$dst` WHERE id = 9")
    assert(content(dst) === content(src) - ((9L, "D", 90.0, 1L)))
  }

  test("copy-on-write: DML on the clone stages locally, only affected partitions; source untouched") {
    val src = writeSrc(); val dst = freshDir("dst2")
    CommittedTable.cloneShallow(spark, src, dst)
    val before = content(src)
    CommittedTable.update(spark, dst, $"id" === 3L,
      Map("value" -> lit(33.0), "version" -> lit(2L)), "status",
      versionCol = Some("version"))
    // clone diverged, source identical
    assert(content(dst) === (before - ((3L, "B", 30.0, 1L)) + ((3L, "B", 33.0, 2L))))
    assert(content(src) === before)
    // exactly the rewritten partition (B) exists locally; A/C/D still
    // reference source bytes
    assert(localSegDirs(dst).size === 1)
    assert(localSegDirs(dst).head.contains("-B"))
  }

  test("source writes after the clone do not leak into the clone") {
    val src = writeSrc(); val dst = freshDir("dst3")
    CommittedTable.cloneShallow(spark, src, dst)
    val snapshot = content(dst)
    CommittedTable.merge(spark, src,
      Seq((2L, "A", 99.0, 3L)).toDF("id", "status", "value", "version"),
      "id", "version", "status")
    assert(content(src) !== snapshot)
    assert(content(dst) === snapshot) // the snapshot's segments are immutable
  }

  test("time travel works on the clone across the source's retained history") {
    val src = writeSrc(); val dst = freshDir("dst4")
    CommittedTable.cloneShallow(spark, src, dst)
    // gen 1 = pre-merge source content, through the CLONE's own anchors
    val g1 = CommittedTable.readAt(spark, dst, 1L)
      .select($"id", $"value").as[(Long, Double)].collect().toSet
    assert(g1 === Set((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0)))
    // the clone's own next publish continues the numbering and is CDC-visible
    CommittedTable.merge(spark, dst,
      Seq((5L, "A", 50.0, 1L)).toDF("id", "status", "value", "version"),
      "id", "version", "status")
    val p = new org.apache.hadoop.fs.Path(dst)
    val m = CommittedTable.readManifest(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration), p).get
    assert(m.gen === 3L)
    val delta = CommittedTable.changesFor(spark, dst, 3L)
      .select($"id").as[Long].collect().toSet
    assert(delta === Set(1L, 2L, 5L)) // partition A rewritten: carried 1,2 + new 5
  }

  test("the documented hazard and its remedy: source GC breaks a lazy clone; compact materializes it") {
    val src = writeSrc()
    val lazyClone = freshDir("dst5a"); val matClone = freshDir("dst5b")
    CommittedTable.cloneShallow(spark, src, lazyClone)
    CommittedTable.cloneShallow(spark, src, matClone)
    val snapshot = content(matClone)
    // materialize ONE of them: every partition rewritten locally
    CommittedTable.compact(spark, matClone, "status")
    assert(localSegDirs(matClone).size === 4)
    // age the snapshot generation out of the source's retain window
    // (retain=4: need gen > 2+3 so gen-2 segments GC)
    (3 to 7).foreach { v =>
      CommittedTable.merge(spark, src,
        Seq((1L, "A", v * 1.0, v.toLong)).toDF("id", "status", "value", "version"),
        "id", "version", "status")
    }
    // the materialized clone is immune
    assert(content(matClone) === snapshot)
    // the lazy clone's A-partition reference dangles once the source GC'd
    // the snapshot generation's rewritten segments
    val e = intercept[Exception] {
      CommittedTable.read(spark, lazyClone).collect()
    }
    assert(e.getMessage != null)
  }

  test("a clone of a bucketed table inherits the layout: its joins stay exchange-free") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val src = freshDir("bksrc"); val dst = freshDir("bkdst")
    val other = freshDir("bkother")
    CommittedTable.write(
      base().withColumn("cust", concat(lit("c"), ($"id" % 3).cast("string"))),
      src, "status", bucketBy = Some((4, Seq("cust"))))
    CommittedTable.write(
      Seq(("c0", "s0"), ("c1", "s1"), ("c2", "s2")).toDF("cust", "seg")
        .withColumn("status", lit("D")),
      other, "status", bucketBy = Some((4, Seq("cust"))))
    CommittedTable.cloneShallow(spark, src, dst)
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val j = spark.sql(
        s"""SELECT d.seg, COUNT(*) AS n FROM graft.`$dst` f
            JOIN graft.`$other` d ON f.cust = d.cust GROUP BY d.seg""")
      assert(j.as[(String, Long)].collect().toMap ===
        Map("s0" -> 1L, "s1" -> 2L, "s2" -> 1L))
      val smj = j.queryExecution.executedPlan
        .collectFirst { case s: SortMergeJoinExec => s }
      assert(smj.exists(_.collect { case e: ShuffleExchangeExec => e }.isEmpty),
        s"clone's bucketed join must stay exchange-free:\n${j.queryExecution.executedPlan}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("contracts: cloning onto an existing table or from a missing one fails loudly") {
    val src = writeSrc()
    val dst = freshDir("dst6")
    CommittedTable.cloneShallow(spark, src, dst)
    val e1 = intercept[IllegalArgumentException] {
      CommittedTable.cloneShallow(spark, src, dst)
    }
    assert(e1.getMessage.contains("fresh path"))
    val e2 = intercept[java.io.IOException] {
      CommittedTable.cloneShallow(spark, freshDir("nope"), freshDir("dst7"))
    }
    assert(e2.getMessage.contains("no committed table"))
  }
}
