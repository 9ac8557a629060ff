package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sources.CommittedTable

/** The `graft-table` streaming sink: format()-addressable committed-table
  * writes — table birth from the first batch, manifest-role inference,
  * idempotent replay, and the loud contracts. */
class CommittedSinkSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-sink-$tag").toString + "/t"

  private def drain(input: MemoryStream[(Long, String, Double, Long)],
      path: String, ckpt: String, opts: Map[String, String] = Map.empty) = {
    var w = input.toDF().toDF("id", "status", "value", "version")
      .writeStream.format("graft-table")
      .option("path", path).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
    opts.foreach { case (k, v) => w = w.option(k, v) }
    val q = w.start()
    q.awaitTermination(120000)
  }

  private def content(dir: String): Set[(Long, String, Double, Long)] =
    CommittedTable.read(spark, dir)
      .select($"id", $"status", $"value", $"version")
      .as[(Long, String, Double, Long)].collect().toSet

  test("first batch births the table with declared roles; later batches merge by manifest roles") {
    val dir = freshDir("birth")
    val ckpt = Files.createTempDirectory("graft-sink-ckpt").toString
    val input = MemoryStream[(Long, String, Double, Long)]
    input.addData((1L, "A", 10.0, 1L), (2L, "B", 20.0, 1L))
    drain(input, dir, ckpt, Map("key" -> "id", "versionCol" -> "version",
      "partitionCol" -> "status"))
    assert(content(dir) === Set((1L, "A", 10.0, 1L), (2L, "B", 20.0, 1L)))
    val p = new org.apache.hadoop.fs.Path(dir)
    val m = CommittedTable.readManifest(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration), p).get
    assert(m.keyCol === Some("id") && m.verCol === Some("version") &&
      m.partitionCol === Some("status"))

    // second micro-batch: NO role options — the manifest carries them.
    // Upsert id=1 (newer version), move id=2 B→C, insert id=3.
    input.addData((1L, "A", 11.0, 2L), (2L, "C", 21.0, 2L), (3L, "A", 30.0, 1L))
    drain(input, dir, ckpt)
    assert(content(dir) === Set(
      (1L, "A", 11.0, 2L), (2L, "C", 21.0, 2L), (3L, "A", 30.0, 1L)))
  }

  test("stale rows cannot clobber (idempotent-by-version = exactly-once effect)") {
    val dir = freshDir("stale")
    val ckpt = Files.createTempDirectory("graft-sink-ckpt2").toString
    val input = MemoryStream[(Long, String, Double, Long)]
    input.addData((1L, "A", 10.0, 5L))
    drain(input, dir, ckpt, Map("key" -> "id", "versionCol" -> "version",
      "partitionCol" -> "status"))
    // a replayed/late row with an OLDER version loses the arbitration —
    // the same reason a crash-replayed micro-batch is a no-op
    input.addData((1L, "A", 99.0, 3L))
    drain(input, dir, ckpt)
    assert(content(dir) === Set((1L, "A", 10.0, 5L)))
  }

  test("birth without roles fails loudly naming the missing option") {
    val dir = freshDir("noroles")
    val ckpt = Files.createTempDirectory("graft-sink-ckpt3").toString
    val input = MemoryStream[(Long, String, Double, Long)]
    input.addData((1L, "A", 10.0, 1L))
    val q = input.toDF().toDF("id", "status", "value", "version")
      .writeStream.format("graft-table")
      .option("path", dir).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[Exception] { q.awaitTermination(120000) }
    // roles are demanded in publish order; partitionCol is the first asked
    assert(e.getMessage.contains("option") &&
      e.getMessage.contains("manifest records none"))
    assert(CommittedTable.readManifest(
      new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(dir)).isEmpty)
  }

  test("complete output mode is refused at sink creation") {
    val dir = freshDir("mode")
    val input = MemoryStream[(Long, String, Double, Long)]
    val e = intercept[Exception] {
      input.toDF().toDF("id", "status", "value", "version")
        .groupBy($"status").count()
        .writeStream.format("graft-table")
        .option("path", dir)
        .option("checkpointLocation",
          Files.createTempDirectory("graft-sink-ckpt4").toString)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow()).start()
    }
    assert(e.getMessage.contains("complete") ||
      e.getMessage.contains("append"))
  }

  test("round trip: graft-changefeed source → graft-table sink replicates a table") {
    val srcDir = freshDir("rt-src")
    val dstDir = freshDir("rt-dst")
    val ckpt = Files.createTempDirectory("graft-sink-ckpt5").toString
    CommittedTable.write(
      Seq((1L, "A", 10.0), (2L, "B", 20.0)).toDF("id", "status", "value")
        .withColumn("version", org.apache.spark.sql.functions.lit(1L)),
      srcDir, "status", keyCol = Some("id"), versionCol = Some("version"))
    CommittedTable.merge(spark, srcDir,
      Seq((1L, "A", 11.0, 2L), (3L, "C", 30.0, 1L))
        .toDF("id", "status", "value", "version"),
      "id", "version", "status")
    // full-mode feed emits whole generations of upsert rows; the sink's
    // keyed merge collapses them into the replica — pure format() plumbing
    val q = spark.readStream.format("graft-changefeed")
      .option("path", srcDir)
      .load()
      .drop(ChangeFeed.GenColumn)
      .writeStream.format("graft-table")
      .option("path", dstDir).option("checkpointLocation", ckpt)
      .option("key", "id").option("versionCol", "version")
      .option("partitionCol", "status")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(content(dstDir) === Set(
      (1L, "A", 11.0, 2L), (2L, "B", 20.0, 1L), (3L, "C", 30.0, 1L)))
  }

  test("mergeMode='mor': micro-batches publish vectors + deltas, base " +
      "segments untouched; replayed rows tie and no-op") {
    val dir = freshDir("mor")
    val ckpt = Files.createTempDirectory("graft-sink-ckpt-mor").toString
    def segs(): Set[String] = {
      val st = Files.list(java.nio.file.Paths.get(dir))
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("seg-")).toSet
      } finally st.close()
    }
    val input = MemoryStream[(Long, String, Double, Long)]
    input.addData((1L, "A", 10.0, 1L), (2L, "B", 20.0, 1L))
    val opts = Map("key" -> "id", "versionCol" -> "version",
      "partitionCol" -> "status", "mergeMode" -> "mor")
    drain(input, dir, ckpt, opts) // birth: ordinary first publish
    val baseSegs = segs()
    // upsert + insert: MoR — the birth segments must survive untouched
    input.addData((1L, "A", 11.0, 2L), (3L, "A", 30.0, 1L))
    drain(input, dir, ckpt, opts)
    assert(baseSegs.subsetOf(segs()))
    assert(content(dir) === Set(
      (1L, "A", 11.0, 2L), (2L, "B", 20.0, 1L), (3L, "A", 30.0, 1L)))
    // replay the SAME rows (a crash between merge and checkpoint commit):
    // every row ties on (key, version) — the no-op publish is skipped,
    // not even a generation burns
    val genBefore = CommittedTable.history(spark, dir).last.gen
    input.addData((1L, "A", 11.0, 2L), (3L, "A", 30.0, 1L))
    drain(input, dir, ckpt, opts)
    assert(CommittedTable.history(spark, dir).last.gen === genBefore)
    assert(content(dir) === Set(
      (1L, "A", 11.0, 2L), (2L, "B", 20.0, 1L), (3L, "A", 30.0, 1L)))
    // a bad mode fails loudly at sink creation
    val e = intercept[Exception] {
      drain(input, dir, ckpt, opts + ("mergeMode" -> "sideways"))
    }
    assert(e.getMessage.contains("mergeMode") ||
      Option(e.getCause).exists(_.getMessage.contains("mergeMode")))
  }
}
