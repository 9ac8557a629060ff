package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.fixtures.RawCsvFixture
import graft.functions.HousePrice._
import graft.schema.Schemas.Raw

/** S4/S9 semantics (SURVEY §3.3): new-file pickup via pathGlobFilter,
  * append-only warehouse loads, and checkpointed exactly-once across
  * restarts — the Structured Streaming replacement for the reference's
  * Cloud-Function → Dataflow-template trigger. */
class FileArrivalSpec extends SparkSpec {

  private def transform(df: org.apache.spark.sql.DataFrame) =
    df.filter(col(Raw.transactionSign).startsWith("房地"))
      .select(
        cityFromFilename(col("source_file")).as("city"),
        col(Raw.townshipDist).as("township_dist"),
        rocToDate(col(Raw.transactionDate)).as("transaction_date"),
        col(Raw.totalPrice).cast("long").as("total_price"))
      .filter(col("transaction_date").isNotNull)

  test("availableNow micro-batch: picks up *a.csv only, appends, exactly-once on restart") {
    val in = Files.createTempDirectory("graft-stream-in")
    val out = Files.createTempDirectory("graft-stream-out").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString

    def copyFixture(name: String): Unit =
      Files.copy(RawCsvFixture.write(Files.createTempDirectory("fx")).resolve(name),
        in.resolve(name))

    copyFixture("101S4_g_lvr_land_a.csv")
    // decoy that must NOT match the glob
    Files.write(in.resolve("101S4_g_lvr_land_b.csv"),
      "x,y\n1,2\n".getBytes("UTF-8"))

    val schema = FileArrival.rawSchema(RawCsvFixture.header)
    def runOnce(): Unit = {
      val stream = FileArrival.readRaw(spark, in.toString, schema)
      val q = FileArrival.toWarehouse(transform(stream), out, ckpt).start()
      q.awaitTermination(60000)
    }

    runOnce()
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst === 2L) // file g: 2 valid building rows

    // restart with no new files: checkpoint prevents reprocessing
    runOnce()
    assert(spark.read.parquet(out).count() === 2L)

    // second file arrives; restart processes ONLY the new file
    copyFixture("110S1_a_lvr_land_a.csv")
    runOnce()
    val finalDf = spark.read.parquet(out)
    assert(finalDf.count() === 4L)
    assert(finalDf.filter(col("city") === "台北市").count() === 2L)
  }

  test("a 50-file burst drains in multiple BOUNDED micro-batches") {
    val in = Files.createTempDirectory("graft-burst-in")
    val out = Files.createTempDirectory("graft-burst-out").toString
    val ckpt = Files.createTempDirectory("graft-burst-ckpt")

    // 50 one-row files of the raw contract landing at once (a backfill
    // drop) — each carries a distinct valid building transaction
    val headerLine = "﻿" + RawCsvFixture.header.mkString(",")
    (0 until 50).foreach { i =>
      val row = Seq("礁溪鄉", "房地", s"大湖段${i}地號", "100", "661.158",
        "0990101", "110%02d%02d".format(i % 12 + 1, i % 28 + 1),
        s"${1000000L + i}", "15000").mkString(",")
      Files.write(in.resolve(f"101S4_g_burst$i%02d_lvr_land_a.csv"),
        s"$headerLine\n$row\n".getBytes("UTF-8"))
    }

    val schema = FileArrival.rawSchema(RawCsvFixture.header)
    val stream = FileArrival.readRaw(spark, in.toString, schema,
      maxFilesPerTrigger = 8)
    val q = FileArrival.toWarehouse(transform(stream), out, ckpt.toString).start()
    q.awaitTermination(120000)

    // every row of every file landed exactly once
    val result = spark.read.parquet(out)
    assert(result.count() === 50L)
    assert(result.select("total_price").as[Long](
      org.apache.spark.sql.Encoders.scalaLong).collect().toSet ===
      (0 until 50).map(1000000L + _).toSet)

    // the burst drained as ⌈50/8⌉ = 7 bounded batches, each checkpointed:
    // the offset log has one entry per committed micro-batch
    val offsetLog = ckpt.resolve("offsets").toFile.listFiles()
      .filter(f => f.getName.forall(_.isDigit))
    assert(offsetLog.length >= 7,
      s"expected >=7 bounded micro-batches, got ${offsetLog.length}")

    // and the per-batch input was BOUNDED at 8 files = 8 rows
    val commits = ckpt.resolve("commits").toFile.listFiles()
      .filter(f => f.getName.forall(_.isDigit))
    assert(commits.length === offsetLog.length,
      "every planned batch must have committed")
  }
}
