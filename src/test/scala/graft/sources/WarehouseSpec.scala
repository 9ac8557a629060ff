package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.fixtures.RawCsvFixture
import graft.operators.Pipelines

/** S5–S7 semantics + the scale property that matters: partition pruning.
  * The warehouse layout (city × txn_year) exists so A5-style analytics
  * read only the partitions they name — at 100 TB that's the difference
  * between a metadata lookup and a full scan. */
class WarehouseSpec extends SparkSpec {

  private lazy val rawDir = RawCsvFixture.write(
    Files.createTempDirectory("graft-wh-raw")).toString
  private lazy val whDir =
    Files.createTempDirectory("graft-wh").toString + "/building"

  private def load(): Unit =
    Warehouse.overwrite(Pipelines.building(spark, rawDir + "/*_a.csv"), whDir)

  test("overwrite + append dispositions") {
    load()
    val n1 = Warehouse.read(spark, whDir).count()
    assert(n1 === 4L)
    Warehouse.append(Pipelines.building(spark, rawDir + "/*_a.csv"), whDir)
    assert(Warehouse.read(spark, whDir).count() === 2 * n1)
    load() // overwrite resets
    assert(Warehouse.read(spark, whDir).count() === n1)
  }

  test("city/year filters prune partitions (scan reads only named partitions)") {
    load()
    val pruned = Warehouse.read(spark, whDir)
      .filter(col("city") === "宜蘭縣" && col("txn_year") === 2021)
    val plan = pruned.queryExecution.executedPlan
    // partition filters must appear as PartitionFilters on the scan, not
    // post-scan Filter over data columns
    assert(plan.toString.contains("PartitionFilters") &&
      plan.toString.contains("isnotnull(city"),
      s"expected partition filters in:\n$plan")
    assert(pruned.count() === 1L)
    // and the scan must actually select exactly the one named partition
    val scans = plan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val selected = scans.head.selectedPartitions
    assert(selected.partitionCount === 1, selected.toString)
  }

  test("q65 round-trip read shape prunes partitions before the analytic") {
    // the exact filter q65_warehouse_roundtrip applies after its write: the
    // scan must select only the two 宜蘭縣 partitions with txn_year >= 2010,
    // not read the warehouse and filter rows
    load()
    val back = Warehouse.read(spark, whDir)
      .filter(col("city") === "宜蘭縣" && col("txn_year") >= 2010)
    val scans = back.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.selectedPartitions.partitionCount === 2,
      scans.head.selectedPartitions.toString) // 宜蘭縣×2010 and 宜蘭縣×2021 only
    // and the analytic over the pruned read returns the q65 oracle rows
    val agg = Pipelines.avgPriceByYear(back, byCity = true)
      .orderBy(col("txn_year")).collect()
    assert(agg.map(r => (r.getAs[Int]("txn_year"),
      r.getAs[Double]("avg_unit_price_ping"), r.getAs[Long]("n_txns"))).toSeq ===
      Seq((2010, 99173.7, 1L), (2021, 49586.85, 1L)))
  }

  test("compact collapses append-accumulated small files, preserving data") {
    load()
    // three more append batches → ≥4 files in every populated partition
    (1 to 3).foreach { _ =>
      Warehouse.append(Pipelines.building(spark, rawDir + "/*_a.csv"), whDir)
    }
    def dataFiles(p: String) = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
        .filter(f => f.toString.endsWith(".parquet")).toSeq
    }
    val before = dataFiles(whDir).size
    val rowsBefore = Warehouse.read(spark, whDir).orderBy("position", "total_price")
      .drop("txn_year").collect().toSeq // txn_year dtype differs (partition-inferred)

    val dst = Files.createTempDirectory("graft-wh-compact").toString + "/building"
    Warehouse.compact(spark, whDir, dst)
    val after = dataFiles(dst)
    val nPartitions = Warehouse.read(spark, whDir)
      .select("city", "txn_year").distinct().count()
    assert(after.size === nPartitions, s"expected 1 file/partition, got: $after")
    assert(after.size < before)
    val rowsAfter = Warehouse.read(spark, dst).orderBy("position", "total_price")
      .drop("txn_year").collect().toSeq
    assert(rowsAfter === rowsBefore) // byte-identical rows, 4x fewer files
    load() // restore the 1-batch layout for other tests
  }

  test("writeBucketed + sampleBucketed: samples prune partitions from metadata") {
    import spark.implicits._
    val docs = graft.queries.Registry.table(spark, sf0001, "documents")
    val dir = Files.createTempDirectory("graft-wh-bucketed").toString + "/docs"
    Warehouse.writeBucketed(docs, dir, "doc_id", nGroups = 20)

    val sampled = Warehouse.sampleBucketed(spark, dir, 0.25)
    // output schema == the raw table's (bookkeeping columns are internal)
    assert(sampled.columns.toSeq === docs.columns.toSeq)
    // the whole point: the scan selects only the groups the fraction names
    // (ceil(0.25 × 20) = 5 of 20), decided from partition metadata alone
    val scans = sampled.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.selectedPartitions.partitionCount === 5,
      scans.head.selectedPartitions.toString)

    // and the pruned read selects EXACTLY the rows Sampling.sample selects
    // over the raw table — materializing the bucket changes IO, never the
    // sample
    val viaBuckets = sampled.select("doc_id").as[Long].collect().toSet
    val viaExpr = graft.operators.Sampling.sample(docs, "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(viaBuckets === viaExpr)

    // nested-sample property survives the bucketed path
    val smaller = Warehouse.sampleBucketed(spark, dir, 0.1)
      .select("doc_id").as[Long].collect().toSet
    assert(smaller.subsetOf(viaBuckets))

    // zero fraction: no rows, no scan surprises
    assert(Warehouse.sampleBucketed(spark, dir, 0.0).count() === 0L)
  }

  test("writeBucketed: reserved bookkeeping columns fail loudly, not silently overwrite") {
    val docs = graft.queries.Registry.table(spark, sf0001, "documents")
    val dir = Files.createTempDirectory("graft-wh-collide").toString + "/docs"
    val e = intercept[IllegalArgumentException] {
      Warehouse.writeBucketed(docs.withColumn("hash_bucket", lit(7)), dir, "doc_id")
    }
    assert(e.getMessage.contains("hash_bucket"))
    intercept[IllegalArgumentException] {
      Warehouse.writeBucketed(docs.withColumn("bucket_group", lit(7)), dir, "doc_id")
    }
  }

  test("sampleBucketed derives the cut from the table's own _layout") {
    import spark.implicits._
    val docs = graft.queries.Registry.table(spark, sf0001, "documents")
    val total = docs.count()
    val dir = Files.createTempDirectory("graft-wh-layout").toString + "/docs"
    Warehouse.writeBucketed(docs, dir, "doc_id", nGroups = 20)
    // simulate a table written under a DIFFERENT BUCKETS constant by
    // rewriting _layout to claim 2× the bucket domain: a fraction-0.5
    // sample must now cut at 10000 (= everything, since stored buckets are
    // 0..9999), proving the cut comes from _layout, not Sampling.BUCKETS
    Seq((40, 500, 20000, "doc_id"))
      .toDF("n_groups", "buckets_per_group", "n_buckets", "key_col")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_layout")
    assert(Warehouse.sampleBucketed(spark, dir, 0.5).count() === total)
  }

  test("merge: upsert/move/insert land, only affected partitions rewritten") {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-wh-merge").toString + "/t"
    // base: A={1,2,3} B={4,5} C={6} E={8,9}; E is never touched
    Seq((1L, "A", 10.0), (2L, "A", 20.0), (3L, "A", 30.0),
        (4L, "B", 40.0), (5L, "B", 50.0), (6L, "C", 60.0),
        (8L, "E", 80.0), (9L, "E", 90.0))
      .toDF("id", "status", "value").withColumn("version", lit(1L))
      .repartition(col("status"))
      .write.partitionBy("status").parquet(dir)
    def files(sub: String) =
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir, sub)).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(f => f.toString -> java.nio.file.Files.getLastModifiedTime(f))
        .toMap
    val eBefore = files("status=E")

    // id 2: in-place upsert; id 6: C→B move (C empties); id 7: insert into D
    val updates = Seq((2L, "A", 21.0), (6L, "B", 60.0), (7L, "D", 70.0))
      .toDF("id", "status", "value").withColumn("version", lit(2L))
    Warehouse.merge(spark, dir, updates, "id", "version", "status")

    val back = Warehouse.read(spark, dir)
      .select($"id", $"status", $"value", $"version").as[(Long, String, Double, Long)]
      .collect().toSet
    assert(back === Set(
      (1L, "A", 10.0, 1L), (2L, "A", 21.0, 2L), (3L, "A", 30.0, 1L),
      (4L, "B", 40.0, 1L), (5L, "B", 50.0, 1L), (6L, "B", 60.0, 2L),
      (7L, "D", 70.0, 2L), (8L, "E", 80.0, 1L), (9L, "E", 90.0, 1L)))
    // the emptied source partition of the moved key is gone entirely
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "status=C")))
    // untouched partition: same files, same mtimes — never rewritten
    assert(files("status=E") === eBefore)
    // no staging residue after publish
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir + ".merge-staging")))
  }

  test("merge is idempotent: replaying the same batch changes nothing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-wh-merge-idem").toString + "/t"
    Seq((1L, "A", 10.0), (2L, "B", 20.0))
      .toDF("id", "status", "value").withColumn("version", lit(1L))
      .write.partitionBy("status").parquet(dir)
    val updates = Seq((1L, "B", 11.0)).toDF("id", "status", "value")
      .withColumn("version", lit(2L))
    Warehouse.merge(spark, dir, updates, "id", "version", "status")
    val once = Warehouse.read(spark, dir)
      .select($"id", $"status", $"value", $"version").as[(Long, String, Double, Long)]
      .collect().toSet
    Warehouse.merge(spark, dir, updates, "id", "version", "status")
    val twice = Warehouse.read(spark, dir)
      .select($"id", $"status", $"value", $"version").as[(Long, String, Double, Long)]
      .collect().toSet
    assert(once === twice)
    assert(once === Set((1L, "B", 11.0, 2L), (2L, "B", 20.0, 1L)))
  }

  test("merge publishes the right dir for numeric-string partition values") {
    // partition inference would read dir status=007 as int 7 and publish a
    // phantom status=7 NEXT TO the stale original; the explicit string
    // schema must keep value == dir name
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-wh-merge-007").toString + "/t"
    Seq((1L, "007", 10.0), (2L, "042", 20.0))
      .toDF("id", "status", "value").withColumn("version", lit(1L))
      .write.partitionBy("status").parquet(dir)
    val updates = Seq((1L, "007", 11.0)).toDF("id", "status", "value")
      .withColumn("version", lit(2L))
    Warehouse.merge(spark, dir, updates, "id", "version", "status")
    val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(dirs).asScala
      .map(_.getFileName.toString).filter(_.startsWith("status=")).toSet
    assert(names === Set("status=007", "status=042"), names.toString)
    // and the superseded row is really gone (no duplicate from a phantom dir)
    val back = Warehouse.read(spark, dir)
      .select($"id", $"value", $"version").as[(Long, Double, Long)].collect().toSet
    assert(back === Set((1L, 11.0, 2L), (2L, 20.0, 1L)))
  }

  test("merge recovers a partition demoted by an interrupted publish") {
    // simulate a crash between demote and promote: the live dir is gone,
    // the only copy sits under .merge-prev — the next merge() must restore
    // it before reading, or those rows would silently vanish from the merge
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-wh-merge-crash").toString + "/t"
    Seq((1L, "A", 10.0), (2L, "B", 20.0))
      .toDF("id", "status", "value").withColumn("version", lit(1L))
      .write.partitionBy("status").parquet(dir)
    val prev = java.nio.file.Paths.get(dir + ".merge-prev")
    java.nio.file.Files.createDirectories(prev)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(dir, "status=B"), prev.resolve("status=B"))
    // the interrupted batch also left staging junk behind
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir + ".merge-staging"))
    val updates = Seq((1L, "A", 11.0)).toDF("id", "status", "value")
      .withColumn("version", lit(2L))
    Warehouse.merge(spark, dir, updates, "id", "version", "status")
    val back = Warehouse.read(spark, dir)
      .select($"id", $"status", $"value", $"version").as[(Long, String, Double, Long)]
      .collect().toSet
    assert(back === Set((1L, "A", 11.0, 2L), (2L, "B", 20.0, 1L)))
    assert(!java.nio.file.Files.exists(prev))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir + ".merge-staging")))
  }

  test("merge rejects a mismatched update schema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-wh-merge-schema").toString + "/t"
    Seq((1L, "A", 10.0)).toDF("id", "status", "value")
      .withColumn("version", lit(1L))
      .write.partitionBy("status").parquet(dir)
    val bad = Seq((2L, "A")).toDF("id", "status") // missing value/version
    val e = intercept[IllegalArgumentException] {
      Warehouse.merge(spark, dir, bad, "id", "version", "status")
    }
    assert(e.getMessage.contains("missing table columns"))
    // an EXTRA column is a widen request — rejected unless opted in (the
    // typo protection: a misspelt column must not become a table column)
    val extra = Seq((2L, "A", 20.0, 2L, "oops"))
      .toDF("id", "status", "value", "version", "valeu")
    val e2 = intercept[IllegalArgumentException] {
      Warehouse.merge(spark, dir, extra, "id", "version", "status")
    }
    assert(e2.getMessage.contains("allowAddColumns"))
  }

  test("merge schema evolution: widened batch, untouched partitions byte-identical, NULL-fill on read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-wh-evolve").toString + "/t"
    Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0))
      .toDF("id", "status", "value")
      .withColumn("version", lit(1L))
      .repartition($"status")
      .write.partitionBy("status").parquet(dir)
    val cFiles = java.nio.file.Files.list(java.nio.file.Paths.get(dir, "status=C"))
      .toArray.map(_.toString).filter(_.endsWith(".parquet")).sorted
    val cBytes = cFiles.map(f => java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)).toSeq)
    // widened batch: adds a trailing nullable `source` column, touches A only
    val upd = Seq((1L, "A", 11.0, 2L, "feed-7"))
      .toDF("id", "status", "value", "version", "source")
    Warehouse.merge(spark, dir, upd, "id", "version", "status",
      allowAddColumns = true)
    // untouched partitions: same files, same bytes (never opened or rewritten)
    val cFilesAfter = java.nio.file.Files.list(java.nio.file.Paths.get(dir, "status=C"))
      .toArray.map(_.toString).filter(_.endsWith(".parquet")).sorted
    assert(cFilesAfter.toSeq === cFiles.toSeq)
    assert(cFilesAfter.map(f => java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(f)).toSeq).toSeq === cBytes.toSeq)
    // evolved read: widened column present, NULL for old-generation rows
    val back = Warehouse.readEvolved(spark, dir, "status")
      .select($"id", $"status", $"value", $"version", $"source")
      .as[(Long, String, Double, Long, Option[String])].collect().toSet
    assert(back === Set(
      (1L, "A", 11.0, 2L, Some("feed-7")),
      (2L, "B", 20.0, 1L, None),
      (3L, "C", 30.0, 1L, None)))
    // the sidecar now pins the table schema: a later OLD-schema batch is
    // rejected loudly (it would silently drop `source` from rewritten
    // partitions otherwise)
    val old = Seq((2L, "B", 21.0, 2L)).toDF("id", "status", "value", "version")
    val e = intercept[IllegalArgumentException] {
      Warehouse.merge(spark, dir, old, "id", "version", "status")
    }
    assert(e.getMessage.contains("missing table columns"))
    // and a widened follow-up merge keeps working without re-opting-in the
    // widen flag (schema already matches the sidecar)
    val next = Seq((2L, "B", 22.0, 2L, "feed-8"))
      .toDF("id", "status", "value", "version", "source")
    Warehouse.merge(spark, dir, next, "id", "version", "status")
    val b2 = Warehouse.readEvolved(spark, dir, "status")
      .filter($"id" === 2L).select($"value", $"source")
      .as[(Double, Option[String])].collect().toSeq
    assert(b2 === Seq((22.0, Some("feed-8"))))
  }

  test("readEvolved: sidecar column in NO footer fails with the rerun remedy") {
    import spark.implicits._
    // simulate a widening merge that crashed between sidecar publish and
    // partition publish: the sidecar names `origin` but no file carries it
    val dir = Files.createTempDirectory("graft-wh-orphan-col").toString + "/t"
    Seq((1L, "A", 10.0)).toDF("id", "status", "value")
      .withColumn("version", lit(1L))
      .repartition($"status")
      .write.partitionBy("status").parquet(dir)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_table_columns"),
      "id\nvalue\nversion\norigin\n")
    val e = intercept[java.io.IOException] {
      Warehouse.readEvolved(spark, dir, "status")
    }
    assert(e.getMessage.contains("origin") && e.getMessage.contains("rerun"),
      e.getMessage)
  }

  test("column projection reaches the parquet scan (ReadSchema pruning)") {
    load()
    val df = Warehouse.read(spark, whDir).select("total_price")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<total_price:bigint>"), scan)
  }
}
