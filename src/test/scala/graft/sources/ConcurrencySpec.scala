package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Optimistic concurrency for partition-disjoint writers: a publish
  * carrying [[CommittedTable.Rebase]] credentials — a verb whose read
  * scope is provably a partition set ([[CommittedTable
  * .overwritePartitions]]: reads nothing; [[CommittedTable
  * .compactPartitions]]: reads exactly what it rewrites) — REBASES on
  * top of a concurrent winner instead of aborting, as long as the
  * winner touched only disjoint partitions and no table-level metadata
  * moved. Verbs that discover their scope by scanning (merge, delete)
  * keep the loud abort: a concurrent commit could have placed matching
  * rows where the finished scan no longer looks (the write-skew Delta
  * aborts with ConcurrentAppendException). Conflicts are injected
  * deterministically through the crashPoint hooks. */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-cc-$tag").toString + "/t"

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifest(dir: String) =
    CommittedTable.readManifest(fsOf(dir), new Path(dir)).get

  private def base() = Seq(
    (1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 30.0), (4L, "C", 40.0))
    .toDF("id", "status", "value")
    .withColumn("version", lit(1L))

  private def content(dir: String): Set[(Long, String, Double, Long)] =
    CommittedTable.read(spark, dir)
      .select($"id", $"status", $"value", $"version")
      .as[(Long, String, Double, Long)].collect().toSet

  test("overwritePartitions REBASES over a concurrent merge to a disjoint " +
      "partition: both commits land, no abort, both effects readable") {
    val dir = freshDir("rebase")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    // the injected winner: while the overwrite of partition C is staged
    // but unpublished, a merge upserts into partition A (disjoint)
    val batch = Seq((4L, "C", 44.0, 2L), (5L, "C", 55.0, 2L))
      .toDF("id", "status", "value", "version")
    var injected = false
    CommittedTable.overwritePartitions(batch, dir, crashPoint = {
      case "before-swap" if !injected =>
        injected = true
        CommittedTable.merge(spark, dir,
          Seq((1L, "A", 11.0, 2L)).toDF("id", "status", "value", "version"),
          "id", "version", "status")
      case _ => ()
    })
    assert(injected)
    // no exception: the overwrite rebased on top of the merge's commit.
    // gen 1 = write, 2 = merge (winner), 3 = rebased overwrite
    assert(manifest(dir).gen === 3L)
    assert(content(dir) === Set(
      (1L, "A", 11.0, 2L), (2L, "A", 20.0, 1L), (3L, "B", 30.0, 1L),
      (4L, "C", 44.0, 2L), (5L, "C", 55.0, 2L)))
  }

  test("overwritePartitions ABORTS when the concurrent winner rewrote the " +
      "SAME partition — overlap is never rebased") {
    val dir = freshDir("overlap")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    val batch = Seq((4L, "C", 44.0, 2L)).toDF("id", "status", "value", "version")
    var injected = false
    val boom = intercept[java.util.ConcurrentModificationException] {
      CommittedTable.overwritePartitions(batch, dir, crashPoint = {
        case "before-swap" if !injected =>
          injected = true
          CommittedTable.merge(spark, dir,
            Seq((6L, "C", 66.0, 2L)).toDF("id", "status", "value", "version"),
            "id", "version", "status")
        case _ => ()
      })
    }
    assert(boom.getMessage.contains("rewrote partition"))
    // the winner's state is intact; the loser's staging was cleaned up
    assert(content(dir) === Set(
      (1L, "A", 10.0, 1L), (2L, "A", 20.0, 1L), (3L, "B", 30.0, 1L),
      (4L, "C", 40.0, 1L), (6L, "C", 66.0, 2L)))
    val live = manifest(dir).segments.values.toSet
    val leftovers = fsOf(dir).listStatus(new Path(dir)).map(_.getPath.getName)
      .filter(_.startsWith("seg-g")).filterNot(live.contains)
      // the pre-winner gen-1 segments stay for the retain window
      .filterNot(_.startsWith("seg-g1-"))
    assert(leftovers.isEmpty, s"staged debris survived: ${leftovers.mkString(",")}")
  }

  test("rebase is REFUSED when the winner moved table-level metadata " +
      "(a new CHECK the staged rows never validated against)") {
    val dir = freshDir("meta")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    val batch = Seq((4L, "C", 44.0, 2L)).toDF("id", "status", "value", "version")
    var injected = false
    val boom = intercept[java.util.ConcurrentModificationException] {
      CommittedTable.overwritePartitions(batch, dir, crashPoint = {
        case "before-swap" if !injected =>
          injected = true
          CommittedTable.setChecks(spark, dir, Seq("pos" -> "value > 0"))
        case _ => ()
      })
    }
    assert(boom.getMessage.contains("table metadata"))
  }

  test("compactPartitions rewrites ONLY the named partitions, is content-" +
      "preserving, and coalesces their files") {
    val dir = freshDir("cpart")
    // A gets 8 rows spread over 8 input partitions so the staging salt
    // (spark_partition_id % filesPerPartition) actually fans out; B and C
    // stay single-row → single-file
    val wide = spark.sparkContext.parallelize(
      (1L to 8L).map(i => (i, "A", i * 10.0)) ++
        Seq((20L, "B", 30.0), (30L, "C", 40.0)), 8)
      .toDF("id", "status", "value").withColumn("version", lit(1L))
    // at spec scale AQE coalesces the salted staging shuffle back to one
    // tiny task (at real scale partitions are large and stay split); pin
    // it off so the fixture actually fragments
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try CommittedTable.write(wide, dir, "status", filesPerPartition = 4,
      keyCol = Some("id"), versionCol = Some("version"))
    finally spark.conf
      .set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val before = manifest(dir)
    val frag = CommittedTable.fragmentedPartitions(spark, dir, maxFiles = 1)
    // the selector must flag exactly the multi-file partitions the
    // manifest records — and the fixture must actually have produced one
    val multi = before.segments.collect { case (p, seg)
      if before.files(seg).size > 1 => p }.toSeq.sorted
    assert(frag === multi)
    assert(frag.contains("A"), s"fixture failed to fragment A: ${before.files}")
    CommittedTable.compactPartitions(spark, dir, frag)
    val after = manifest(dir)
    assert(after.gen === before.gen + 1)
    // untouched partitions carry their segment dirs BY REFERENCE
    (before.segments.keySet -- frag).foreach { p =>
      assert(after.segments(p) === before.segments(p)) }
    // compacted partitions: one file each, same rows
    frag.foreach { p =>
      assert(after.files(after.segments(p)).size === 1) }
    assert(content(dir) ===
      ((1L to 8L).map(i => (i, "A", i * 10.0, 1L)) ++
        Seq((20L, "B", 30.0, 1L), (30L, "C", 40.0, 1L))).toSet)
    assert(CommittedTable.fragmentedPartitions(spark, dir, maxFiles = 1).isEmpty)
  }

  test("compactPartitions REBASES over a disjoint concurrent merge — " +
      "maintenance never blocks ingestion") {
    val dir = freshDir("cpart-race")
    CommittedTable.write(base(), dir, "status", filesPerPartition = 3,
      keyCol = Some("id"), versionCol = Some("version"))
    var injected = false
    CommittedTable.compactPartitions(spark, dir, Seq("A"), crashPoint = {
      case "before-swap" if !injected =>
        injected = true
        CommittedTable.merge(spark, dir,
          Seq((7L, "B", 70.0, 2L)).toDF("id", "status", "value", "version"),
          "id", "version", "status")
      case _ => ()
    })
    assert(injected)
    val m = manifest(dir)
    assert(m.gen === 3L) // write, merge (winner), rebased compaction
    assert(m.files(m.segments("A")).size === 1)
    assert(content(dir) === Set(
      (1L, "A", 10.0, 1L), (2L, "A", 20.0, 1L), (3L, "B", 30.0, 1L),
      (7L, "B", 70.0, 2L), (4L, "C", 40.0, 1L)))
  }

  test("compactPartitions ABORTS when the concurrent winner touched a " +
      "partition it READ — readParts conflicts count like writes") {
    val dir = freshDir("cpart-overlap")
    CommittedTable.write(base(), dir, "status", filesPerPartition = 3,
      keyCol = Some("id"), versionCol = Some("version"))
    var injected = false
    val boom = intercept[java.util.ConcurrentModificationException] {
      CommittedTable.compactPartitions(spark, dir, Seq("A"), crashPoint = {
        case "before-swap" if !injected =>
          injected = true
          CommittedTable.merge(spark, dir,
            Seq((8L, "A", 80.0, 2L)).toDF("id", "status", "value", "version"),
            "id", "version", "status")
        case _ => ()
      })
    }
    assert(boom.getMessage.contains("rewrote partition"))
    // the winner's row is intact and the compaction left no trace
    assert(content(dir) === Set(
      (1L, "A", 10.0, 1L), (2L, "A", 20.0, 1L), (3L, "B", 30.0, 1L),
      (8L, "A", 80.0, 2L), (4L, "C", 40.0, 1L)))
  }

  test("merge NEVER rebases: its read scope is the whole table (key " +
      "location), so any concurrent commit aborts it loudly") {
    val dir = freshDir("merge-abort")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    var injected = false
    val boom = intercept[java.util.ConcurrentModificationException] {
      CommittedTable.merge(spark, dir,
        Seq((1L, "A", 11.0, 2L)).toDF("id", "status", "value", "version"),
        "id", "version", "status", crashPoint = {
          case "before-swap" if !injected =>
            injected = true
            // the winner writes a DISJOINT partition — still an abort:
            // it could have inserted a key the merge's finished
            // key-location scan no longer sees
            CommittedTable.overwritePartitions(
              Seq((5L, "D", 50.0, 1L)).toDF("id", "status", "value", "version"),
              dir)
          case _ => ()
        })
    }
    assert(boom.getMessage.contains("advanced the table"))
    // the documented remedy works: re-run on top of the winner
    CommittedTable.merge(spark, dir,
      Seq((1L, "A", 11.0, 2L)).toDF("id", "status", "value", "version"),
      "id", "version", "status")
    assert(content(dir) === Set(
      (1L, "A", 11.0, 2L), (2L, "A", 20.0, 1L), (3L, "B", 30.0, 1L),
      (4L, "C", 40.0, 1L), (5L, "D", 50.0, 1L)))
  }

  test("rebase composes with SHARDED manifests: the rebased publish " +
      "rewrites only the touched partition's shard") {
    val dir = freshDir("shard-rebase")
    // 200 partitions — past InlineMaxParts, so the manifest shards
    val wide = spark.range(400).select(col("id"),
      format_string("p%03d", col("id") % 200).as("part"),
      (col("id") * 2).cast("double").as("v"))
      .withColumn("version", lit(1L)).toDF()
    CommittedTable.write(wide, dir, "part",
      keyCol = Some("id"), versionCol = Some("version"))
    val batch = spark.range(2).select(col("id") + 1000L as "id",
      lit("p007").as("part"), lit(7.0).as("v"), lit(2L).as("version")).toDF()
    var injected = false
    CommittedTable.overwritePartitions(batch, dir, crashPoint = {
      case "before-swap" if !injected =>
        injected = true
        CommittedTable.merge(spark, dir,
          Seq((5000L, "p190", 9.0, 2L)).toDF("id", "part", "v", "version"),
          "id", "version", "part")
      case _ => ()
    })
    assert(injected)
    val m = manifest(dir)
    assert(m.gen === 3L)
    assert(m.shards.nonEmpty)
    val p7 = CommittedTable.read(spark, dir, Some(Seq("p007")))
      .select($"id").as[Long].collect().toSet
    assert(p7 === Set(1000L, 1001L))
    val p190 = CommittedTable.read(spark, dir, Some(Seq("p190")))
      .select($"id").as[Long].collect().toSet
    assert(p190 === Set(190L, 390L, 5000L))
  }

  test("mergeMor aborts loudly under contention with NO debris: staged " +
      "delta dirs and the vector dir are cleaned up, the re-run lands") {
    val dir = freshDir("mor-abort")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    def orphanDirs(): Set[String] = {
      val fs = fsOf(dir)
      val live = manifest(dir)
      val referenced = live.segments.values.toSet ++
        live.segments.keys.flatMap(p =>
          CommittedTable.liveDeltas(live, p)).map(_.dir) ++
        live.dvs.values.map(_.dir)
      fs.listStatus(new Path(dir)).toSeq
        .filter(st => st.isDirectory && {
          val n = st.getPath.getName
          (n.startsWith("seg-") || n.startsWith("dv-")) && !referenced(n)
        }).map(_.getPath.getName).toSet
    }
    var injected = false
    val boom = intercept[java.util.ConcurrentModificationException] {
      CommittedTable.mergeMor(spark, dir,
        Seq((1L, "A", 11.0, 2L)).toDF("id", "status", "value", "version"),
        "id", "version", "status", crashPoint = {
          case "before-swap" if !injected =>
            injected = true
            CommittedTable.overwritePartitions(
              Seq((5L, "D", 50.0, 1L)).toDF("id", "status", "value", "version"),
              dir)
          case _ => ()
        })
    }
    assert(boom.getMessage.contains("advanced the table"))
    // the loser's staged delta dirs were deleted by the abort and its
    // vector dir by the catch — nothing unreferenced remains (the
    // winner's own publish may legitimately have superseded gen-1
    // segments, which stay for the retention window — exclude by
    // checking only dirs of the ABORTED generation's stamp)
    val g = manifest(dir).gen
    assert(orphanDirs().forall(n => !n.contains(s"-g${g + 1}-")),
      s"aborted-generation debris left behind: ${orphanDirs()}")
    // the documented remedy: re-run on top of the winner
    CommittedTable.mergeMor(spark, dir,
      Seq((1L, "A", 11.0, 2L)).toDF("id", "status", "value", "version"),
      "id", "version", "status")
    assert(content(dir) === Set(
      (1L, "A", 11.0, 2L), (2L, "A", 20.0, 1L), (3L, "B", 30.0, 1L),
      (4L, "C", 40.0, 1L), (5L, "D", 50.0, 1L)))
  }
}
