package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Per-FILE zone maps (manifest `fs=` lines): the Delta/Iceberg
  * data-skipping model one level below partition pruning — a range
  * predicate over a surviving partition reads only the files whose
  * recorded (min, max) can overlap it. Captured in the same staged
  * read-back aggregate as the partition stats (the partition entry is
  * the in-Spark fold of its files'), consulted by GraftFileIndex at
  * plan time, conservative by construction (missing entry = keep). */
class FileSkipSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-fskip-$tag").toString + "/t"

  /** Planned file count of the COMMITTED scan (a dv'd read also carries
    * the vector's own small scan — exclude it by FileIndex type; an
    * aggregate's AQE wrapper hides its subtree from collect — unwrap). */
  private def scanned(df: DataFrame): Long = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collect {
      case s: FileSourceScanExec
          if s.relation.location.isInstanceOf[graft.sql.GraftFileIndex] => s
    } match {
      case Seq(s) => s.selectedPartitions.totalNumberOfFiles
      case other => fail(
        s"expected one committed scan, got ${other.size}:\n${df.queryExecution}")
    }
  }

  /** The deterministic salt (`spark_partition_id % n`) keys staged files
    * off the UPSTREAM partitioning — at test scale AQE would coalesce
    * the tiny staging shuffle back to one task per partition, so the
    * clustered-write fixtures run with AQE off (at real scale the
    * partitions exceed the advisory size and nothing coalesces). */
  private def withAqeOff[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  /** 4000 rows, two partitions, 4 range-clustered sorted files per
    * partition (upstream repartitionByRange makes the deterministic
    * salt a range bucket — the documented clustering recipe). */
  private def seedClustered(dir: String): Unit = {
    val src = spark.range(0, 4000)
      .select(when(col("id") % 2 === 0, "A").otherwise("B").as("part"),
        col("id").as("value"))
      .repartitionByRange(4, col("value"))
    withAqeOff {
      CommittedTable.write(src, dir, "part", statsCols = Seq("value"),
        sortCols = Seq("value"), filesPerPartition = 4)
    }
  }

  /** The recorded per-file bounds, straight from the manifest's fs=
    * lines: (leaf key, min, max). The hash repartition can merge two
    * salt groups of one partition into a task (files are "UP TO n per
    * partition"), so expectations derive from what was recorded, not a
    * fixed count. */
  private def fileBounds(dir: String): Seq[(String, Long, Long)] = {
    val m = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_commit")), "UTF-8")
    m.linesIterator.filter(_.startsWith("fs=")).map { l =>
      val a = l.stripPrefix("fs=").split('\t')
      // stat cells encode presence: v:<canonical value>, n: for NULL;
      // the key is path-escaped on disk ('/' -> %2F)
      (a(0).replace("%2F", "/"),
        a(1).stripPrefix("v:").toLong, a(2).stripPrefix("v:").toLong)
    }.toSeq
  }

  test("a range predicate reads only the overlapping files of surviving " +
      "partitions; answers match the full scan") {
    val dir = freshDir("basic")
    seedClustered(dir)
    val bounds = fileBounds(dir)
    val total = bounds.size
    assert(total >= 4, s"range-clustered multi-file layout, got $bounds")
    val all = spark.sql(s"SELECT * FROM graft.`$dir`")
    assert(scanned(all) === total)
    // [3500, 4000) lives in the top range bucket: exactly the files
    // whose recorded max reaches it survive — strictly fewer than all
    val expTop = bounds.count(_._3 >= 3500L)
    val top = spark.sql(
      s"SELECT SUM(value) AS s, COUNT(*) AS n FROM graft.`$dir` " +
        "WHERE value >= 3500")
    assert(scanned(top) === expTop && expTop < total,
      s"top-range skip: $expTop of $total")
    assert(top.as[(Long, Long)].head() === ((3500L until 4000L).sum, 500L))
    // a band keeps only the overlapping files
    val expMid = bounds.count(b => b._2 <= 2100L && b._3 >= 1900L)
    val mid = spark.sql(
      s"SELECT COUNT(*) AS n FROM graft.`$dir` " +
        "WHERE value >= 1900 AND value <= 2100")
    assert(scanned(mid) === expMid && expMid < total)
    assert(mid.as[Long].head() === 201L)
    // file skipping COMPOSES with partition pruning: only partition A's
    // overlapping files
    val aLeafs = partLeafs(dir)("A")
    val expBoth = bounds.count(b =>
      b._1.startsWith(aLeafs + "/") && b._3 >= 3500L)
    val both = spark.sql(
      s"SELECT COUNT(*) AS n FROM graft.`$dir` " +
        "WHERE part = 'A' AND value >= 3500")
    assert(scanned(both) === expBoth && expBoth < expTop)
    assert(both.as[Long].head() === 250L)
    // a same-column OR prunes as the UNION of its sides' intervals
    val expOr = bounds.count(b => b._2 < 100L || b._3 >= 3900L)
    val or = spark.sql(
      s"SELECT COUNT(*) AS n FROM graft.`$dir` " +
        "WHERE value < 100 OR value >= 3900")
    assert(scanned(or) === expOr && expOr < total,
      s"OR-union skip: $expOr of $total")
    assert(or.as[Long].head() === 200L)
    // IN probes as point intervals: only the files containing a probe
    val expIn = bounds.count(b =>
      (b._2 <= 50L && b._3 >= 50L) || (b._2 <= 3950L && b._3 >= 3950L))
    val in = spark.sql(
      s"SELECT COUNT(*) AS n FROM graft.`$dir` WHERE value IN (50, 3950)")
    assert(scanned(in) === expIn && expIn < total,
      s"IN-probe skip: $expIn of $total")
    assert(in.as[Long].head() === 2L)
    // a CROSS-column OR is genuinely unprunable: every file kept
    val orX = spark.sql(
      s"SELECT COUNT(*) AS n FROM graft.`$dir` " +
        "WHERE part = 'A' OR value >= 3900")
    assert(scanned(orX) === total)
    assert(orX.as[Long].head() === 2000L + 50L)
  }

  /** partition value → its current segment LEAF, from the manifest. */
  private def partLeafs(dir: String): Map[String, String] = {
    val m = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_commit")), "UTF-8")
    m.linesIterator
      .filter(l => l.nonEmpty && !l.contains("=") && l.contains("\tseg-"))
      .map { l => val a = l.split('\t'); a(0) -> a(1).split('/').last }
      .toMap
  }

  test("partition stats are exactly the fold of the recorded file stats; " +
      "a rewrite replaces the partition's fs= entries") {
    val dir = freshDir("fold")
    seedClustered(dir)
    def manifest(): String = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_commit")), "UTF-8")
    val m1 = manifest()
    val fsLines = m1.linesIterator.filter(_.startsWith("fs=")).toSeq
    assert(fsLines.size >= 4, s"one fs= line per data file:\n$m1")
    // fold of the per-file bounds == the partition zone map the metadata
    // MIN/MAX fold serves
    val mins = fsLines.map(_.split('\t')(1).stripPrefix("v:").toLong)
    val maxs = fsLines.map(_.split('\t')(2).stripPrefix("v:").toLong)
    assert(mins.min === 0L && maxs.max === 3999L)
    // rewriting partition A replaces its file entries in the serialized
    // manifest (dead-segment hygiene); B's ride along untouched
    CommittedTable.overwritePartitions(
      spark.sql(s"SELECT part, value FROM graft.`$dir` " +
        "WHERE part = 'A' AND value != 2"), dir)
    val m2 = manifest()
    val fs2 = m2.linesIterator.filter(_.startsWith("fs=")).toSeq
    val liveSegs = m2.linesIterator
      .filter(l => l.startsWith("A\t") || l.startsWith("B\t"))
      .map(_.split('\t')(1)).toSet
    fs2.foreach { l =>
      val leaf = l.stripPrefix("fs=").split('\t')(0)
        .replace("%2F", "/").split('/')(0)
      assert(liveSegs.exists(s => s.endsWith(leaf)),
        s"stale fs= entry for a dead segment: $l")
    }
    // B's clustered entries survive; A's rewrite recorded fresh ones
    assert(fs2.size >= 3, m2)
    val n = spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$dir` " +
      "WHERE value >= 3500")
    assert(n.as[Long].head() === 500L)
  }

  test("fs= lines ride manifest SHARDS above 64 partitions and keep " +
      "skipping after partial hydration") {
    val dir = freshDir("shard")
    val src = spark.range(0, 7000)
      .select(concat(lit("p"), format_string("%02d", col("id") % 70))
          .as("part"),
        col("id").as("value"))
      .repartitionByRange(2, col("value"))
    withAqeOff {
      CommittedTable.write(src, dir, "part", statsCols = Seq("value"),
        sortCols = Seq("value"), filesPerPartition = 2)
    }
    val root = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_commit")), "UTF-8")
    assert(root.linesIterator.exists(_.startsWith("shard=")), root)
    assert(!root.linesIterator.exists(_.startsWith("fs=")),
      "file stats live in the shards, not the root")
    // partition probe + range: the hydration reads the surviving shard,
    // the range keeps only the low-half file of p03
    val q = spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$dir` " +
      "WHERE part = 'p03' AND value < 3000")
    assert(scanned(q) === 1, "one of p03's two range-clustered files")
    assert(q.as[Long].head() ===
      (0L until 7000L).count(v => v % 70 == 3 && v < 3000))
  }

  test("a shallow clone inherits file stats (leaf-keyed, no rewrite) and " +
      "skips identically") {
    val dir = freshDir("clone-src")
    val cl = freshDir("clone-dst")
    seedClustered(dir)
    CommittedTable.cloneShallow(spark, dir, cl)
    val q = spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$cl` " +
      "WHERE value >= 3500")
    assert(scanned(q) === 2)
    assert(q.as[Long].head() === 500L)
  }

  test("compact(filesPerPartition, sortCols) RANGE-CLUSTERS the output: " +
      "per-file ranges are disjoint within a partition and skipping needs " +
      "no upstream recipe (explicit range partition count — AQE-proof)") {
    val dir = freshDir("compact")
    val src = spark.range(0, 4000)
      .select(when(col("id") % 2 === 0, "A").otherwise("B").as("part"),
        col("id").as("value"))
    CommittedTable.write(src, dir, "part", statsCols = Seq("value"))
    CommittedTable.compact(spark, dir, "part", sortCols = Seq("value"),
      filesPerPartition = 4)
    val bounds = fileBounds(dir)
    assert(bounds.size >= 6, s"~4 clustered files per partition: $bounds")
    // the range-clustered guarantee: within a partition, file ranges are
    // DISJOINT (each file a contiguous slice of the sort-key space)
    bounds.groupBy(_._1.split('/')(0)).foreach { case (leaf, fs) =>
      val sorted = fs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq((_, _, mxA), (_, mnB, _)) =>
          assert(mxA < mnB, s"overlapping file ranges in $leaf: $sorted")
        case _ =>
      }
    }
    val expTop = bounds.count(_._3 >= 3500L)
    val top = spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$dir` " +
      "WHERE value >= 3500")
    assert(scanned(top) === expTop && expTop < bounds.size)
    assert(top.as[Long].head() === 500L)
  }

  test("SQL: CALL graft.compact(sort_by, files_per_partition) produces " +
      "the range-clustered layout through pure SQL") {
    val dir = freshDir("call")
    val src = spark.range(0, 4000)
      .select(when(col("id") % 2 === 0, "A").otherwise("B").as("part"),
        col("id").as("value"))
    CommittedTable.write(src, dir, "part", statsCols = Seq("value"))
    spark.sql(s"CALL graft.compact(table => '$dir', sort_by => 'value', " +
      "files_per_partition => 4)")
    val bounds = fileBounds(dir)
    assert(bounds.size >= 6, s"~4 clustered files per partition: $bounds")
    val expTop = bounds.count(_._3 >= 3500L)
    val top = spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$dir` " +
      "WHERE value >= 3500")
    assert(scanned(top) === expTop && expTop < bounds.size)
    assert(top.as[Long].head() === 500L)
  }

  test("compactZOrder(filesPerPartition) range-clusters on the MORTON key: " +
      "file skipping works on BOTH z dimensions") {
    val dir = freshDir("zorder")
    val src = spark.range(0, 4000)
      .select(lit("A").as("part"), (col("id") % 64).as("x"),
        (col("id") / 64).cast("long").as("y"))
    CommittedTable.write(src, dir, "part", statsCols = Seq("x", "y"))
    CommittedTable.compactZOrder(spark, dir, "part", Seq("x", "y"),
      bits = 6, filesPerPartition = 8)
    val total = fileBounds(dir).size
    assert(total >= 6, s"expected ~8 z-clustered files, got $total")
    val qx = spark.sql(
      s"SELECT COUNT(*) AS n FROM graft.`$dir` WHERE x >= 0 AND x <= 7")
    assert(scanned(qx) < total, "x-range must skip z-tiles")
    assert(qx.as[Long].head() === (0L until 4000L).count(_ % 64 <= 7))
    val qy = spark.sql(
      s"SELECT COUNT(*) AS n FROM graft.`$dir` WHERE y >= 56")
    assert(scanned(qy) < total, "y-range must skip z-tiles")
    assert(qy.as[Long].head() === (0L until 4000L).count(_ / 64 >= 56))
  }

  test("bloom sidecars and file skipping COMPOSE on a point lookup: the " +
      "segment prune and the file prune stack") {
    val dir = freshDir("bloom")
    val src = spark.range(0, 4000)
      .select(when(col("id") % 2 === 0, "A").otherwise("B").as("part"),
        col("id").as("value"))
    CommittedTable.write(src, dir, "part", statsCols = Seq("value"),
      bloomCols = Seq("value"))
    CommittedTable.compact(spark, dir, "part", sortCols = Seq("value"),
      filesPerPartition = 4)
    val bounds = fileBounds(dir)
    // value = 42 is even → partition A only (bloom/zone agree); within
    // A, only the file whose range holds 42
    val exp = bounds.count { case (k, mn, mx) =>
      k.startsWith(partLeafs(dir)("A") + "/") && mn <= 42L && mx >= 42L }
    val q = spark.sql(
      s"SELECT COUNT(*) AS n FROM graft.`$dir` WHERE value = 42")
    assert(scanned(q) === exp && exp < bounds.size,
      s"point-lookup skip: $exp of ${bounds.size}")
    assert(q.as[Long].head() === 1L)
    // a value no file can hold plans ZERO files, answers zero rows
    val miss = spark.sql(
      s"SELECT COUNT(*) AS n FROM graft.`$dir` WHERE value = 999999")
    assert(scanned(miss) === 0)
    assert(miss.as[Long].head() === 0L)
  }

  test("readRangeMulti (the Scala ranged read) skips files with the same " +
      "fs= zone maps as the SQL path") {
    val dir = freshDir("scala")
    seedClustered(dir)
    val bs = fileBounds(dir)
    val exp = bs.count(_._3 >= 3500L)
    val df = CommittedTable.readRangeMulti(spark, dir,
      Seq(("value", Some(3500L), None)))
    assert(df.inputFiles.length === exp && exp < bs.size,
      s"Scala-path skip: ${df.inputFiles.length} vs $exp of ${bs.size}")
    assert(df.count() === 500L)
    // a range pruning EVERY file still answers empty with the schema
    val none = CommittedTable.readRangeMulti(spark, dir,
      Seq(("value", Some(999999L), None)))
    assert(none.count() === 0L)
    assert(none.columns.toSeq === Seq("part", "value"))
  }

  test("prefix LIKE on a string stats column prunes files by the " +
      "lexicographic range [prefix, next(prefix))") {
    val dir = freshDir("like")
    val src = spark.range(0, 4000)
      .select(lit("A").as("part"), format_string("k%04d", col("id")).as("key"))
    CommittedTable.write(src, dir, "part", statsCols = Seq("key"))
    CommittedTable.compact(spark, dir, "part", sortCols = Seq("key"),
      filesPerPartition = 4)
    val bounds = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_commit")), "UTF-8")
      .linesIterator.filter(_.startsWith("fs=")).map { l =>
        val a = l.stripPrefix("fs=").split('\t')
        (a(1).stripPrefix("v:"), a(2).stripPrefix("v:"))
      }.toSeq
    assert(bounds.size >= 3, s"clustered multi-file layout: $bounds")
    // LIKE 'k39%' → [k39, k3:) — LikeSimplification rewrites to StartsWith
    val exp = bounds.count { case (mn, mx) => mx >= "k39" && mn <= "k3:" }
    val q = spark.sql(
      s"SELECT COUNT(*) AS n FROM graft.`$dir` WHERE key LIKE 'k39%'")
    assert(scanned(q) === exp && exp < bounds.size,
      s"prefix skip: $exp of ${bounds.size}")
    assert(q.as[Long].head() === 100L)
  }

  test("deletion vectors compose with file skipping: the anti-join reads " +
      "the skipped scan, answers stay exact") {
    val dir = freshDir("dv")
    val src = spark.range(0, 4000)
      .select(when(col("id") % 2 === 0, "A").otherwise("B").as("part"),
        col("id").as("value"), lit(1L).as("version"))
      .repartitionByRange(4, col("value"))
    withAqeOff {
      CommittedTable.write(src, dir, "part", statsCols = Seq("value"),
        sortCols = Seq("value"), filesPerPartition = 4,
        keyCol = Some("value"), versionCol = Some("version"))
    }
    CommittedTable.deleteMor(spark, dir, col("value") % 10 === 7, "part")
    val q = spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$dir` " +
      "WHERE value >= 3500")
    assert(q.as[Long].head() === 500L - 50L)
    assert(scanned(q) === 2, "skipping unchanged under a live vector")
  }
}
