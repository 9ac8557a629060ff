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
    // (segment names are seg-g<gen>-<nonce>-<value>)
    assert(pruned.inputFiles.nonEmpty &&
      pruned.inputFiles.forall(f => f.contains("seg-g1-") && f.contains("-A/")),
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
    assert(!segs.exists(_.startsWith("seg-g1-")), s"two-cycles-old segment leaked: $segs")
  }

  test("orphaned segments from a crashed publish are collected; the generation is reused") {
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
    // the rerun GCs the orphans, reuses generation 2 (nonce-unique segment
    // names — no dir-name collision with the crashed attempt), publishes
    CommittedTable.merge(spark, dir, updates(), "id", "version", "status")
    assert(content(dir) === mergedExpected)
    val m = CommittedTable.readManifest(fs, table).get
    assert(m.gen === 2L)
  }

  test("racing merges: exactly one wins, the loser raises and its retry lands on top") {
    val dir = freshDir("race")
    CommittedTable.write(base(), dir, "status")
    // writer B publishes BETWEEN writer A's staging and A's swap — the
    // classic lost-update interleaving that used to silently drop B
    val winner = Seq((2L, "A", 22.0, 2L)).toDF("id", "status", "value", "version")
    var interleaved = false
    val boom = intercept[java.util.ConcurrentModificationException] {
      CommittedTable.merge(spark, dir, updates(), "id", "version", "status",
        crashPoint = s => if (s == "after-staging" && !interleaved) {
          interleaved = true
          CommittedTable.merge(spark, dir, winner, "id", "version", "status")
        })
    }
    assert(boom.getMessage.contains("re-run the merge"))
    // the winner's generation is fully visible — nothing vanished
    assert(content(dir) === Set(
      (1L, "A", 10.0, 1L), (2L, "A", 22.0, 2L), (3L, "B", 30.0, 1L),
      (4L, "C", 40.0, 1L)))
    // the loser's staged segments were cleaned up
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = CommittedTable.readManifest(fs, table).get
    val live = m.segments.values.toSet
    val onDisk = fs.listStatus(table).map(_.getPath.getName)
      .filter(_.startsWith("seg-")).toSet
    assert(onDisk.forall(s => live(s) || s.startsWith("seg-g1-")),
      s"loser's staging leaked: ${onDisk -- live}")
    // retrying the loser merges ON TOP of the winner: winner-then-retry
    CommittedTable.merge(spark, dir, updates(), "id", "version", "status")
    assert(content(dir) === Set(
      (1L, "A", 11.0, 2L), (2L, "A", 22.0, 2L), (3L, "A", 31.0, 2L),
      (4L, "N", 41.0, 2L), (9L, "N", 90.0, 2L)))
  }

  test("a crashed writer's claim blocks the generation; recover clears it") {
    val dir = freshDir("claim")
    CommittedTable.write(base(), dir, "status")
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a writer that died between claim and swap
    fs.create(new org.apache.hadoop.fs.Path(table, "_claim-g2"), false).close()
    val boom = intercept[java.util.ConcurrentModificationException] {
      CommittedTable.merge(spark, dir, updates(), "id", "version", "status")
    }
    assert(boom.getMessage.contains("recover"))
    assert(content(dir) === Set(      // table untouched by the refused merge
      (1L, "A", 10.0, 1L), (2L, "A", 20.0, 1L), (3L, "B", 30.0, 1L),
      (4L, "C", 40.0, 1L)))
    CommittedTable.recover(spark, dir)
    CommittedTable.merge(spark, dir, updates(), "id", "version", "status")
    assert(content(dir) === mergedExpected)
  }

  test("NULL or empty-string partition values are rejected loudly, not silently dropped") {
    val dir = freshDir("nullpart")
    CommittedTable.write(base(), dir, "status")
    val nullUpd = Seq((7L, null.asInstanceOf[String], 70.0, 2L))
      .toDF("id", "status", "value", "version")
    val e1 = intercept[IllegalArgumentException] {
      CommittedTable.merge(spark, dir, nullUpd, "id", "version", "status")
    }
    assert(e1.getMessage.contains("NULL"))
    val emptyUpd = Seq((8L, "", 80.0, 2L))
      .toDF("id", "status", "value", "version")
    val e2 = intercept[IllegalArgumentException] {
      CommittedTable.merge(spark, dir, emptyUpd, "id", "version", "status")
    }
    assert(e2.getMessage.toLowerCase.contains("empty-string"))
    // the refused merges changed nothing and the table still accepts writes
    assert(content(dir) === Set(
      (1L, "A", 10.0, 1L), (2L, "A", 20.0, 1L), (3L, "B", 30.0, 1L),
      (4L, "C", 40.0, 1L)))
    CommittedTable.merge(spark, dir, updates(), "id", "version", "status")
    assert(content(dir) === mergedExpected)
    // and write() itself refuses a NULL-partition initial load
    val dir2 = freshDir("nullpart2")
    intercept[IllegalArgumentException] {
      CommittedTable.write(
        Seq((1L, null.asInstanceOf[String], 1.0)).toDF("id", "status", "value")
          .withColumn("version", lit(1L)),
        dir2, "status")
    }
  }

  test("compact: N merges → one fresh-gen sorted segment per partition, content identical") {
    val dir = freshDir("compact")
    CommittedTable.write(base(), dir, "status")
    CommittedTable.merge(spark, dir, updates(), "id", "version", "status")
    val more = Seq((5L, "A", 50.0, 3L), (6L, "N", 60.0, 3L))
      .toDF("id", "status", "value", "version")
    CommittedTable.merge(spark, dir, more, "id", "version", "status")
    val expected = mergedExpected ++ Set((5L, "A", 50.0, 3L), (6L, "N", 60.0, 3L))
    assert(content(dir) === expected)
    // in-flight reader pins the pre-compact manifest at plan time
    val snapshot = CommittedTable.read(spark, dir)
      .select($"id", $"status", $"value", $"version")
    CommittedTable.compact(spark, dir, "status", sortCols = Seq("id"))
    // content untouched, layout canonical
    assert(content(dir) === expected)
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = CommittedTable.readManifest(fs, table).get
    assert(m.gen === 4L)
    assert(m.segments.keySet === Set("A", "N"))
    // every live segment is the compact generation with exactly ONE file,
    // rows sorted by the requested canonical order
    m.segments.values.foreach { seg =>
      assert(seg.startsWith("seg-g4-"), seg)
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(table, seg))
        .map(_.getPath).filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"$seg has ${files.length} files")
      val ids = spark.read.parquet(files.head.toString)
        .select("id").as[Long].collect().toSeq
      assert(ids === ids.sorted, s"$seg rows not id-sorted: $ids")
    }
    // the pre-compact reader survives (one-cycle segment grace)
    assert(snapshot.as[(Long, String, Double, Long)].collect().toSet === expected)
    // compact is fenced like any publish: a racing writer still loses loudly
    CommittedTable.merge(spark, dir,
      Seq((1L, "A", 12.0, 4L)).toDF("id", "status", "value", "version"),
      "id", "version", "status")
    assert(CommittedTable.readManifest(fs, table).get.gen === 5L)
  }

  test("time travel: readAt serves every retained generation; aged-out fails with the window") {
    val dir = freshDir("tt")
    val baseExpected = Set(
      (1L, "A", 10.0, 1L), (2L, "A", 20.0, 1L), (3L, "B", 30.0, 1L),
      (4L, "C", 40.0, 1L))
    CommittedTable.write(base(), dir, "status", retainGenerations = 3)
    CommittedTable.merge(spark, dir, updates(), "id", "version", "status") // gen 2
    val more = Seq((2L, "A", 21.0, 3L)).toDF("id", "status", "value", "version")
    CommittedTable.merge(spark, dir, more, "id", "version", "status")      // gen 3
    assert(CommittedTable.generations(spark, dir) === Seq(1L, 2L, 3L))
    def at(g: Long) = CommittedTable.readAt(spark, dir, g)
      .select($"id", $"status", $"value", $"version")
      .as[(Long, String, Double, Long)].collect().toSet
    // each retained generation reads back EXACTLY as it was published
    assert(at(1L) === baseExpected)
    assert(at(2L) === mergedExpected)
    assert(at(3L) === mergedExpected - ((2L, "A", 20.0, 1L)) + ((2L, "A", 21.0, 3L)))
    assert(at(3L) === content(dir))
    // gen 4 pushes gen 1 out of the retain-3 window: anchor AND segments go
    CommittedTable.merge(spark, dir,
      Seq((9L, "N", 91.0, 4L)).toDF("id", "status", "value", "version"),
      "id", "version", "status")
    assert(CommittedTable.generations(spark, dir) === Seq(2L, 3L, 4L))
    val e = intercept[java.io.IOException] {
      CommittedTable.readAt(spark, dir, 1L)
    }
    assert(e.getMessage.contains("not retained") &&
      e.getMessage.contains("retainGenerations"), e.getMessage)
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(table).exists(_.getPath.getName.startsWith("seg-g1-")),
      "aged-out generation's segments leaked")
    // snapshot SCHEMA too: a widen at gen 5 is invisible at gen 4
    val widened = Seq((1L, "A", 12.0, 5L, "feed-9"))
      .toDF("id", "status", "value", "version", "origin")
    CommittedTable.merge(spark, dir, widened, "id", "version", "status",
      allowAddColumns = true)                                              // gen 5
    assert(CommittedTable.read(spark, dir).columns.contains("origin"))
    assert(!CommittedTable.readAt(spark, dir, 4L).columns.contains("origin"))
    // manifest pruning composes with time travel (metadata-only both ways)
    val pruned = CommittedTable.readAt(spark, dir, 4L, Some(Seq("N")))
    assert(pruned.select("id").as[Long].collect().toSet === Set(4L, 9L))
  }

  test("delete: matching rows go, only touched partitions rewrite, NULL = kept") {
    val dir = freshDir("del")
    // a NULL value rides along: the predicate must treat it as NOT matched
    val withNull = base().unionByName(
      Seq((7L, "A", 1L)).toDF("id", "status", "version")
        .withColumn("value", lit(null).cast("double"))
        .select("id", "status", "value", "version"))
    CommittedTable.write(withNull, dir, "status", retainGenerations = 3)
    CommittedTable.delete(spark, dir, $"value" >= 20.0 && $"value" < 40.0,
      "status") // hits A(20) and B(30); C(40) and the NULL row survive
    assert(CommittedTable.read(spark, dir).select($"id", $"status")
      .as[(Long, String)].collect().toSet ===
      Set((1L, "A"), (4L, "C"), (7L, "A")))
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = CommittedTable.readManifest(fs, table).get
    assert(m.gen === 2L)
    // B lost its only row: retired. C was untouched: still its GEN-1
    // segment (never listed, opened, or rewritten). A rewrote at gen 2.
    assert(m.segments.keySet === Set("A", "C"))
    assert(m.segments("C").startsWith("seg-g1-"), m.segments("C"))
    assert(m.segments("A").startsWith("seg-g2-"), m.segments("A"))
    // pre-delete rows still served inside the retain window (the
    // compliance clock documented on delete())
    assert(CommittedTable.readAt(spark, dir, 1L).count() === 5L)
    // no-match delete: no generation burned
    CommittedTable.delete(spark, dir, $"value" > 1e9, "status")
    assert(CommittedTable.readManifest(fs, table).get.gen === 2L)
  }

  test("update: simultaneous assignments on matched rows only; partition col refused") {
    val dir = freshDir("upd")
    CommittedTable.write(base(), dir, "status")
    // swap semantics: both expressions see PRE-update values
    CommittedTable.update(spark, dir, $"value" < 25.0,
      Map("value" -> ($"value" + $"version"), "version" -> lit(2L)), "status")
    assert(content(dir) === Set(
      (1L, "A", 11.0, 2L), (2L, "A", 21.0, 2L), (3L, "B", 30.0, 1L),
      (4L, "C", 40.0, 1L)))
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = CommittedTable.readManifest(fs, table).get
    // only A matched: B and C keep their gen-1 segments untouched
    assert(m.segments("A").startsWith("seg-g2-"))
    assert(m.segments("B").startsWith("seg-g1-") &&
      m.segments("C").startsWith("seg-g1-"))
    // the partition column is merge's job, not update's
    val e = intercept[IllegalArgumentException](
      CommittedTable.update(spark, dir, lit(true),
        Map("status" -> lit("X")), "status"))
    assert(e.getMessage.contains("key move"), e.getMessage)
    // unknown column refused (widening is merge's allowAddColumns)
    val e2 = intercept[IllegalArgumentException](
      CommittedTable.update(spark, dir, lit(true),
        Map("origin" -> lit("x")), "status"))
    assert(e2.getMessage.contains("allowAddColumns"), e2.getMessage)
  }

  test("update: versionCol guard refuses a data-only update invisible to CDC feeds") {
    val dir = freshDir("updguard")
    CommittedTable.write(base(), dir, "status")
    // data columns change but (key, version) does not: keys/cdf consumers
    // would classify the row UNCHANGED — the guard refuses the call
    val e = intercept[IllegalArgumentException](
      CommittedTable.update(spark, dir, $"id" === 1L,
        Map("value" -> lit(99.0)), "status",
        versionCol = Some("version")))
    assert(e.getMessage.contains("invisible to CDC"), e.getMessage)
    // same update WITH the bump passes the guard and the cdf feed sees it
    CommittedTable.update(spark, dir, $"id" === 1L,
      Map("value" -> lit(99.0), "version" -> lit(2L)), "status",
      versionCol = Some("version"))
    val cdf = CommittedTable.changesCdf(spark, dir, 2L, "id", "version")
    assert(cdf.filter($"id" === 1L &&
      col(CommittedTable.ChangeTypeColumn) === "update_postimage").count() === 1L)
    // unknown version column named loudly (without tripping the earlier
    // unknown-ASSIGNMENT check: the assignment set itself is valid)
    val e2 = intercept[IllegalArgumentException](
      CommittedTable.update(spark, dir, $"id" === 2L,
        Map("value" -> lit(1.0)), "status",
        versionCol = Some("nope")))
    assert(e2.getMessage.contains("not a column"), e2.getMessage)
  }

  test("filesPerPartition: a hot partition stages through parallel sorted files") {
    val dir = freshDir("fpp")
    // one hot partition, enough rows to populate several upstream tasks
    val df = spark.range(10000).toDF("id")
      .withColumn("status", lit("HOT"))
      .withColumn("value", col("id").cast("double"))
      .withColumn("version", lit(1L))
      .repartition(8)
    // at spec scale AQE would coalesce the salted shuffle back to one
    // tiny partition (at real scale the partitions are large and stay
    // split — the point of the feature); pin it off to see the mechanism
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try CommittedTable.write(df, dir, "status", sortCols = Seq("id"),
      filesPerPartition = 4)
    finally spark.conf
      .set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = CommittedTable.readManifest(fs, table).get
    val seg = new org.apache.hadoop.fs.Path(table, m.segments("HOT"))
    val files = fs.listStatus(seg).map(_.getPath.getName)
      .count(_.endsWith(".parquet"))
    assert(files > 1 && files <= 4, s"expected 2..4 data files, got $files")
    // content, metadata count, and the read path are unaffected
    assert(CommittedTable.read(spark, dir).select($"id").as[Long]
      .collect().toSet === (0L until 10000L).toSet)
    assert(CommittedTable.count(spark, dir) === 10000L)
    // compact back to the canonical single sorted file per partition
    CommittedTable.compact(spark, dir, "status", sortCols = Seq("id"))
    val seg2 = new org.apache.hadoop.fs.Path(table,
      CommittedTable.readManifest(fs, table).get.segments("HOT"))
    assert(fs.listStatus(seg2).map(_.getPath.getName)
      .count(_.endsWith(".parquet")) === 1)
    assert(CommittedTable.count(spark, dir) === 10000L)
  }

  test("metadata counts: O(1) count tracks every DML; time travel + pruning compose") {
    val dir = freshDir("cnt")
    CommittedTable.write(base(), dir, "status", retainGenerations = 6)
    def metaCount(pv: Option[Seq[String]] = None, gen: Option[Long] = None) =
      CommittedTable.count(spark, dir, pv, gen)
    def dataCount() = CommittedTable.read(spark, dir).count()
    assert(CommittedTable.rowCounts(spark, dir).isDefined)
    assert(metaCount() === 4L && metaCount() === dataCount())

    CommittedTable.merge(spark, dir, updates(), "id", "version", "status")
    assert(metaCount() === dataCount()) // upsert+move+retire+insert: 5
    CommittedTable.delete(spark, dir, $"id" === 9L, "status")
    assert(metaCount() === dataCount())
    CommittedTable.compact(spark, dir, "status")
    assert(metaCount() === dataCount())
    // pruned count: only partition A; time travel: gen-1 count preserved
    assert(metaCount(Some(Seq("A"))) ===
      CommittedTable.read(spark, dir, Some(Seq("A"))).count())
    assert(metaCount(gen = Some(1L)) === 4L)
  }

  test("setRetention: shrink collects old anchors, grow deepens the future budget") {
    val dir = freshDir("retain")
    CommittedTable.write(base(), dir, "status", retainGenerations = 5)
    CommittedTable.merge(spark, dir, updates(), "id", "version", "status") // gen 2
    CommittedTable.merge(spark, dir,
      Seq((2L, "A", 22.0, 3L)).toDF("id", "status", "value", "version"),
      "id", "version", "status") // gen 3
    assert(CommittedTable.generations(spark, dir) === Seq(1L, 2L, 3L))
    // shrink to 2: the setRetention publish is gen 4, window = {3, 4}
    CommittedTable.setRetention(spark, dir, 2)
    assert(CommittedTable.generations(spark, dir) === Seq(3L, 4L))
    intercept[java.io.IOException](CommittedTable.readAt(spark, dir, 2L))
    // content untouched; gen 4 (metadata-only) reads same as gen 3
    assert(CommittedTable.readAt(spark, dir, 4L).count() ===
      CommittedTable.readAt(spark, dir, 3L).count())
    // its change batch is the defensive empty-delta branch: zero rows
    assert(CommittedTable.changesFor(spark, dir, 4L).count() === 0L)
    // grow again: future publishes retain deeper (old anchors stay gone)
    CommittedTable.setRetention(spark, dir, 4)
    CommittedTable.merge(spark, dir,
      Seq((2L, "A", 23.0, 6L)).toDF("id", "status", "value", "version"),
      "id", "version", "status") // gen 6
    assert(CommittedTable.generations(spark, dir) === Seq(3L, 4L, 5L, 6L))
  }

  test("retainHours: generations older than the wall-clock horizon collect " +
      "regardless of publish cadence; within-horizon history unaffected") {
    val dir = freshDir("retainh")
    // count-based window of 10 would keep everything — the time cap must
    // collect anyway (the compliance clock)
    CommittedTable.write(base(), dir, "status", retainGenerations = 10)
    CommittedTable.merge(spark, dir, updates(), "id", "version", "status") // gen 2
    CommittedTable.merge(spark, dir,
      Seq((2L, "A", 22.0, 3L)).toDF("id", "status", "value", "version"),
      "id", "version", "status") // gen 3
    CommittedTable.setRetention(spark, dir, 10, retainHours = Some(48L)) // gen 4
    assert(CommittedTable.generations(spark, dir) === Seq(1L, 2L, 3L, 4L))
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // age gens 1 and 2 past the 48 h horizon (anchor mtime = publish time)
    val old = System.currentTimeMillis() - 72L * 3600 * 1000
    Seq(1L, 2L).foreach(g => fs.setTimes(
      new org.apache.hadoop.fs.Path(table, s"_commit.g$g"), old, -1))
    // time travel refuses the expired generations BEFORE any GC runs
    val e = intercept[java.io.IOException](CommittedTable.readAt(spark, dir, 2L))
    assert(e.getMessage.contains("retainHours 48"))
    // ...and vacuum physically collects them; 3 and 4 stay readable
    CommittedTable.vacuum(spark, dir)
    assert(CommittedTable.generations(spark, dir) === Seq(3L, 4L))
    assert(CommittedTable.readAt(spark, dir, 3L).count() === 5L)
    // current generation is ALWAYS readable, even when its anchor ages:
    // age everything, vacuum, and the live table still reads
    CommittedTable.generations(spark, dir).foreach(g => fs.setTimes(
      new org.apache.hadoop.fs.Path(table, s"_commit.g$g"), old, -1))
    CommittedTable.vacuum(spark, dir)
    assert(CommittedTable.generations(spark, dir) === Seq(4L))
    assert(CommittedTable.read(spark, dir).count() === 5L)
    // clearing the cap restores pure count-based retention for the future
    CommittedTable.setRetention(spark, dir, 10, clearRetainHours = true)
    assert(CommittedTable.manifestAt(spark, dir).retainHours === None)
  }

  test("retainHours via SQL TBLPROPERTIES: set, observe, clear") {
    val dir = freshDir("retainh-sql")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    spark.sql(s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES('retainhours'='72')")
    assert(CommittedTable.manifestAt(spark, dir).retainHours === Some(72L))
    // retain co-sets in the same statement
    spark.sql(s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES" +
      "('retain'='5', 'retainhours'='24')")
    val m = CommittedTable.manifestAt(spark, dir)
    assert(m.retain === 5 && m.retainHours === Some(24L))
    spark.sql(s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES('retainhours'='')")
    assert(CommittedTable.manifestAt(spark, dir).retainHours === None)
  }

  test("mortonKey: interleaves bucket bits — hand-derived codes on a 2-bit grid") {
    // 2 cols × 2 bits, ranges [0,4): bucket == floor(v); classic morton
    // codes: key(x,y) interleaves x's bits at even positions, y's at odd
    val pts = for (x <- 0 to 3; y <- 0 to 3) yield (x.toDouble, y.toDouble)
    val df = pts.toDF("x", "y")
    val got = df.select($"x", $"y",
        CommittedTable.mortonKey(
          Seq(($"x", 0.0, 4.0), ($"y", 0.0, 4.0)), bits = 2).as("z"))
      .as[(Double, Double, Long)].collect()
      .map(r => (r._1.toInt, r._2.toInt) -> r._3).toMap
    def morton(x: Int, y: Int): Long =
      (0 until 2).map(b => (((x >> b) & 1) << (2 * b)) |
        (((y >> b) & 1) << (2 * b + 1))).sum.toLong
    pts.foreach { case (x, y) =>
      assert(got((x.toInt, y.toInt)) === morton(x.toInt, y.toInt),
        s"($x,$y)")
    }
    // clamping: out-of-range and NULL sort to the edges, never error
    val edge = Seq((Some(-5.0), Some(99.0)), (None, None))
      .toDF("x", "y")
      .select(CommittedTable.mortonKey(
        Seq(($"x", 0.0, 4.0), ($"y", 0.0, 4.0)), bits = 2).as("z"))
      .as[Long].collect()
    assert(edge(0) === morton(0, 3) && edge(1) === morton(0, 0))
  }

  test("mortonKey: bits >= 31 uses Long shifts — no Int wrap to a constant key") {
    // a single column may take up to 60 bits; Int `1 << 32` wraps to 1 and
    // degenerates every key to a constant (an unclustered layout published
    // silently). 40 bits must keep distinct buckets distinct and ordered.
    val df = Seq(0.0, 1.0, 2.0, 3.0).toDF("x")
    val keys = df.select(CommittedTable.mortonKey(
        Seq(($"x", 0.0, 4.0)), bits = 40).as("z"))
      .as[Long].collect()
    assert(keys.distinct.length === 4, s"degenerate keys: ${keys.toSeq}")
    assert(keys.sorted.toSeq === keys.toSeq) // bucket order preserved
    // bucket width = 2^40 / 4: endpoints land where Long arithmetic says
    assert(keys(3) === 3L * (1L << 38))
  }

  test("compactZOrder: content identical; a 2-D box skips row groups a 1-D sort cannot") {
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
    }
    // uncorrelated uniform dims; small row groups so each segment file
    // holds MANY row groups for the pushed filters to skip or keep
    spark.sparkContext.hadoopConfiguration.setInt("parquet.block.size", 16 * 1024)
    try {
      val dir = freshDir("zorder")
      val df = spark.range(200000).toDF("id")
        .withColumn("p", lit("only"))
        .withColumn("a", (col("id") * 48271 % 100000).cast("double"))
        .withColumn("b", (col("id") * 69621 % 100000).cast("double"))
      CommittedTable.write(df, dir, "p", sortCols = Seq("a"))
      val before = CommittedTable.read(spark, dir)
        .select($"id").as[Long].collect().toSet
      val box = (col("a").between(10000.0, 20000.0)
        && col("b").between(10000.0, 20000.0))
      // 1-D sorted layout: row groups are narrow in a but span ALL of b
      val sorted1d = scanRows(CommittedTable.read(spark, dir).filter(box))

      CommittedTable.compactZOrder(spark, dir, "p", Seq("a", "b"), bits = 8)
      // layout-only: content must be bit-identical
      assert(CommittedTable.read(spark, dir)
        .select($"id").as[Long].collect().toSet === before)
      val zordered = scanRows(CommittedTable.read(spark, dir).filter(box))
      // the honest claim, measured at the scan: surviving-row-group mass
      // shrinks materially when BOTH dimensions cluster (~1% selectivity
      // box; 1-D sort must read ~10% of rows, z-order ~1-3%)
      info(f"2-D box scan: 1-D sorted layout $sorted1d rows, " +
        f"z-ordered $zordered rows (${sorted1d.toDouble / zordered}%.1fx fewer)")
      assert(zordered < sorted1d / 2,
        s"z-order scanned $zordered rows vs 1-D sort's $sorted1d")
    } finally spark.sparkContext.hadoopConfiguration.unset("parquet.block.size")
  }

  test("delete: crash before the swap leaves the old table fully visible") {
    val dir = freshDir("delcrash")
    CommittedTable.write(base(), dir, "status")
    val boom = intercept[RuntimeException] {
      CommittedTable.delete(spark, dir, $"status" === "A", "status",
        crashPoint = p => if (p == "before-swap") throw new RuntimeException("kill"))
    }
    assert(boom.getMessage === "kill")
    assert(content(dir) === Set(
      (1L, "A", 10.0, 1L), (2L, "A", 20.0, 1L), (3L, "B", 30.0, 1L),
      (4L, "C", 40.0, 1L)))
    // rerun completes; the crashed attempt's staging is invisible garbage
    CommittedTable.delete(spark, dir, $"status" === "A", "status")
    assert(content(dir).map(_._1) === Set(3L, 4L))
  }

  test("zone maps: readRange prunes segments from metadata; answer == read().filter") {
    val dir = freshDir("zm")
    // values chosen so LEXICAL min/max compare would lie ("10" < "9.5")
    val df = Seq(
      (1L, "A", 9.0, 1L), (2L, "A", 10.0, 1L),
      (3L, "B", 100.0, 1L), (4L, "B", 200.0, 1L),
      (5L, "C", 1000.0, 1L))
      .toDF("id", "status", "value", "version")
    CommittedTable.write(df, dir, "status", statsCols = Seq("value", "id"))
    // range hits only A: B and C segments never reach the plan
    val r = CommittedTable.readRange(spark, dir, "value", Some(5.0), Some(50.0))
    assert(r.inputFiles.nonEmpty && r.inputFiles.forall(_.contains("-A/")),
      r.inputFiles.mkString(","))
    assert(r.select("id").as[Long].collect().toSet === Set(1L, 2L))
    // typed compare: lexically "10" < "9.5" would prune A and lose id 2
    val r2 = CommittedTable.readRange(spark, dir, "value", Some(9.5), None)
    assert(r2.select("id").as[Long].collect().toSet === Set(2L, 3L, 4L, 5L))
    // merge refreshes the affected partition's zone map
    CommittedTable.merge(spark, dir,
      Seq((1L, "A", 5000.0, 2L)).toDF("id", "status", "value", "version"),
      "id", "version", "status")
    val r3 = CommittedTable.readRange(spark, dir, "value", Some(4000.0), None)
    assert(r3.inputFiles.nonEmpty && r3.inputFiles.forall(_.contains("-A/")))
    assert(r3.select("id").as[Long].collect().toSet === Set(1L))
    // a column with no recorded stats prunes nothing but answers exactly
    val r4 = CommittedTable.readRange(spark, dir, "version", Some(2L), None)
    assert(r4.select("id").as[Long].collect().toSet === Set(1L))
    // time travel composes: the retained generation's FROZEN zone maps
    // answer the range query as of that snapshot
    val rOld = CommittedTable.readRange(spark, dir, "value",
      Some(4000.0), None, atGen = Some(1L))
    assert(rOld.count() === 0L)             // gen 1 had no 5000 value
    val rOld2 = CommittedTable.readRange(spark, dir, "value",
      Some(5.0), Some(50.0), atGen = Some(1L))
    assert(rOld2.select("id").as[Long].collect().toSet === Set(1L, 2L))
    assert(rOld2.inputFiles.nonEmpty && rOld2.inputFiles.forall(_.contains("-A/")))
    // compact recomputes zone maps over the canonical layout
    CommittedTable.compact(spark, dir, "status", sortCols = Seq("value"))
    val r5 = CommittedTable.readRange(spark, dir, "value", None, Some(50.0))
    assert(r5.inputFiles.nonEmpty && r5.inputFiles.forall(_.contains("-A/")))
    assert(r5.select("id").as[Long].collect().toSet === Set(2L)) // id 1 is 5000 now
  }

  test("zone maps multi-column: survival sets intersect in one metadata pass") {
    val dir = freshDir("zmm")
    // distinct value AND id ranges per partition so each column's pruning
    // is observable alone and in conjunction; D's value is all-NULL
    val df = Seq(
      (1L, "A", Some(9.0), 1L), (2L, "A", Some(10.0), 1L),
      (3L, "B", Some(100.0), 1L), (4L, "B", Some(200.0), 1L),
      (5L, "C", Some(1000.0), 1L), (6L, "C", Some(2000.0), 1L),
      (7L, "D", None, 1L), (8L, "D", None, 1L))
      .toDF("id", "status", "value", "version")
    CommittedTable.write(df, dir, "status", statsCols = Seq("value", "id"))
    // value ∈ [5,250] keeps {A,B} (D dropped: all-NULL under a bound);
    // id ∈ [3,10] keeps {B,C,D}; the conjunction reads ONLY B
    val r = CommittedTable.readRangeMulti(spark, dir, Seq(
      ("value", Some(5.0), Some(250.0)), ("id", Some(3L), Some(10L))))
    assert(r.inputFiles.nonEmpty && r.inputFiles.forall(_.contains("-B/")),
      r.inputFiles.mkString(","))
    assert(r.select("id").as[Long].collect().toSet === Set(3L, 4L))
    // single-column form delegates: readRange == readRangeMulti(1 bound)
    val single = CommittedTable.readRange(spark, dir, "value", Some(5.0), Some(250.0))
    assert(single.select("id").as[Long].collect().toSet === Set(1L, 2L, 3L, 4L))
    assert(single.inputFiles.forall(f => f.contains("-A/") || f.contains("-B/")))
    // the all-NULL segment survives when its column carries NO bound
    val rIdOnly = CommittedTable.readRangeMulti(spark, dir, Seq(
      ("id", Some(7L), None)))
    assert(rIdOnly.select("id").as[Long].collect().toSet === Set(7L, 8L))
    assert(rIdOnly.inputFiles.exists(_.contains("-D/")))
    // a bounded column with no recorded stats prunes nothing by itself,
    // but its exact filter applies and the OTHER column still prunes
    val rNoStats = CommittedTable.readRangeMulti(spark, dir, Seq(
      ("version", Some(1L), None), ("value", Some(5.0), Some(50.0))))
    assert(rNoStats.inputFiles.nonEmpty && rNoStats.inputFiles.forall(_.contains("-A/")))
    assert(rNoStats.select("id").as[Long].collect().toSet === Set(1L, 2L))
    val rNoStats2 = CommittedTable.readRangeMulti(spark, dir, Seq(
      ("version", Some(2L), None), ("value", Some(5.0), Some(50.0))))
    assert(rNoStats2.count() === 0L) // version filter exact despite no stats
    // conjunction == read().filter for every bound combination tried
    val expect = CommittedTable.read(spark, dir)
      .filter($"value" >= 5.0 && $"value" <= 250.0 && $"id" >= 3L && $"id" <= 10L)
      .select("id").as[Long].collect().toSet
    assert(r.select("id").as[Long].collect().toSet === expect)
  }

  test("write(sortCols): the first generation is already canonically sorted") {
    val dir = freshDir("wsort")
    val df = Seq((3L, "A", 30.0), (1L, "A", 10.0), (2L, "A", 20.0),
      (5L, "B", 50.0), (4L, "B", 40.0))
      .toDF("id", "status", "value").withColumn("version", lit(1L))
    CommittedTable.write(df, dir, "status", sortCols = Seq("id"))
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    CommittedTable.readManifest(fs, table).get.segments.values.foreach { seg =>
      val ids = spark.read.parquet(new org.apache.hadoop.fs.Path(table, seg).toString)
        .select("id").as[Long].collect().toSeq
      assert(ids === ids.sorted, s"$seg rows not id-sorted: $ids")
    }
    assert(content(dir).map(_._1) === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("zone maps on timestamps: epoch-micros canonical form, string bounds accepted") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = freshDir("zmts")
    val df = Seq(
      (1L, "A", t("2024-01-01 10:00:00"), 1L),
      (2L, "B", t("2024-06-01 10:00:00"), 1L))
      .toDF("id", "status", "ts", "version")
    CommittedTable.write(df, dir, "status", statsCols = Seq("ts"))
    val r = CommittedTable.readRange(spark, dir, "ts",
      Some(t("2024-05-01 00:00:00")), None)
    assert(r.inputFiles.nonEmpty && r.inputFiles.forall(_.contains("-B/")),
      r.inputFiles.mkString(","))
    assert(r.select("id").as[Long].collect().toSet === Set(2L))
    val r2 = CommittedTable.readRange(spark, dir, "ts",
      None, Some("2024-02-01 00:00:00"))
    assert(r2.select("id").as[Long].collect().toSet === Set(1L))
  }

  test("zone-map pruning is SOUND for every bound: readRange == read().filter") {
    // property-style sweep: deterministic pseudo-random values across 6
    // partitions, then every (lo, hi) pair from a crossing grid — open,
    // half-open, empty, total — must match the unpruned filtered read
    val dir = freshDir("zmprop")
    val rows = (1L to 60L).map { i =>
      val part = s"P${i % 6}"
      // value pattern decouples partition from range so bounds cross
      // segment boundaries in both directions
      (i, part, ((i * 37) % 101).toDouble - 50.0, 1L)
    }
    val df = rows.toDF("id", "status", "value", "version")
    CommittedTable.write(df, dir, "status", statsCols = Seq("value"))
    val bounds = Seq(None, Some(-60.0), Some(-17.0), Some(0.0), Some(13.5),
      Some(49.0), Some(60.0))
    for (lo <- bounds; hi <- bounds) {
      val expected = rows
        .filter(r => lo.forall(r._3 >= _) && hi.forall(r._3 <= _))
        .map(_._1).toSet
      val got = CommittedTable.readRange(spark, dir, "value", lo, hi)
        .select("id").as[Long].collect().toSet
      assert(got === expected, s"bounds [$lo, $hi]")
    }
  }

  test("garbage stays bounded across many merges: segments, anchors, claims") {
    val dir = freshDir("bounded")
    CommittedTable.write(base(), dir, "status", retainGenerations = 2)
    (2L to 11L).foreach { v =>
      CommittedTable.merge(spark, dir,
        Seq((1L, "A", v * 10.0, v)).toDF("id", "status", "value", "version"),
        "id", "version", "status")
    }
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(table).map(_.getPath.getName)
    val m = CommittedTable.readManifest(fs, table).get
    assert(m.gen === 11L)
    // the GC invariant: EVERY on-disk segment is referenced by a manifest
    // inside the retain window (current or the one superseded generation).
    // Untouched partitions legitimately keep their original-generation
    // segments forever — live data, not garbage — while A's 11-generation
    // merge history must NOT accumulate.
    val segs = names.filter(_.startsWith("seg-")).toSet
    val referenced = m.segments.values.toSet ++
      names.filter(_.startsWith("_commit.g")).flatMap { a =>
        val in = fs.open(new org.apache.hadoop.fs.Path(table, a))
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().toList finally in.close()
        lines.filter(_.contains("\tseg-")).map(_.split('\t')(1))
      }
    assert((segs -- referenced).isEmpty,
      s"orphan segments survived GC: ${segs -- referenced}")
    // A was rewritten 10 times but carries at most the retain window's
    // worth of segments on disk
    val aSegs = segs.filter(_.endsWith("-A"))
    assert(aSegs.size <= 2, s"A's merge history accumulated: $aSegs")
    // anchors: exactly the retain window; claims age out WITH the window
    // (deleting a committed claim at commit would re-open its name for a
    // stalled writer — the lost-update the fence exists to stop)
    val anchors = names.filter(_.startsWith("_commit.g")).toSeq.sorted
    assert(anchors === Seq("_commit.g10", "_commit.g11"), anchors)
    val claims = names.filter(_.startsWith("_claim-")).toSeq.sorted
    assert(claims === Seq("_claim-g10", "_claim-g11"), claims)
    // and the table still answers correctly
    assert(content(dir).contains((1L, "A", 110.0, 11L)))
  }

  test("per-attempt staging roots: a writer never touches a concurrent writer's staging") {
    val dir = freshDir("stageiso")
    CommittedTable.write(base(), dir, "status")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a concurrent writer's in-flight staging root, mid-write
    val foreign = new org.apache.hadoop.fs.Path(dir + ".ct-staging-cafebabe")
    fs.mkdirs(foreign)
    fs.create(new org.apache.hadoop.fs.Path(foreign, "part-0.parquet"), false).close()
    CommittedTable.merge(spark, dir, updates(), "id", "version", "status")
    // the merge finished, cleaned ITS OWN root, and left the foreign one
    assert(content(dir) === mergedExpected)
    assert(fs.exists(new org.apache.hadoop.fs.Path(foreign, "part-0.parquet")),
      "merge deleted a concurrent writer's in-flight staging")
    val parent = new org.apache.hadoop.fs.Path(dir).getParent
    val roots = fs.listStatus(parent).map(_.getPath.getName)
      .filter(_.contains(".ct-staging-"))
    assert(roots.toSeq === Seq("t.ct-staging-cafebabe"),
      s"writer leaked its own staging root: ${roots.mkString(",")}")
    // GC sweeps it only once AGED (in-flight is indistinguishable)...
    fs.setTimes(foreign, System.currentTimeMillis() - 25L * 3600 * 1000, -1)
    CommittedTable.merge(spark, dir,
      Seq((1L, "A", 12.0, 3L)).toDF("id", "status", "value", "version"),
      "id", "version", "status")
    assert(!fs.exists(foreign), "aged crash-debris staging root survived GC")
    // ...and recover (documented: no writer active) sweeps regardless of age
    val fresh = new org.apache.hadoop.fs.Path(dir + ".ct-staging-deadbeef")
    fs.mkdirs(fresh)
    CommittedTable.recover(spark, dir)
    assert(!fs.exists(fresh), "recover left a staging root behind")
  }

  test("a committed generation's claim holds until it ages out of the window") {
    val dir = freshDir("claimhold")
    CommittedTable.write(base(), dir, "status") // gen 1, retain 2
    CommittedTable.merge(spark, dir, updates(), "id", "version", "status") // gen 2
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a writer stalled since before gen 2 published now tries to claim it:
    // the fence must still hold (create-no-overwrite loses) — GC deleting
    // the committed claim would hand the stalled writer the win and let it
    // overwrite gen 2 with a manifest built on gen 1
    intercept[java.io.IOException] {
      fs.create(new org.apache.hadoop.fs.Path(table, "_claim-g2"), false).close()
    }
    assert(content(dir) === mergedExpected)
  }

  test("GC never deletes an about-to-commit anchor (future gen with a live claim)") {
    val dir = freshDir("anchorrace")
    CommittedTable.write(base(), dir, "status") // gen 1
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a concurrent publish caught between anchor-put and manifest swap:
    // its claim exists and its future-gen anchor is on disk
    fs.create(new org.apache.hadoop.fs.Path(table, "_claim-g2"), false).close()
    val anchor = new org.apache.hadoop.fs.Path(table, "_commit.g2")
    val out = fs.create(anchor, false)
    try out.write("gen=2\ncols=id\tstatus\tvalue\tversion\nretain=2\nA\tseg-g2-xx-A\n"
      .getBytes("UTF-8")) finally out.close()
    // another merge starts; its opening GC runs while the claim is live —
    // the merge itself then loses to the held claim, but must NOT have
    // deleted the in-flight generation's anchor
    intercept[java.util.ConcurrentModificationException] {
      CommittedTable.merge(spark, dir, updates(), "id", "version", "status")
    }
    assert(fs.exists(anchor),
      "concurrent GC deleted an about-to-commit generation's time-travel anchor")
    // once the claim is CRASH DEBRIS, recover clears claim AND stale anchor
    CommittedTable.recover(spark, dir)
    assert(!fs.exists(anchor))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(table, "_claim-g2")))
    CommittedTable.merge(spark, dir, updates(), "id", "version", "status")
    assert(content(dir) === mergedExpected)
  }

  test("zone maps tolerate NaN/Infinity bounds: readRange degrades to keep, never throws") {
    val dir = freshDir("nanstats")
    val df = Seq(
      (1L, "A", 1.0), (2L, "A", Double.NaN), // A's max propagates NaN
      (3L, "B", 5.0), (4L, "B", 7.0),
      (5L, "C", Double.PositiveInfinity), (6L, "C", 9.0))
      .toDF("id", "status", "value").withColumn("version", lit(1L))
    CommittedTable.write(df, dir, "status", statsCols = Seq("value"))
    // planning must not throw NumberFormatException on the NaN/Infinity
    // manifest bounds; the answer equals the exact filter
    val got = CommittedTable.readRange(spark, dir, "value",
        lower = Some(5.0), upper = Some(8.0))
      .select($"id").as[Long].collect().toSet
    val want = CommittedTable.read(spark, dir)
      .filter($"value" >= 5.0 && $"value" <= 8.0)
      .select($"id").as[Long].collect().toSet
    assert(got === want)
    assert(want === Set(3L, 4L)) // NaN/Inf rows correctly excluded by the filter
    // B, with finite clean bounds [5,7], must still be prunable evidence:
    // a disjoint range keeps only the unparsable-bound segments
    val none = CommittedTable.readRange(spark, dir, "value",
        lower = Some(100.0), upper = Some(200.0))
      .select($"id").as[Long].collect().toSet
    assert(none === Set.empty[Long])
  }

  test("a corrupt manifest fails loudly, never silently serves wrong data") {
    val dir = freshDir("corrupt")
    CommittedTable.write(base(), dir, "status")
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commit = new org.apache.hadoop.fs.Path(table, "_commit")
    def overwrite(body: String): Unit = {
      val out = fs.create(commit, true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
    }
    // truncated header
    overwrite("garbage\n")
    intercept[java.io.IOException] { CommittedTable.read(spark, dir) }
    // bad segment line (three naked fields against no stats declaration)
    overwrite("gen=1\ncols=id\tstatus\tvalue\tversion\nA\tseg-g1-x\tjunk\n")
    intercept[java.io.IOException] { CommittedTable.read(spark, dir) }
    // bad stat field encoding
    overwrite("gen=1\ncols=id\tstatus\tvalue\tversion\nretain=2\nstats=value\nA\tseg-g1-x\tbad\tbad\n")
    intercept[java.io.IOException] { CommittedTable.read(spark, dir) }
  }

  test("single-data-column table: prev-manifest GC parses the tab-less cols header") {
    // the old GC split prev-manifest lines on tab positionally; a one-column
    // table's cols= line has no tab and broke every later publish
    val dir = freshDir("onecol")
    val df = Seq("A", "B").toDF("status")
    CommittedTable.write(df, dir, "status")
    CommittedTable.compact(spark, dir, "status")     // writes _commit.prev
    CommittedTable.compact(spark, dir, "status")     // start-GC parses it
    assert(CommittedTable.read(spark, dir).select("status")
      .as[String].collect().toSet === Set("A", "B"))
  }

  // ---- Bloom sidecars: segment-level point-lookup skipping -------------

  private def bloomTable(tag: String, bloom: Boolean): String = {
    val dir = freshDir(tag)
    val df = spark.range(0, 800)
      .select($"id",
        concat(lit("p"), ($"id" / 100).cast("long").cast("string")).as("status"),
        ($"id" * 1.5).as("value"))
      .withColumn("version", lit(1L))
    CommittedTable.write(df, dir, "status",
      keyCol = Some("id"), versionCol = Some("version"),
      bloomCols = if (bloom) Seq("id") else Nil)
    dir
  }

  private def survivorsFor(dir: String, ids: Seq[Long]): Option[Seq[String]] = {
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = CommittedTable.readManifest(fs, table).get
    val hashes = ids.toDF("id").select(xxhash64($"id"))
      .collect().map(_.getLong(0))
    CommittedTable.bloomSurvivors(spark, table, m, "id", hashes)
  }

  test("bloom sidecars: a point probe opens a strict subset of segments, answer unchanged") {
    val dir = bloomTable("bloom", bloom = true)
    // id=250 lives only in partition p2: the sidecars must keep p2 and
    // drop (almost) everything else — deterministic for fixed data
    val surv = survivorsFor(dir, Seq(250L)).get
    assert(surv.contains("p2"))
    assert(surv.size <= 2, s"sidecar prune kept too much: $surv")
    // the pruned read PLANS fewer files than the full read
    val allFiles = CommittedTable.read(spark, dir).inputFiles.length
    val prunedFiles = CommittedTable.read(spark, dir, Some(surv)).inputFiles.length
    assert(prunedFiles < allFiles)
    // readKeys == read().semi-join, bloom or not (no false negatives)
    val expect = CommittedTable.read(spark, dir)
      .filter($"id".isin(250L, 601L, 9999L))
      .select($"id", $"status", $"value").as[(Long, String, Double)]
      .collect().toSet
    val got = CommittedTable.readKeys(spark, dir,
        Seq(250L, 601L, 9999L).toDF("id"), "id")
      .select($"id", $"status", $"value").as[(Long, String, Double)]
      .collect().toSet
    assert(got === expect)
    // a column with no sidecars: prune not applicable
    assert(survivorsFor(bloomTable("nobloom", bloom = false), Seq(1L)).isEmpty)
    // a POINT readRange on the bloomed key consults the sidecars too:
    // every segment's id [min,max] straddles nothing here (ids are
    // contiguous per partition), so this is the zone-map-decisive case —
    // use a table WITHOUT id stats to isolate the sidecar's contribution
    val point = CommittedTable.readRange(spark, dir, "id",
      Some(250L), Some(250L))
    assert(point.inputFiles.length <= 2 && point.inputFiles.nonEmpty)
    assert(point.select($"id", $"status").as[(Long, String)].collect().toSet
      === Set((250L, "p2")))
  }

  test("bloom sidecars: a segment missing its sidecar conservatively survives") {
    val dir = bloomTable("bloomiss", bloom = true)
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = CommittedTable.readManifest(fs, table).get
    // simulate a pre-feature segment: strip p5's sidecar
    val seg = new org.apache.hadoop.fs.Path(table, m.segments("p5"))
    assert(fs.delete(new org.apache.hadoop.fs.Path(seg, "_bloom-id"), false))
    val surv = survivorsFor(dir, Seq(250L)).get
    assert(surv.contains("p2") && surv.contains("p5"))
  }

  test("bloom sidecars: deleteKeys prunes discovery; result identical to the unbloomed path") {
    val bloomed = bloomTable("blodel", bloom = true)
    val plain = bloomTable("plndel", bloom = false)
    val probe = Seq(17L, 250L, 777L).toDF("id")
    CommittedTable.deleteKeys(spark, bloomed, probe, "id", "status")
    CommittedTable.deleteKeys(spark, plain, probe, "id", "status")
    val a = CommittedTable.read(spark, bloomed)
      .select($"id", $"status", $"value").as[(Long, String, Double)].collect().toSet
    val b = CommittedTable.read(spark, plain)
      .select($"id", $"status", $"value").as[(Long, String, Double)].collect().toSet
    assert(a === b)
    assert(!a.exists(r => Set(17L, 250L, 777L).contains(r._1)))
    // a probe no segment can hold: deleteKeys returns without a new generation
    val genBefore = CommittedTable.generations(spark, bloomed).max
    CommittedTable.deleteKeys(spark, bloomed, Seq(424242L).toDF("id"), "id", "status")
    assert(CommittedTable.generations(spark, bloomed).max === genBefore)
  }

  test("bloom sidecars: carried forward by merge and compact, fresh segments re-bloomed") {
    val dir = bloomTable("blofwd", bloom = true)
    // merge moves id=250 p2→p9 and inserts id=950 in p9
    val upd = Seq((250L, "p9", 1.0, 2L), (950L, "p9", 2.0, 2L))
      .toDF("id", "status", "value", "version")
    CommittedTable.merge(spark, dir, upd, "id", "version", "status")
    val s250 = survivorsFor(dir, Seq(250L)).get
    assert(s250.contains("p9"))
    assert(!s250.contains("p2"), // p2 was rewritten WITHOUT 250: fresh sidecar excludes it
      s"rewritten p2 sidecar still claims 250: $s250")
    CommittedTable.compact(spark, dir, "status")
    val sAfter = survivorsFor(dir, Seq(250L)).get
    assert(sAfter.contains("p9") && sAfter.size <= 2)
    val got = CommittedTable.readKeys(spark, dir, Seq(250L, 950L).toDF("id"), "id")
      .select($"id", $"status").as[(Long, String)].collect().toSet
    assert(got === Set((250L, "p9"), (950L, "p9")))
  }

  // ---- Composite (multi-column) partitioning ---------------------------

  private def compositeBase() = Seq(
    (1L, "2026-01-01", "web", 10.0), (2L, "2026-01-01", "web/api", 20.0),
    (3L, "2026-01-01", "crawl", 30.0), (4L, "2026-01-02", "web", 40.0),
    (5L, "2026-01-02", "50%", 50.0), (6L, "2026-01-03", "crawl", 60.0))
    .toDF("id", "day", "source", "value")
    .withColumn("version", lit(1L))

  test("composite partitioning: reversible encoding, exact per-component pruning") {
    val dir = freshDir("comp")
    CommittedTable.writeComposite(compositeBase(), dir, Seq("day", "source"),
      keyCol = Some("id"), versionCol = Some("version"))
    // the manifest keys are the documented encoding — '/' and '%' escaped
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = CommittedTable.readManifest(fs, table).get
    assert(m.segments.keySet === Set(
      "2026-01-01/web", "2026-01-01/web%2Fapi", "2026-01-01/crawl",
      "2026-01-02/web", "2026-01-02/50%25", "2026-01-03/crawl"))
    assert(CommittedTable.compositeValue(Seq("2026-01-01", "web/api")) ===
      "2026-01-01/web%2Fapi")
    // components decode back exactly, gnarly values included
    val decoded = CommittedTable.read(spark, dir)
      .select($"id",
        CommittedTable.compositeComponent($"part_key", 0).as("d"),
        CommittedTable.compositeComponent($"part_key", 1).as("s"))
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(decoded(2L) === ("2026-01-01", "web/api"))
    assert(decoded(5L) === ("2026-01-02", "50%"))
    // component zone maps: a (source) probe prunes MID-key — hive nested
    // dirs can only prune prefixes
    val bySource = CommittedTable.readRangeMulti(spark, dir,
      Seq(("source", Some("web"), Some("web"))))
    assert(bySource.inputFiles.length === 2)
    assert(bySource.select($"id").as[Long].collect().toSet === Set(1L, 4L))
    // (day) range alone
    val byDay = CommittedTable.readRangeMulti(spark, dir,
      Seq(("day", Some("2026-01-02"), None)))
    assert(byDay.inputFiles.length === 3)
    assert(byDay.select($"id").as[Long].collect().toSet === Set(4L, 5L, 6L))
    // both components = one segment
    val one = CommittedTable.readRangeMulti(spark, dir,
      Seq(("day", Some("2026-01-01"), Some("2026-01-01")),
        ("source", Some("crawl"), Some("crawl"))))
    assert(one.inputFiles.length === 1)
    assert(one.select($"id").as[Long].collect().toSet === Set(3L))
    // NULL component poisons the key and fails loudly, never aliases
    intercept[IllegalArgumentException] {
      CommittedTable.writeComposite(
        Seq((9L, null: String, "web", 1.0, 1L))
          .toDF("id", "day", "source", "value", "version"),
        freshDir("compnull"), Seq("day", "source"))
    }
  }

  test("composite partitioning: merge, DML, and CDF flow through the composite column") {
    val dir = freshDir("compdml")
    CommittedTable.writeComposite(compositeBase(), dir, Seq("day", "source"),
      keyCol = Some("id"), versionCol = Some("version"))
    // upsert id=1 in place; MOVE id=3 crawl→web (same day); insert id=9
    val upd = Seq(
      (1L, "2026-01-01", "web", 11.0, 2L),
      (3L, "2026-01-01", "web", 31.0, 2L),
      (9L, "2026-01-03", "web", 90.0, 2L))
      .toDF("id", "day", "source", "value", "version")
    CommittedTable.mergeComposite(spark, dir, upd, "id", "version",
      Seq("day", "source"))
    val after = CommittedTable.read(spark, dir)
      .select($"id", $"day", $"source", $"value")
      .as[(Long, String, String, Double)].collect().toSet
    assert(after === Set(
      (1L, "2026-01-01", "web", 11.0), (2L, "2026-01-01", "web/api", 20.0),
      (3L, "2026-01-01", "web", 31.0), (4L, "2026-01-02", "web", 40.0),
      (5L, "2026-01-02", "50%", 50.0), (6L, "2026-01-03", "crawl", 60.0),
      (9L, "2026-01-03", "web", 90.0)))
    // CDF over the merge generation sees the move as update pre/post
    val cdf = CommittedTable.changesCdf(spark, dir, 2L, "id", "version")
      .select($"id", $"_change_type").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(cdf(1L) === Seq("update_postimage", "update_preimage"))
    assert(cdf(3L) === Seq("update_postimage", "update_preimage"))
    assert(cdf(9L) === Seq("insert"))
    assert(!cdf.contains(5L)) // untouched partitions stay out of the diff
    // predicate DELETE on a component column, scoped by composite value
    CommittedTable.delete(spark, dir, col("source") === "crawl", "part_key")
    assert(CommittedTable.read(spark, dir).filter($"source" === "crawl").count() === 0)
    assert(CommittedTable.read(spark, dir).count() === 6)
    // UPDATE with the version bump, composite untouched
    CommittedTable.update(spark, dir, col("id") === 4L,
      Map("value" -> lit(44.0), "version" -> lit(3L)), "part_key",
      versionCol = Some("version"))
    val r4 = CommittedTable.read(spark, dir).filter($"id" === 4L)
      .select($"value", $"version").as[(Double, Long)].head()
    assert(r4 === ((44.0, 3L)))
  }
}
