package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** CommittedTable.mergeClauses — the full MERGE clause surface (SQL
  * first-true-wins arbitration, partition moves, by-source clauses, the
  * CDC version guard) plus its SQL route through GraftAnalysis. */
class MergeClausesSpec extends SparkSpec {
  import spark.implicits._
  import CommittedTable.{MatchedUpdate, MatchedDelete, NotMatchedInsert,
    BySourceUpdate, BySourceDelete}

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-mc-$tag").toString + "/t"

  private def base() = Seq(
    (1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 30.0), (4L, "C", 40.0))
    .toDF("id", "status", "value")
    .withColumn("version", lit(1L))

  private def content(dir: String): Set[(Long, String, Double, Long)] =
    CommittedTable.read(spark, dir)
      .select($"id", $"status", $"value", $"version")
      .as[(Long, String, Double, Long)].collect().toSet

  private def manifest(dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    CommittedTable.readManifest(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration), p).get
  }

  test("all four clause kinds arbitrate first-true-wins") {
    val dir = freshDir("arb")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    val src = Seq((1L, 100.0), (3L, 5.0), (7L, 70.0), (8L, 3.0))
      .toDF("id", "sval")
    CommittedTable.mergeClauses(spark, dir, src,
      matched = Seq(
        MatchedUpdate(Some(expr("s.sval > t.value")),
          Map("value" -> expr("s.sval"), "version" -> expr("t.version + 1"))),
        MatchedDelete(Some(expr("t.status = 'B'")))),
      notMatched = Seq(
        NotMatchedInsert(Some(expr("s.sval >= 50.0")),
          Map("id" -> expr("s.id"), "status" -> lit("N"),
            "value" -> expr("s.sval"), "version" -> lit(1L)))),
      bySource = Seq(
        BySourceUpdate(Some(expr("t.status = 'C'")),
          Map("value" -> expr("t.value + 0.5"),
            "version" -> expr("t.version + 1"))),
        BySourceDelete(Some(expr("t.id = 2")))))
    // 1 matched+higher → updated; 3 matched, not higher, status B → deleted;
    // 7 unmatched ≥50 → inserted; 8 unmatched <50 → ignored;
    // 2 by-source, not C, id=2 → deleted; 4 by-source, C → updated
    assert(content(dir) === Set(
      (1L, "A", 100.0, 2L), (4L, "C", 40.5, 2L), (7L, "N", 70.0, 1L)))
    // B lost its only row: retired from the manifest
    assert(manifest(dir).segments.keySet === Set("A", "C", "N"))
  }

  test("matched row claimed by NO clause is kept unchanged (incl. NULL condition)") {
    val dir = freshDir("keep")
    CommittedTable.write(base(), dir, "status", keyCol = Some("id"))
    // id=1's sval is NULL → `s.sval > t.value` is NULL → clause does not
    // match (SQL three-valued logic), row passes through untouched
    val src = Seq((1L, Option.empty[Double]), (2L, Some(5.0)))
      .toDF("id", "sval")
    CommittedTable.mergeClauses(spark, dir, src,
      matched = Seq(MatchedUpdate(Some(expr("s.sval > t.value")),
        Map("value" -> expr("s.sval")))))
    assert(content(dir) === Set(
      (1L, "A", 10.0, 1L), (2L, "A", 20.0, 1L), (3L, "B", 30.0, 1L),
      (4L, "C", 40.0, 1L)))
  }

  test("update assigning the partition column moves the row; receiving partition carries its rows") {
    val dir = freshDir("move")
    CommittedTable.write(base(), dir, "status", keyCol = Some("id"))
    val src = Seq((1L, "B")).toDF("id", "newstatus")
    CommittedTable.mergeClauses(spark, dir, src,
      matched = Seq(MatchedUpdate(None, Map("status" -> expr("s.newstatus")))))
    assert(content(dir) === Set(
      (1L, "B", 10.0, 1L), (2L, "A", 20.0, 1L), (3L, "B", 30.0, 1L),
      (4L, "C", 40.0, 1L)))
    // B was not in the matched scope (key 1 lived in A) yet gained the
    // moved row — its pre-existing row 3 must have been carried forward,
    // exactly once
    assert(CommittedTable.read(spark, dir, Some(Seq("B"))).count() === 2)
  }

  test("insert can mint a brand-new partition; unassigned columns are typed NULL") {
    val dir = freshDir("mint")
    CommittedTable.write(base(), dir, "status", keyCol = Some("id"))
    val src = Seq((9L, 90.0)).toDF("id", "sval")
    CommittedTable.mergeClauses(spark, dir, src,
      notMatched = Seq(NotMatchedInsert(None,
        Map("id" -> expr("s.id"), "status" -> lit("Z")))))
    val z = CommittedTable.read(spark, dir, Some(Seq("Z")))
      .select($"id", $"status", $"value", $"version").collect()
    assert(z.length === 1)
    assert(z.head.getLong(0) === 9L && z.head.getString(1) === "Z")
    assert(z.head.isNullAt(2) && z.head.isNullAt(3))
  }

  test("no clause applies anywhere: no generation is burned") {
    val dir = freshDir("noop")
    CommittedTable.write(base(), dir, "status", keyCol = Some("id"))
    val g0 = manifest(dir).gen
    val src = Seq((99L, 1.0)).toDF("id", "sval") // unmatched, no insert fires
    CommittedTable.mergeClauses(spark, dir, src,
      matched = Seq(MatchedDelete(None)),
      notMatched = Seq(NotMatchedInsert(Some(lit(false)),
        Map("id" -> expr("s.id"), "status" -> lit("Z")))))
    assert(manifest(dir).gen === g0)
    assert(content(dir).size === 4)
  }

  test("unconditional SET-all + INSERT-all equals the canonical merge") {
    val dirA = freshDir("eqa"); val dirB = freshDir("eqb")
    CommittedTable.write(base(), dirA, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    CommittedTable.write(base(), dirB, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    val upd = Seq(
      (1L, "A", 11.0, 2L), (3L, "A", 31.0, 2L), (4L, "N", 41.0, 2L),
      (9L, "N", 90.0, 2L)).toDF("id", "status", "value", "version")
    CommittedTable.merge(spark, dirA, upd, "id", "version", "status")
    val setAll = Map("status" -> expr("s.status"), "value" -> expr("s.value"),
      "version" -> expr("s.version"))
    CommittedTable.mergeClauses(spark, dirB, upd,
      matched = Seq(MatchedUpdate(None, setAll)),
      notMatched = Seq(NotMatchedInsert(None, setAll + ("id" -> expr("s.id")))))
    assert(content(dirA) === content(dirB))
  }

  test("contracts fail loudly: dup source keys, key assignment, insert without partition, version guard, unknown column") {
    val dir = freshDir("guard")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    val src = Seq((1L, 5.0)).toDF("id", "sval")
    val dup = Seq((1L, 5.0), (1L, 6.0)).toDF("id", "sval")
    val eDup = intercept[IllegalArgumentException] {
      CommittedTable.mergeClauses(spark, dir, dup,
        matched = Seq(MatchedDelete(None)))
    }
    assert(eDup.getMessage.contains("multiple rows"))
    val eKey = intercept[IllegalArgumentException] {
      CommittedTable.mergeClauses(spark, dir, src,
        matched = Seq(MatchedUpdate(None,
          Map("id" -> lit(99L), "version" -> expr("t.version + 1")))))
    }
    assert(eKey.getMessage.contains("key column"))
    val eIns = intercept[IllegalArgumentException] {
      CommittedTable.mergeClauses(spark, dir, src,
        notMatched = Seq(NotMatchedInsert(None,
          Map("id" -> expr("s.id"), "version" -> lit(1L)))))
    }
    assert(eIns.getMessage.contains("partition"))
    val eVer = intercept[IllegalArgumentException] {
      CommittedTable.mergeClauses(spark, dir, src,
        matched = Seq(MatchedUpdate(None, Map("value" -> expr("s.sval")))))
    }
    assert(eVer.getMessage.contains("version"))
    val eCol = intercept[IllegalArgumentException] {
      CommittedTable.mergeClauses(spark, dir, src,
        matched = Seq(MatchedUpdate(None,
          Map("nope" -> lit(1), "version" -> expr("t.version + 1")))))
    }
    assert(eCol.getMessage.contains("lacks"))
  }

  test("clause merge is CDC-visible: CDF classifies the update, delete and insert") {
    val dir = freshDir("cdf")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    val src = Seq((1L, 100.0), (3L, 5.0), (7L, 70.0)).toDF("id", "sval")
    CommittedTable.mergeClauses(spark, dir, src,
      matched = Seq(
        MatchedUpdate(Some(expr("s.sval > t.value")),
          Map("value" -> expr("s.sval"), "version" -> expr("t.version + 1"))),
        MatchedDelete(None)),
      notMatched = Seq(NotMatchedInsert(None,
        Map("id" -> expr("s.id"), "status" -> lit("N"),
          "value" -> expr("s.sval"), "version" -> lit(1L)))))
    val cdf = CommittedTable.changesCdf(spark, dir, 2L, "id", "version")
      .select($"id", $"_change_type").as[(Long, String)].collect().toSet
    assert(cdf === Set(
      (1L, "update_preimage"), (1L, "update_postimage"),
      (3L, "delete"), (7L, "insert")))
  }

  test("SQL route: full MERGE INTO clause surface through spark.sql") {
    val dir = freshDir("sql")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    Seq((1L, 100.0), (3L, 5.0), (7L, 70.0), (8L, 3.0)).toDF("id", "sval")
      .createOrReplaceTempView("mc_sql_src")
    spark.sql(
      s"""MERGE INTO graft.`$dir` t USING mc_sql_src s ON t.id = s.id
          WHEN MATCHED AND s.sval > t.value THEN
            UPDATE SET value = s.sval, version = t.version + 1
          WHEN MATCHED AND t.status = 'B' THEN DELETE
          WHEN NOT MATCHED AND s.sval >= 50.0 THEN
            INSERT (id, status, value, version) VALUES (s.id, 'N', s.sval, 1)
          WHEN NOT MATCHED BY SOURCE AND t.status = 'C' THEN
            UPDATE SET value = t.value + 0.5, version = t.version + 1
          WHEN NOT MATCHED BY SOURCE AND t.id = 2 THEN DELETE""")
    assert(content(dir) === Set(
      (1L, "A", 100.0, 2L), (4L, "C", 40.5, 2L), (7L, "N", 70.0, 1L)))
  }

  test("SQL route: version guard surfaces through the statement") {
    val dir = freshDir("sqlguard")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    Seq((1L, 100.0)).toDF("id", "sval").createOrReplaceTempView("mc_sql_src2")
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO graft.`$dir` t USING mc_sql_src2 s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET value = s.sval""")
    }
    assert(e.getMessage.contains("version"))
  }

  test("SQL route: the canonical upsert still takes the latest-version-wins fast path") {
    val dir = freshDir("sqlcanon")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    // a STALE canonical upsert (version 0 < 1): the fast path arbitrates
    // by version and must keep the existing row — clause semantics would
    // have overwritten it unconditionally
    Seq((1L, "A", 99.0, 0L)).toDF("id", "status", "value", "version")
      .createOrReplaceTempView("mc_sql_src3")
    spark.sql(s"""MERGE INTO graft.`$dir` t USING mc_sql_src3 s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(content(dir).contains((1L, "A", 10.0, 1L)))
  }

  private def segDirs(dir: String): Set[String] = {
    val s = Files.list(java.nio.file.Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("seg-")).toSet
    } finally s.close()
  }

  test("mergeClausesMor: all four clause kinds == copy-on-write answers, " +
      "base segments untouched, metadata count exact") {
    val mor = freshDir("mor"); val cow = freshDir("mor-cow")
    for (d <- Seq(mor, cow))
      CommittedTable.write(base(), d, "status",
        keyCol = Some("id"), versionCol = Some("version"),
        statsCols = Seq("value"))
    val src = Seq((1L, 100.0), (3L, 5.0), (7L, 70.0), (8L, 3.0))
      .toDF("id", "sval")
    def clauses(run: (String) => Unit): Unit = { run(mor); run(cow) }
    val matched = Seq(
      MatchedUpdate(Some(expr("s.sval > t.value")),
        Map("value" -> expr("s.sval"), "version" -> expr("t.version + 1"))),
      MatchedDelete(Some(expr("t.status = 'B'"))))
    val inserts = Seq(
      NotMatchedInsert(Some(expr("s.sval >= 50.0")),
        Map("id" -> expr("s.id"), "status" -> lit("N"),
          "value" -> expr("s.sval"), "version" -> lit(1L))))
    val bySrc = Seq(
      BySourceUpdate(Some(expr("t.status = 'C'")),
        Map("value" -> expr("t.value + 0.5"),
          "version" -> expr("t.version + 1"))),
      BySourceDelete(Some(expr("t.id = 2"))))
    val segsBefore = segDirs(mor)
    CommittedTable.mergeClausesMor(spark, mor, src, matched, inserts, bySrc)
    CommittedTable.mergeClauses(spark, cow, src, matched, inserts, bySrc)
    assert(content(mor) === content(cow))
    assert(content(mor) === Set(
      (1L, "A", 100.0, 2L), (4L, "C", 40.5, 2L), (7L, "N", 70.0, 1L)))
    // every pre-merge base segment survived — only deltas + a vector
    assert(segsBefore.subsetOf(segDirs(mor)))
    // logical metadata count folds vector removals + delta additions:
    // started 4, deleted 2 (id=2, id=3), updated 2 in place, inserted 1
    assert(CommittedTable.count(spark, mor) === 3L)
    // partition B is all-deleted MoR-style: its base segment still
    // carries its entry, the vector empties it
    assert(CommittedTable.count(spark, mor, Some(Seq("B"))) === 0L)
  }

  test("mergeClausesMor: unclaimed rows are never restaged (source-bounded " +
      "cost without by-source clauses)") {
    val dir = freshDir("bounded")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    val segsBefore = segDirs(dir)
    // one matched update: only id=1's position + its new image publish
    CommittedTable.mergeClausesMor(spark, dir, Seq((1L, 11.0)).toDF("id", "sval"),
      matched = Seq(MatchedUpdate(None,
        Map("value" -> expr("s.sval"), "version" -> expr("t.version + 1")))))
    assert(content(dir) === Set(
      (1L, "A", 11.0, 2L), (2L, "A", 20.0, 1L), (3L, "B", 30.0, 1L),
      (4L, "C", 40.0, 1L)))
    assert(segsBefore.subsetOf(segDirs(dir)))
    // exactly ONE new data dir: the A-partition delta (B/C untouched —
    // with copy-on-write, A would have been rewritten whole too)
    assert((segDirs(dir) -- segsBefore).size === 1)
  }

  test("SQL MERGE INTO routes merge-on-read under updatemode='mor'") {
    val dir = freshDir("sqlmor")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    CommittedTable.setUpdateMode(spark, dir, Some("mor"))
    val segsBefore = segDirs(dir)
    Seq((1L, "A", 99.0, 2L), (9L, "D", 90.0, 1L))
      .toDF("id", "status", "value", "version")
      .createOrReplaceTempView("mc_sql_mor_src")
    spark.sql(s"""MERGE INTO graft.`$dir` t USING mc_sql_mor_src s
      ON t.id = s.id
      WHEN MATCHED AND s.version > t.version THEN UPDATE SET
        value = s.value, version = s.version
      WHEN NOT MATCHED THEN INSERT *""")
    assert(content(dir) === Set(
      (1L, "A", 99.0, 2L), (2L, "A", 20.0, 1L), (3L, "B", 30.0, 1L),
      (4L, "C", 40.0, 1L), (9L, "D", 90.0, 1L)))
    assert(segsBefore.subsetOf(segDirs(dir)))
    // the brand-new partition D staged as an ordinary first segment
    assert(manifest(dir).segments.keySet === Set("A", "B", "C", "D"))
  }

  test("mergeClausesMor on a bucketed layout lands as deltas; contracts stay loud") {
    // bucketed MoR is supported: the clause merge's written rows stage
    // bucket-split with the _NNNNN naming (BucketedTableSpec pins the
    // exchange-free plan) and every base segment survives
    val dir = freshDir("mor-refuse")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"),
      bucketBy = Some((4, Seq("id"))))
    val segsBefore = segDirs(dir)
    CommittedTable.mergeClausesMor(spark, dir,
      Seq((1L, 11.0)).toDF("id", "sval"),
      matched = Seq(MatchedUpdate(None,
        Map("value" -> expr("s.sval"), "version" -> expr("t.version + 1")))))
    assert(content(dir).contains((1L, "A", 11.0, 2L)))
    assert(segsBefore.subsetOf(segDirs(dir)))
    // the CDC version guard is shared validation: an update that skips
    // the version column is refused before any work
    val dir2 = freshDir("mor-ver")
    CommittedTable.write(base(), dir2, "status",
      keyCol = Some("id"), versionCol = Some("version"))
    val e2 = intercept[IllegalArgumentException] {
      CommittedTable.mergeClausesMor(spark, dir2,
        Seq((1L, 11.0)).toDF("id", "sval"),
        matched = Seq(MatchedUpdate(None, Map("value" -> expr("s.sval")))))
    }
    assert(e2.getMessage.contains("version"))
  }
}
