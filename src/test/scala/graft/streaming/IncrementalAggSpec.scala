package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.CommittedTable

/** The incrementally-maintained aggregate view: signed-CDF folding equals
  * a full recompute through every DML shape, replay is a no-op, and
  * cross-group moves debit/credit correctly. Values are binary-exact
  * doubles so incremental and full sums compare exactly. */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-iagg-$tag").toString + "/t"

  private def base() = Seq(
    (1L, "A", 10.0), (2L, "A", 20.5), (3L, "B", 30.0), (4L, "C", 40.0))
    .toDF("id", "status", "value")
    .withColumn("version", lit(1L))

  private def viewRows(dst: String): Map[String, (Long, Double)] =
    CommittedTable.read(spark, dst)
      .select($"status", $"n", $"sum_value")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  /** The recompute-comparable face: emptied groups (n = 0, kept for
    * applied_gen memory) have no counterpart in a fresh groupBy. */
  private def liveViewRows(dst: String): Map[String, (Long, Double)] =
    viewRows(dst).filter(_._2._1 > 0)

  private def recompute(src: String): Map[String, (Long, Double)] =
    CommittedTable.read(spark, src)
      .groupBy($"status")
      .agg(count(lit(1)).as("n"), sum($"value").as("s"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("view == full recompute through merge, cross-group move, update, delete; replay no-op") {
    val src = freshDir("src")
    val dst = freshDir("dst")
    val ckpt = Files.createTempDirectory("graft-iagg-ckpt").toString
    CommittedTable.write(base(), src, "status", retainGenerations = 8)
    val g0 = IncrementalAgg.init(spark, src, dst, "status", "value")
    assert(g0 === 1L)
    assert(liveViewRows(dst) === recompute(src))

    def sync(): Unit = {
      val q = IncrementalAgg.sync(spark, src, dst, "id", "version",
        "status", "value", ckpt).start()
      q.awaitTermination(120000)
    }

    // gen 2: in-group update (A: 20.5 → 25.5), cross-group move (3: B → A,
    // value changes too), insert (9 → C)
    CommittedTable.merge(spark, src,
      Seq((2L, "A", 25.5, 2L), (3L, "A", 31.0, 2L), (9L, "C", 90.0, 2L))
        .toDF("id", "status", "value", "version"),
      "id", "version", "status")
    // gen 3: predicate delete; gen 4: UPDATE with version bump
    CommittedTable.delete(spark, src, $"id" === 4L, "status")
    CommittedTable.update(spark, src, $"id" === 1L,
      Map("value" -> lit(12.0), "version" -> lit(2L)), "status")
    sync()
    assert(liveViewRows(dst) === recompute(src))
    // B emptied by the move: its row stays at n = 0 (applied_gen memory)
    assert(viewRows(dst)("B") === ((0L, 0.0)))

    // replay: restart with the SAME checkpoint and no new generations —
    // and also re-apply a stale batch by hand; both must change nothing
    val before = viewRows(dst)
    sync()
    assert(viewRows(dst) === before)
    val stale = CommittedTable.changesCdf(spark, src, 2L, "id", "version")
      .withColumn(ChangeFeed.GenColumn, lit(2L))
    IncrementalAgg.apply(stale, dst, "status", "value")
    assert(viewRows(dst) === before)

    // further generations keep folding
    CommittedTable.merge(spark, src,
      Seq((10L, "B", 5.0, 5L)).toDF("id", "status", "value", "version"),
      "id", "version", "status")
    sync()
    assert(liveViewRows(dst) === recompute(src))
    assert(viewRows(dst)("B") === ((1L, 5.0)))
  }

  test("view == full recompute through a CLAUSE merge (conditional update, delete, insert, by-source)") {
    val src = freshDir("mcsrc")
    val dst = freshDir("mcdst")
    val ckpt = Files.createTempDirectory("graft-iagg-mc-ckpt").toString
    CommittedTable.write(base(), src, "status", retainGenerations = 8,
      keyCol = Some("id"), versionCol = Some("version"))
    IncrementalAgg.init(spark, src, dst, "status", "value")
    // one mergeClauses generation touching every change class: id=1
    // updated in-group, id=3 deleted, id=9 inserted into a fresh group,
    // id=4 moved C→A by a by-source update (version bumped everywhere —
    // the CDC guard both enforces and the fold depends on)
    CommittedTable.mergeClauses(spark, src,
      Seq((1L, 12.0), (3L, 0.0), (20L, 5.0)).toDF("id", "sval"),
      matched = Seq(
        CommittedTable.MatchedUpdate(Some(expr("s.sval > 0")),
          Map("value" -> expr("s.sval"), "version" -> expr("t.version + 1"))),
        CommittedTable.MatchedDelete(None)),
      notMatched = Seq(CommittedTable.NotMatchedInsert(None,
        Map("id" -> expr("s.id + 9"), "status" -> lit("D"),
          "value" -> lit(7.5), "version" -> lit(1L)))),
      bySource = Seq(CommittedTable.BySourceUpdate(Some(expr("t.status = 'C'")),
        Map("status" -> lit("A"), "version" -> expr("t.version + 1")))))
    val q = IncrementalAgg.sync(spark, src, dst, "id", "version",
      "status", "value", ckpt).start()
    q.awaitTermination(120000)
    assert(liveViewRows(dst) === recompute(src))
    // B emptied by the clause delete; C emptied by the by-source move
    assert(viewRows(dst)("B") === ((0L, 0.0)))
    assert(viewRows(dst)("C") === ((0L, 0.0)))
  }

  private def minMaxRows(dst: String): Map[String, (Option[Double], Option[Double])] =
    CommittedTable.read(spark, dst)
      .select($"status", $"min_value", $"max_value")
      .as[(String, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  private def recomputeMinMax(src: String): Map[String, (Option[Double], Option[Double])] =
    CommittedTable.read(spark, src)
      .groupBy($"status")
      .agg(min($"value").as("mn"), max($"value").as("mx"))
      .as[(String, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("MIN/MAX == full recompute through extreme-removing delete, update, move; AVG derived") {
    val src = freshDir("mm-src")
    val dst = freshDir("mm-dst")
    val ckpt = Files.createTempDirectory("graft-iagg-mm-ckpt").toString
    CommittedTable.write(base(), src, "status", retainGenerations = 10)
    IncrementalAgg.init(spark, src, dst, "status", "value")
    assert(minMaxRows(dst).filter(_._2._1.isDefined) === recomputeMinMax(src))

    def sync(): Unit = {
      val q = IncrementalAgg.sync(spark, src, dst, "id", "version",
        "status", "value", ckpt).start()
      q.awaitTermination(120000)
    }

    // gen 2: insert extends A's max (fold-only path, no rescan possible)
    CommittedTable.merge(spark, src,
      Seq((5L, "A", 99.0, 2L)).toDF("id", "status", "value", "version"),
      "id", "version", "status")
    sync()
    assert(minMaxRows(dst)("A") === ((Some(10.0), Some(99.0))))

    // gen 3: DELETE removes A's max (99) — the non-invertible case; the
    // rescan must restore max = 20.5, not keep the stale 99
    CommittedTable.delete(spark, src, $"id" === 5L, "status")
    sync()
    assert(minMaxRows(dst)("A") === ((Some(10.0), Some(20.5))))
    assert(minMaxRows(dst).filter(_._2._1.isDefined) === recomputeMinMax(src))

    // gen 4: UPDATE raises A's min row from 10 → 15 (preimage retracts
    // the current min); gen 5: cross-group move empties B
    CommittedTable.update(spark, src, $"id" === 1L,
      Map("value" -> lit(15.0), "version" -> lit(2L)), "status")
    CommittedTable.merge(spark, src,
      Seq((3L, "A", 31.0, 2L)).toDF("id", "status", "value", "version"),
      "id", "version", "status")
    sync()
    assert(minMaxRows(dst).filter(_._2._1.isDefined) === recomputeMinMax(src))
    // B retired: n = 0, NULL extremes
    assert(minMaxRows(dst)("B") === ((None, None)))

    // AVG derives from the folded sums
    val avg = IncrementalAgg.readView(spark, dst)
      .filter($"status" === "A")
      .select($"avg_value").as[Double].collect().head
    val expect = CommittedTable.read(spark, src).filter($"status" === "A")
      .agg(sum($"value") / count(lit(1))).as[Double].collect().head
    assert(math.abs(avg - expect) < 1e-12)

    // replayed stale batch: still a no-op with min/max present
    val before = minMaxRows(dst)
    val stale = CommittedTable.changesCdf(spark, src, 2L, "id", "version")
      .withColumn(ChangeFeed.GenColumn, lit(2L))
    IncrementalAgg.apply(stale, dst, "status", "value", Some(src))
    assert(minMaxRows(dst) === before)
  }

  test("view == full recompute through MERGE-ON-READ generations " +
      "(mergeMor, updateMor, deleteKeysMor, clause MoR)") {
    val src = freshDir("mor-src")
    val dst = freshDir("mor-dst")
    val ckpt = Files.createTempDirectory("graft-iagg-mor-ckpt").toString
    CommittedTable.write(base(), src, "status",
      keyCol = Some("id"), versionCol = Some("version"),
      retainGenerations = 8)
    IncrementalAgg.init(spark, src, dst, "status", "value")
    def sync(): Unit = {
      val q = IncrementalAgg.sync(spark, src, dst, "id", "version",
        "status", "value", ckpt).start()
      q.awaitTermination(120000)
    }
    // gen 2 (mergeMor): in-group update + cross-group move + insert —
    // all published as vector + deltas, zero partition rewrites
    CommittedTable.mergeMor(spark, src,
      Seq((2L, "A", 25.5, 2L), (3L, "A", 31.0, 2L), (9L, "C", 90.0, 2L))
        .toDF("id", "status", "value", "version"),
      "id", "version", "status")
    // gen 3 (updateMor), gen 4 (deleteKeysMor)
    CommittedTable.updateMor(spark, src, $"id" === 1L,
      Map("value" -> lit(12.0), "version" -> lit(2L)), "status",
      versionCol = Some("version"))
    CommittedTable.deleteKeysMor(spark, src, Seq(4L).toDF("id"),
      "id", "status")
    sync()
    assert(liveViewRows(dst) === recompute(src))
    // gen 5: the MoR clause surface feeds the same fold
    CommittedTable.mergeClausesMor(spark, src,
      Seq((2L, 99.0), (11L, 7.0)).toDF("id", "sval"),
      matched = Seq(CommittedTable.MatchedUpdate(None,
        Map("value" -> expr("s.sval"), "version" -> expr("t.version + 1")))),
      notMatched = Seq(CommittedTable.NotMatchedInsert(None,
        Map("id" -> expr("s.id"), "status" -> lit("B"),
          "value" -> expr("s.sval"), "version" -> lit(1L)))))
    sync()
    assert(liveViewRows(dst) === recompute(src))
  }

  test("integral valueCol: bootstrap and fold agree on a DOUBLE sum_value") {
    // init over a LONG value column must not write int64 sum_value: the
    // first fold rewrites only the touched groups' partitions as double,
    // and a mixed-type view is unreadable (parquet cannot serve INT64
    // through the newest segment's probed DoubleType)
    val src = freshDir("int-src")
    val dst = freshDir("int-dst")
    val ckpt = Files.createTempDirectory("graft-iagg-ickpt").toString
    val rows = Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "B", 30L),
      (4L, "C", 40L)).toDF("id", "status", "value")
      .withColumn("version", lit(1L))
    CommittedTable.write(rows, src, "status", retainGenerations = 8)
    IncrementalAgg.init(spark, src, dst, "status", "value")
    assert(CommittedTable.read(spark, dst).schema("sum_value").dataType ===
      org.apache.spark.sql.types.DoubleType)
    // touch ONLY group A; groups B and C keep their bootstrap partitions
    CommittedTable.merge(spark, src,
      Seq((1L, "A", 15L, 2L)).toDF("id", "status", "value", "version"),
      "id", "version", "status")
    val q = IncrementalAgg.sync(spark, src, dst, "id", "version",
      "status", "value", ckpt).start()
    q.awaitTermination(120000)
    // the full view — untouched partitions included — stays readable
    assert(viewRows(dst) === Map(
      "A" -> ((2L, 35.0)), "B" -> ((1L, 30.0)), "C" -> ((1L, 40.0))))
  }

  test("boundedValues never materializes a high-cardinality group set " +
      "on the driver: 100k distinct values -> None via a LIMIT probe") {
    // the driver-safety contract behind MaxGroupValueList: the probe is
    // LIMIT max+1, so even a 100k-group batch hands the driver at most
    // max+1 strings before the fold switches to the semi-join path
    val wide = spark.range(100000)
      .select(($"id" % 100000).cast("string").as("g")).distinct()
    assert(IncrementalAgg.boundedValues(wide, 10000) === None)
    assert(IncrementalAgg.boundedValues(wide, 3) === None)
    // the probe's plan carries the LIMIT — the full distinct set is
    // never a driver result even when the answer is None
    val probePlan = wide.limit(4).queryExecution.executedPlan.toString
    assert(probePlan.contains("Limit") || probePlan.contains("limit"))
    val small = spark.range(5).select($"id".cast("string").as("g"))
    assert(IncrementalAgg.boundedValues(small, 10)
      .map(_.toSet) === Some(Set("0", "1", "2", "3", "4")))
  }

  test("above the valve the fold semi-joins instead of collecting " +
      "group values — answers identical to the pruned path, min/max " +
      "rescans included") {
    // 60 groups, extreme-retracting updates in EVERY group, valve = 8:
    // both the touched-group and rescan-group lists exceed the valve, so
    // the fold must take the distributed semi-join path end to end
    val src = freshDir("valve-src")
    val dstJ = freshDir("valve-join")
    val dstP = freshDir("valve-prune")
    val rows = (0 until 60).flatMap { g =>
      Seq((2L * g, f"g$g%02d", g * 1.0), (2L * g + 1, f"g$g%02d", g + 100.0))
    }.toDF("id", "status", "value").withColumn("version", lit(1L))
    CommittedTable.write(rows, src, "status", retainGenerations = 8,
      keyCol = Some("id"), versionCol = Some("version"))
    IncrementalAgg.init(spark, src, dstJ, "status", "value")
    IncrementalAgg.init(spark, src, dstP, "status", "value")
    // gen 2: every group's MAX row drops below its old min — the
    // preimage retracts the extreme (rescan) and the postimage extends
    // the min (fold), in all 60 groups at once
    val upd = (0 until 60).map(g =>
      (2L * g + 1, f"g$g%02d", g - 50.0, 2L))
      .toDF("id", "status", "value", "version")
    CommittedTable.merge(spark, src, upd, "id", "version", "status")
    val batch = CommittedTable.changesCdf(spark, src, 2L, "id", "version")
      .withColumn(ChangeFeed.GenColumn, lit(2L))
    batch.persist()
    try {
      IncrementalAgg.apply(batch, dstJ, "status", "value", Some(src),
        maxGroupValueList = 8)     // join path (60 > 8)
      IncrementalAgg.apply(batch, dstP, "status", "value", Some(src))
    } finally { batch.unpersist(); () }
    assert(liveViewRows(dstJ) === recompute(src))
    assert(minMaxRows(dstJ) === recomputeMinMax(src))
    // plan choice is invisible in the answers: both paths agree exactly
    assert(viewRows(dstJ) === viewRows(dstP))
    assert(minMaxRows(dstJ) === minMaxRows(dstP))
  }
}
