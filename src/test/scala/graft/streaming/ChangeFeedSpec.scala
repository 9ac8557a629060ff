package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.SparkSpec
import graft.sources.CommittedTable

/** The CommittedTable change feed, batch and streaming: change-batch
  * resolution per generation ([[CommittedTable.changesFor]] /
  * [[CommittedTable.changesForKeys]]), the DSv1 [[ChangeFeedSource]]
  * (offsets = generations) with exactly-once delivery across restarts,
  * and the loud retention-lag failure. */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-cf-$tag").toString + "/t"

  private def base() = Seq(
    (1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 30.0))
    .toDF("id", "status", "value")
    .withColumn("version", lit(1L))

  private def upsert(id: Long, status: String, value: Double, ver: Long) =
    Seq((id, status, value, ver)).toDF("id", "status", "value", "version")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Double, Long)] =
    df.select($"id", $"status", $"value", $"version")
      .as[(Long, String, Double, Long)].collect().toSet

  // ---- changesFor: batch-level change resolution --------------------------

  test("changesFor: initial load, merge delta, current-gen head") {
    val dir = freshDir("basic")
    CommittedTable.write(base(), dir, "status", retainGenerations = 3)
    // gen 1 = the whole initial load
    assert(rows(CommittedTable.changesFor(spark, dir, 1L)) ===
      Set((1L, "A", 10.0, 1L), (2L, "A", 20.0, 1L), (3L, "B", 30.0, 1L)))

    CommittedTable.merge(spark, dir, upsert(2L, "A", 21.0, 2L),
      "id", "version", "status")
    // gen 2 touched only partition A: its FULL rewritten contents
    assert(rows(CommittedTable.changesFor(spark, dir, 2L)) ===
      Set((1L, "A", 10.0, 1L), (2L, "A", 21.0, 2L)))
    // gen 1 still resolvable from its retained anchor, bit-for-bit
    assert(rows(CommittedTable.changesFor(spark, dir, 1L)) ===
      Set((1L, "A", 10.0, 1L), (2L, "A", 20.0, 1L), (3L, "B", 30.0, 1L)))
  }

  test("changesFor: future generation and aged-out generation fail loudly") {
    val dir = freshDir("errs")
    CommittedTable.write(base(), dir, "status") // retain = 2
    val future = intercept[java.io.IOException](
      CommittedTable.changesFor(spark, dir, 7L))
    assert(future.getMessage.contains("has not been published yet") &&
      future.getMessage.contains("current 1"), future.getMessage)

    CommittedTable.merge(spark, dir, upsert(2L, "A", 21.0, 2L),
      "id", "version", "status")
    CommittedTable.merge(spark, dir, upsert(2L, "A", 22.0, 3L),
      "id", "version", "status")
    // retain=2 at gen 3 ⇒ readable 2..3; gen 1 aged out
    val aged = intercept[java.io.IOException](
      CommittedTable.changesFor(spark, dir, 1L))
    assert(aged.getMessage.contains("not retained") &&
      aged.getMessage.contains("readable 2..3"), aged.getMessage)
  }

  // ---- changesForKeys: key-level delta ------------------------------------

  test("changesForKeys: hot-partition upsert emits ONE row, not the partition") {
    val dir = freshDir("keys")
    CommittedTable.write(base(), dir, "status", retainGenerations = 3)
    CommittedTable.merge(spark, dir, upsert(2L, "A", 21.0, 2L),
      "id", "version", "status")

    val full = CommittedTable.changesFor(spark, dir, 2L)
    val delta = CommittedTable.changesForKeys(spark, dir, 2L, "id", "version")
    assert(rows(delta) === Set((2L, "A", 21.0, 2L)))
    // amplification contract: delta ∪ unchanged == the full partition
    // contents, disjointly — nothing lost, nothing double-reported
    val unchanged = full.join(delta.select($"id", $"version"),
      Seq("id", "version"), "left_anti")
    assert(rows(delta) ++ rows(unchanged) === rows(full))
    assert(rows(delta).intersect(rows(unchanged)).isEmpty)
    // generation 1 is all-new by definition
    assert(rows(CommittedTable.changesForKeys(spark, dir, 1L, "id", "version"))
      === rows(CommittedTable.changesFor(spark, dir, 1L)))
  }

  test("changesForKeys: missing baseline generation names the tighter lag window") {
    val dir = freshDir("keyslag")
    CommittedTable.write(base(), dir, "status") // retain = 2
    CommittedTable.merge(spark, dir, upsert(2L, "A", 21.0, 2L),
      "id", "version", "status")
    CommittedTable.merge(spark, dir, upsert(2L, "A", 22.0, 3L),
      "id", "version", "status")
    // gen 2 is retained (readable 2..3) but its baseline gen 1 is not
    val e = intercept[java.io.IOException](
      CommittedTable.changesForKeys(spark, dir, 2L, "id", "version"))
    assert(e.getMessage.contains("needs generation 1 retained") &&
      e.getMessage.contains("retainGenerations - 2"), e.getMessage)
  }

  test("delete interplay: full mode emits survivors, keys mode emits ZERO (no tombstones)") {
    val dir = freshDir("del")
    CommittedTable.write(base(), dir, "status", retainGenerations = 3)
    CommittedTable.delete(spark, dir, $"id" === 2L, "status") // gen 2: A loses id 2
    // full mode: the rewritten partition's surviving contents
    assert(rows(CommittedTable.changesFor(spark, dir, 2L)) ===
      Set((1L, "A", 10.0, 1L)))
    // keys mode: no (key, version) pair is new — the documented
    // no-tombstone contract (propagating deletes needs an anti-join)
    assert(CommittedTable.changesForKeys(spark, dir, 2L, "id", "version")
      .count() === 0L)
  }

  test("changesCdf: insert / update pre+post / delete classified; compact is silent") {
    val dir = freshDir("cdf")
    CommittedTable.write(base(), dir, "status", retainGenerations = 6)
    // gen 2: update id 2, insert id 9, move id 3 B→A (version advanced)
    CommittedTable.merge(spark, dir,
      Seq((2L, "A", 21.0, 2L), (9L, "B", 90.0, 2L), (3L, "A", 31.0, 2L))
        .toDF("id", "status", "value", "version"),
      "id", "version", "status")
    def cdf(g: Long) = CommittedTable
      .changesCdf(spark, dir, g, "id", "version")
      .select($"id", $"status", $"value", $"version",
        col(CommittedTable.ChangeTypeColumn))
      .as[(Long, String, Double, Long, String)].collect().toSet
    assert(cdf(1L).forall(_._5 === "insert")) // gen 1 = all inserts
    assert(cdf(2L) === Set(
      (9L, "B", 90.0, 2L, "insert"),
      (2L, "A", 21.0, 2L, "update_postimage"),
      (2L, "A", 20.0, 1L, "update_preimage"),
      (3L, "A", 31.0, 2L, "update_postimage"), // the move, new home
      (3L, "B", 30.0, 1L, "update_preimage")))
    // gen 3: delete B's only row — a tombstone from a RETIRED partition
    // (B's manifest entry drops; its previous rows must still surface)
    CommittedTable.delete(spark, dir, $"id" === 9L, "status")
    assert(cdf(3L) === Set((9L, "B", 90.0, 2L, "delete")))
    // gen 4: compact — layout only, CDF must be EMPTY
    CommittedTable.compact(spark, dir, "status")
    assert(cdf(4L).isEmpty)
  }

  test("CDF replica sync: deletes propagate — dst tracks src through all DML") {
    val src = freshDir("cdfsrc")
    val dst = freshDir("cdfdst")
    val ckpt = Files.createTempDirectory("graft-cdf-sync-ckpt").toString
    CommittedTable.write(base(), src, "status", retainGenerations = 8)
    CommittedTable.write(base().filter(lit(false)), dst, "status")

    def sync(): Unit = {
      val q = ChangeFeed.readCdf(spark, src, "id", "version")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.persist()
          try ChangeFeed.applyCdf(b, dst, "id", "version", "status")
          finally { b.unpersist(); () }
        }.start()
      q.awaitTermination(120000)
    }
    def snap(dir: String) = rows(CommittedTable.read(spark, dir))

    sync() // initial load
    assert(snap(dst) === snap(src))
    // a merge, a delete, and an update land; ONE sync replays all three
    CommittedTable.merge(spark, src, upsert(2L, "A", 21.0, 2L),
      "id", "version", "status")
    CommittedTable.delete(spark, src, $"id" === 3L, "status")
    CommittedTable.update(spark, src, $"id" === 1L,
      Map("value" -> lit(11.0), "version" -> lit(2L)), "status")
    sync()
    assert(snap(dst) === snap(src))
    assert(snap(dst).map(_._1) === Set(1L, 2L)) // 3 really deleted downstream
    // idempotent re-sync
    sync()
    assert(snap(dst) === snap(src))
  }

  test("CDF replica sync over merge-on-read: vector+delta generations replay exactly into a MoR replica") {
    // the r17+ steady state: the SOURCE mutates through the MoR verbs
    // (deltas + deletion vectors, base segments never rewritten) and the
    // REPLICA applies through them too (applyCdf mor=true) — the signed
    // change feed must stay exact across vector+delta generations on
    // both sides, and the replay must stay idempotent under MoR's
    // tie-keeps-existing arbitration
    val src = freshDir("morsrc")
    val dst = freshDir("mordst")
    val ckpt = Files.createTempDirectory("graft-cdf-mor-ckpt").toString
    CommittedTable.write(base(), src, "status", retainGenerations = 8,
      keyCol = Some("id"), versionCol = Some("version"))
    CommittedTable.write(base().filter(lit(false)), dst, "status")

    def sync(): Unit = {
      val q = ChangeFeed.readCdf(spark, src, "id", "version")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.persist()
          try ChangeFeed.applyCdf(b, dst, "id", "version", "status",
            mor = true)
          finally { b.unpersist(); () }
        }.start()
      q.awaitTermination(120000)
    }
    def snap(dir: String) = rows(CommittedTable.read(spark, dir))

    sync() // initial load
    assert(snap(dst) === snap(src))
    // MoR merge (vector + delta), MoR update (images as deltas), MoR
    // delete (vector spanning base and delta files) land on the source
    CommittedTable.mergeMor(spark, src, upsert(2L, "A", 21.0, 2L),
      "id", "version", "status")
    CommittedTable.updateMor(spark, src, $"id" === 1L,
      Map("value" -> lit(11.0), "version" -> lit(2L)), "status",
      versionCol = Some("version"))
    CommittedTable.deleteMor(spark, src, $"id" === 3L, "status")
    // the source really is merge-on-read: live delta or vector state
    val mSrc = CommittedTable.manifestAt(spark, src)
    assert(mSrc.segments.keys.exists(p =>
      CommittedTable.liveDeltas(mSrc, p).nonEmpty ||
        CommittedTable.liveDv(mSrc, p).isDefined))
    sync() // ONE sync replays all three MoR generations
    assert(snap(dst) === snap(src))
    assert(snap(dst) === Set((1L, "A", 11.0, 2L), (2L, "A", 21.0, 2L)))
    // the replica took the MoR path too: deltas/vectors, not rewrites
    val mDst = CommittedTable.manifestAt(spark, dst)
    assert(mDst.segments.keys.exists(p =>
      CommittedTable.liveDeltas(mDst, p).nonEmpty ||
        CommittedTable.liveDv(mDst, p).isDefined))
    // idempotent re-sync (MoR replay ties keep existing; no-op publish
    // doesn't even burn a generation)
    val genBefore = CommittedTable.manifestAt(spark, dst).gen
    sync()
    assert(snap(dst) === snap(src))
    assert(CommittedTable.manifestAt(spark, dst).gen === genBefore)
  }

  // ---- the streaming Source -----------------------------------------------

  private def runFeed(dir: String, out: String, ckpt: String,
      keyDelta: Option[(String, String)] = None): Unit = {
    val q = ChangeFeed.read(spark, dir, keyDelta = keyDelta)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
  }

  test("the feed resolves by SHORT NAME: readStream.format(\"graft-changefeed\")") {
    // META-INF/services registration — user code needs no internal class
    // names; options (path, mode) flow through the provider unchanged
    val dir = freshDir("short")
    val out = Files.createTempDirectory("graft-cfsn-out").toString
    val ckpt = Files.createTempDirectory("graft-cfsn-ckpt").toString
    CommittedTable.write(base(), dir, "status", retainGenerations = 4)
    val q = spark.readStream.format("graft-changefeed")
      .option("path", dir)
      .load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.read.parquet(out)
    assert(got.count() === 3L)
    assert(got.columns.contains("_change_gen"))
    // cdf mode through the short name carries the change-type column
    val cdfSchema = spark.readStream.format("graft-changefeed")
      .option("path", dir).option("mode", "cdf").load().schema
    assert(cdfSchema.fieldNames.contains("_change_type"))
  }

  test("streaming: gens delivered exactly-once across restarts, in order, tagged") {
    val dir = freshDir("stream")
    val out = Files.createTempDirectory("graft-cf-out").toString
    val ckpt = Files.createTempDirectory("graft-cf-ckpt").toString
    CommittedTable.write(base(), dir, "status", retainGenerations = 4)

    runFeed(dir, out, ckpt) // sees gen 1 only
    val first = spark.read.parquet(out)
    assert(first.count() === 3L)
    assert(first.select($"_change_gen").as[Long].collect().toSet === Set(1L))

    // no new generations: restart delivers NOTHING again
    runFeed(dir, out, ckpt)
    assert(spark.read.parquet(out).count() === 3L)

    // two more generations land; one restart drains exactly both
    CommittedTable.merge(spark, dir, upsert(2L, "A", 21.0, 2L),
      "id", "version", "status")
    CommittedTable.merge(spark, dir, upsert(9L, "B", 90.0, 2L),
      "id", "version", "status")
    runFeed(dir, out, ckpt)
    val all = spark.read.parquet(out)
    // gen2 = partition A rewritten (2 rows), gen3 = partition B (2 rows)
    assert(all.count() === 7L, all.collect().mkString(","))
    assert(all.groupBy($"_change_gen").count()
      .as[(Long, Long)].collect().toMap === Map(1L -> 3L, 2L -> 2L, 3L -> 2L))
    // the gen-2 batch is the idempotent upsert batch downstream re-merges
    assert(rows(all.filter($"_change_gen" === 2L)) ===
      Set((1L, "A", 10.0, 1L), (2L, "A", 21.0, 2L)))
  }

  test("maxGenerationsPerBatch: a backlog drains as BOUNDED batches") {
    val dir = freshDir("ratelimit")
    val out = Files.createTempDirectory("graft-cfr-out").toString
    val ckpt = Files.createTempDirectory("graft-cfr-ckpt").toString
    // 4-generation backlog before the stream ever starts
    CommittedTable.write(base(), dir, "status", retainGenerations = 8)
    CommittedTable.merge(spark, dir, upsert(2L, "A", 21.0, 2L),
      "id", "version", "status")
    CommittedTable.merge(spark, dir, upsert(9L, "B", 90.0, 2L),
      "id", "version", "status")
    CommittedTable.merge(spark, dir, upsert(1L, "A", 11.0, 3L),
      "id", "version", "status")
    val q = spark.readStream.format("graft-changefeed")
      .option("path", dir)
      .option("startingGeneration", "earliest")
      .option("maxGenerationsPerBatch", "1")
      .load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val all = spark.read.parquet(out)
    // everything delivered, exactly once, in generation order…
    assert(all.groupBy($"_change_gen").count()
      .as[(Long, Long)].collect().toMap ===
      Map(1L -> 3L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
    // …and as FOUR one-generation batches, not one giant catch-up batch:
    // the sink records the planning batchId per file via the stream's
    // commit log — 4 committed batches for 4 generations
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(commits === 4, s"expected 4 bounded batches, got $commits")
  }

  test("streaming keys mode: one upserted row streams one row") {
    val dir = freshDir("streamkeys")
    val out = Files.createTempDirectory("graft-cfk-out").toString
    val ckpt = Files.createTempDirectory("graft-cfk-ckpt").toString
    CommittedTable.write(base(), dir, "status", retainGenerations = 4)
    CommittedTable.merge(spark, dir, upsert(2L, "A", 21.0, 2L),
      "id", "version", "status")

    runFeed(dir, out, ckpt, keyDelta = Some(("id", "version")))
    val all = spark.read.parquet(out)
    // gen 1: all 3 initial rows are new; gen 2: ONLY the upsert
    assert(all.groupBy($"_change_gen").count()
      .as[(Long, Long)].collect().toMap === Map(1L -> 3L, 2L -> 1L))
    assert(rows(all.filter($"_change_gen" === 2L)) === Set((2L, "A", 21.0, 2L)))
  }

  test("CDC sync end-to-end: feed → StreamingMerge keeps a derived table == source") {
    // the full loop the library sells: writes land in src via merge, the
    // change feed streams the per-key deltas, StreamingMerge.toCommitted
    // re-merges them into dst — an incrementally-maintained replica whose
    // per-sync work is bounded by the true upserts, never table size
    val src = freshDir("syncsrc")
    val dst = freshDir("syncdst")
    val ckpt = Files.createTempDirectory("graft-cf-sync-ckpt").toString
    CommittedTable.write(base(), src, "status", retainGenerations = 4)
    // bootstrap dst with the schema and zero rows (a fully-retired table
    // accepts insert-only merges — the documented path)
    CommittedTable.write(base().filter(lit(false)), dst, "status")

    def sync(): Unit = {
      val feed = ChangeFeed.read(spark, src, keyDelta = Some(("id", "version")))
        .drop(ChangeFeed.GenColumn)
      val q = StreamingMerge.toCommitted(feed, dst, "id", "version", "status",
        checkpoint = ckpt).start()
      q.awaitTermination(120000)
    }
    def snap(dir: String) = rows(CommittedTable.read(spark, dir))

    sync() // drains gen 1 (the initial load)
    assert(snap(dst) === snap(src))

    CommittedTable.merge(spark, src, upsert(2L, "A", 21.0, 2L),
      "id", "version", "status")
    CommittedTable.merge(spark, src, upsert(9L, "B", 90.0, 2L),
      "id", "version", "status")
    sync() // incremental: two generations, three delta rows total
    assert(snap(dst) === snap(src))

    // idempotence: a sync with nothing new changes nothing
    sync()
    assert(snap(dst) === snap(src))
  }

  test("earliest start on an AGED table: keys mode floors at the oldest gen with a baseline") {
    val dir = freshDir("agedstart")
    val out = Files.createTempDirectory("graft-cfa-out").toString
    val ckpt = Files.createTempDirectory("graft-cfa-ckpt").toString
    CommittedTable.write(base(), dir, "status") // retain = 2
    CommittedTable.merge(spark, dir, upsert(2L, "A", 21.0, 2L),
      "id", "version", "status")
    CommittedTable.merge(spark, dir, upsert(2L, "A", 22.0, 3L),
      "id", "version", "status")
    // readable = {2, 3}, but gen 2's baseline (gen 1) is aged out: a keys
    // stream from "earliest" must start AT gen 3, not die on gen 2
    runFeed(dir, out, ckpt, keyDelta = Some(("id", "version")))
    val got = spark.read.parquet(out)
    assert(got.select($"_change_gen").as[Long].collect().toSet === Set(3L))
    assert(rows(got) === Set((2L, "A", 22.0, 3L)))
  }

  test("streaming: consumer lagging past retention fails loudly, names the window") {
    val dir = freshDir("lag")
    val out = Files.createTempDirectory("graft-cfl-out").toString
    val ckpt = Files.createTempDirectory("graft-cfl-ckpt").toString
    CommittedTable.write(base(), dir, "status") // retain = 2
    runFeed(dir, out, ckpt) // checkpoint commits generation 1

    // writer advances to gen 4 while the consumer sleeps: readable 3..4,
    // the checkpointed next batch (gen 2) is gone
    CommittedTable.merge(spark, dir, upsert(2L, "A", 21.0, 2L),
      "id", "version", "status")
    CommittedTable.merge(spark, dir, upsert(2L, "A", 22.0, 3L),
      "id", "version", "status")
    CommittedTable.merge(spark, dir, upsert(2L, "A", 23.0, 4L),
      "id", "version", "status")
    val e = intercept[StreamingQueryException] {
      runFeed(dir, out, ckpt)
    }
    val msg = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msg.contains("not retained") && msg.contains("readable 3..4"), msg)
  }

  test("earliest start outrun by the writer fails loudly, never a silent empty batch") {
    // the race: getOffset captured `end` while the table was young; by the
    // time getBatch plans the first batch the writer has pushed the retain
    // floor past `end`. The whole requested range is lost — that must be
    // the retention error, not a committed empty batch skipping gens.
    val dir = freshDir("race")
    CommittedTable.write(base(), dir, "status") // retain = 2
    val src = new ChangeFeedSource(spark, dir, "earliest", None)
    // planning starts: getOffset captures gen 1 (this also marks the
    // stream as live-planning — a recovery getBatch precedes any poll)
    val endAtStart = src.getOffset.get
    // writer races: gens 2..4 published, floor now past gen 1
    CommittedTable.merge(spark, dir, upsert(2L, "A", 21.0, 2L),
      "id", "version", "status")
    CommittedTable.merge(spark, dir, upsert(2L, "A", 22.0, 3L),
      "id", "version", "status")
    CommittedTable.merge(spark, dir, upsert(2L, "A", 23.0, 4L),
      "id", "version", "status")
    val e = intercept[IllegalStateException](
      src.getBatch(None, endAtStart))
    assert(e.getMessage.contains("lost generations"), e.getMessage)
    // a COMMITTED start replaying an already-delivered range is still the
    // benign no-op (restart semantics), not an error — zero-row batch in
    // the stream schema
    val replay = src.getBatch(
      Some(org.apache.spark.sql.execution.streaming.runtime.LongOffset(4L)),
      org.apache.spark.sql.execution.streaming.runtime.LongOffset(4L))
    assert(replay.isStreaming && replay.schema === src.schema)
    // checkpoint-recovery shape: a FRESH source's first call is getBatch
    // (no prior getOffset this run) — re-initialization, never the error
    val recovered = new ChangeFeedSource(spark, dir, "earliest", None)
    val reinit = recovered.getBatch(None, endAtStart)
    assert(reinit.isStreaming && reinit.schema === recovered.schema)
  }

  test("mid-stream schema widen fails loudly; schemaDrift=drop opts out; restart picks it up") {
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val dir = freshDir("widen")
    val out = Files.createTempDirectory("graft-cf-widen-out").toString
    val ckpt = Files.createTempDirectory("graft-cf-widen-ckpt").toString
    CommittedTable.write(base(), dir, "status", retainGenerations = 6)
    runFeed(dir, out, ckpt) // drains gen 1
    assert(spark.read.parquet(out).count() === 3L)

    // two LIVE sources whose schema was fixed BEFORE the widen (an
    // AvailableNow drain builds a fresh source per run, so the
    // mid-stream case is driven on the Source directly — the outrun
    // test's technique)
    val failSrc = new ChangeFeedSource(spark, dir, "earliest", None)
    val dropSrc = new ChangeFeedSource(spark, dir, "earliest", None,
      dropDrift = true)
    assert(!failSrc.schema.fieldNames.contains("tag"))

    // the writer widens the table AFTER those schemas were fixed
    CommittedTable.merge(spark, dir,
      upsert(4L, "B", 40.0, 2L).withColumn("tag", lit("x")),
      "id", "version", "status", allowAddColumns = true)

    // default: the post-widen batch fails LOUDLY, naming column + remedy
    val e = intercept[IllegalStateException](
      failSrc.getBatch(Some(LongOffset(1L)), LongOffset(2L)))
    assert(e.getMessage.contains("tag") &&
      e.getMessage.contains("restart the stream"), e.getMessage)

    // schemaDrift=drop: the same batch is delivered WITHOUT the new column
    val dropped = dropSrc.getBatch(Some(LongOffset(1L)), LongOffset(2L))
    assert(!dropped.columns.contains("tag"))

    // the named remedy: a restarted stream (fresh readStream, SAME
    // checkpoint and sink) resumes at the pending generation with the
    // widened schema — nothing skipped, nothing narrowed (mergeSchema:
    // the sink's pre-widen files lack the new column)
    runFeed(dir, out, ckpt)
    val resumed = spark.read.option("mergeSchema", "true").parquet(out)
    assert(resumed.columns.contains("tag"))
    assert(resumed.select($"_change_gen").as[Long].collect().toSet ===
      Set(1L, 2L))
    assert(resumed.filter($"id" === 4L).select($"tag")
      .as[String].collect().toSeq === Seq("x"))
  }
}
