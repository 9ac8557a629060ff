package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.fixtures.MediaFixture
import graft.operators.Multimodal
import graft.sources.CommittedTable

/** [[MediaIngest]] — streaming perceptual near-dup ingest: per-batch
  * pair sets union to the full-corpus set, the store accumulates
  * fingerprints without ever re-decoding a payload, both tables are
  * committed (atomic generations per micro-batch), and replayed batches
  * (at-least-once foreachBatch) converge — in BOTH crash orderings. */
class MediaIngestSpec extends SparkSpec {
  import spark.implicits._

  private def pairsOf(path: String): Set[(Long, Long)] =
    if (!Files.exists(java.nio.file.Paths.get(path, "_commit"))) Set.empty
    else CommittedTable.read(spark, path)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet

  private def drop(in: String, name: String,
      df: org.apache.spark.sql.DataFrame): Unit =
    df.coalesce(1).write.parquet(s"$in/$name")

  test("streamed image ingest: per-batch unions == full corpus; store accumulates; restart is exactly-once") {
    val root = Files.createTempDirectory("graft-mingest").toString
    val in = s"$root/in"; val cp = s"$root/cp"
    val store = s"$root/store"; val pairs = s"$root/pairs"
    val frame = MediaFixture.phashFrame(spark)
      .select($"media_id", $"payload")
    val expected = Multimodal
      .phashNearDups(MediaFixture.phashFrame(spark), maxHamming = 7)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    drop(in, "b1", frame.filter($"media_id".isin(41L, 44L)))
    val schema = spark.read.parquet(s"$in/b1").schema
    def runOnce(): Unit = {
      val media = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "16").parquet(s"$in/*")
      val q = MediaIngest.phashIngest(media, store, pairs, cp,
        maxHamming = 7).start()
      q.awaitTermination(120000); q.stop()
    }
    runOnce()
    // batch 1 (41, 44) holds no near pair; its fingerprints are stored
    assert(pairsOf(pairs) === Set.empty)
    assert(CommittedTable.read(spark, store).count() === 2L)
    // batch 2 after a RESTART from the same checkpoint: pairs against
    // the store complete the full-corpus set; 41/44 never re-decode
    drop(in, "b2", frame.filter($"media_id".isin(42L, 43L, 45L)))
    runOnce()
    assert(pairsOf(pairs) === expected)
    assert(CommittedTable.read(spark, store).count() === 4L) // 45 is audio: NULL, never stored
    // a third run with nothing new is a no-op
    runOnce()
    assert(pairsOf(pairs) === expected)
    assert(CommittedTable.read(spark, store).count() === 4L)
  }

  test("composition: CALL graft.phash_neardups(existing => <streaming store>) consumes the ingest's committed table") {
    val root = Files.createTempDirectory("graft-mingest-call").toString
    val store = s"$root/store"; val pairs = s"$root/pairs"
    val frame = MediaFixture.phashFrame(spark)
      .select($"media_id", $"payload")
    // the stream ingested 41 and 44; an ad-hoc batch arrives through the
    // SQL verb and pairs against the stream's committed store directly
    // (readAny resolves committed tables and plain parquet alike)
    MediaIngest.applyPhashBatch(frame.filter($"media_id".isin(41L, 44L)),
      store, pairs, 7, 0, 16)
    frame.filter($"media_id".isin(42L, 43L, 45L))
      .write.parquet(s"$root/batch")
    spark.sql(s"CALL graft.phash_neardups(input => '$root/batch', " +
      s"existing => '$store', output => '$root/adhoc')")
    val expected = Multimodal
      .phashNearDups(MediaFixture.phashFrame(spark), maxHamming = 7)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(spark.read.parquet(s"$root/adhoc")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet ===
      expected) // batch 1 alone had no pairs, so ad-hoc == full corpus
  }

  test("replay convergence: the batch body is idempotent in both crash orderings") {
    val root = Files.createTempDirectory("graft-mingest-rp").toString
    val store = s"$root/store"; val pairs = s"$root/pairs"
    val frame = MediaFixture.phashFrame(spark)
      .select($"media_id", $"payload")
    val b1 = frame.filter($"media_id".isin(41L, 44L))
    val b2 = frame.filter($"media_id".isin(42L, 43L, 45L))
    val expected = Multimodal
      .phashNearDups(MediaFixture.phashFrame(spark), maxHamming = 7)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // storeParts = 2 so batch 2's buckets already exist after batch 1
    // (41→1, 44→0; 42→0, 43→1): the store merge must then route
    // MERGE-ON-READ — base segments untouched + live deltas present,
    // the same falsifiable manifest predicate the q175 gates use. (Ids
    // landing in BRAND-NEW buckets correctly become fresh base
    // segments instead — nothing existed to rewrite.)
    MediaIngest.applyPhashBatch(b1, store, pairs, 7, 0, 2)
    val beforeB2 = CommittedTable.manifestAt(spark, store).segments
    MediaIngest.applyPhashBatch(b2, store, pairs, 7, 0, 2)
    assert(graft.queries.SqlSurface.morWitness(spark, store, beforeB2),
      "the streaming store upsert must stage deltas, not rewrite buckets")
    val storeGen = CommittedTable.manifestAt(spark, store).gen
    assert(pairsOf(pairs) === expected)
    // crash AFTER the store merge, BEFORE the checkpoint commit: the
    // replayed batch pairs against a store that already contains it —
    // its rows match only themselves there (id != id excludes them) and
    // the keyed merges keep the existing rows
    MediaIngest.applyPhashBatch(b2, store, pairs, 7, 0, 2)
    assert(pairsOf(pairs) === expected)
    assert(CommittedTable.read(spark, store).count() === 4L)
    // the replays burned generations but changed no content
    assert(CommittedTable.read(spark, store)
      .select($"media_id").as[Long].collect().toSet ===
      Set(41L, 42L, 43L, 44L))
    assert(CommittedTable.manifestAt(spark, store).gen >= storeGen)
  }

  test("streamed video ingest: frame-level store, pair completed by the batch introducing the later clip") {
    val root = Files.createTempDirectory("graft-vingest").toString
    val store = s"$root/store"; val pairs = s"$root/pairs"
    val frame = MediaFixture.videoNearDupFrame(spark)
      .select($"media_id", $"payload")
    // batch 1: videos 51, 53 — no pair, 6 frame hashes stored
    MediaIngest.applyVideoBatch(frame.filter($"media_id".isin(51L, 53L)),
      store, pairs, 1, 7, 2, 0, 16)
    assert(pairsOf(pairs) === Set.empty)
    assert(CommittedTable.read(spark, store).count() === 6L)
    // ad-hoc maintenance between batches (the deployment reality the
    // fence-retry route exists for): the store stays a normal committed
    // table, so optimize composes with the stream
    spark.sql(s"CALL graft.optimize(table => '$store', max_files => 1)")
    // batch 2: video 52 shares two of 51's frames; 54 is undecodable
    MediaIngest.applyVideoBatch(frame.filter($"media_id".isin(52L, 54L)),
      store, pairs, 1, 7, 2, 0, 16)
    assert(CommittedTable.read(spark, pairs)
      .select($"id_a", $"id_b", $"n_shared")
      .as[(Long, Long, Long)].collect().toSet === Set((51L, 52L, 2L)))
    assert(CommittedTable.read(spark, store).count() === 10L)
    // replay of batch 2 converges
    MediaIngest.applyVideoBatch(frame.filter($"media_id".isin(52L, 54L)),
      store, pairs, 1, 7, 2, 0, 16)
    assert(CommittedTable.read(spark, pairs).count() === 1L)
    assert(CommittedTable.read(spark, store).count() === 10L)
  }

  test("crash-point seam: a kill BETWEEN the pairs merge and the store merge converges on replay") {
    val root = Files.createTempDirectory("graft-mingest-seam").toString
    val frame = MediaFixture.phashFrame(spark)
      .select($"media_id", $"payload")
    val b1 = frame.filter($"media_id".isin(41L, 44L))
    val b2 = frame.filter($"media_id".isin(42L, 43L, 45L))
    // twin A: the clean run
    val cleanStore = s"$root/cs"; val cleanPairs = s"$root/cp"
    MediaIngest.applyPhashBatch(b1, cleanStore, cleanPairs, 7, 0, 2)
    MediaIngest.applyPhashBatch(b2, cleanStore, cleanPairs, 7, 0, 2)
    // twin B: batch 2 dies at the exact seam — pairs merged, store NOT
    val store = s"$root/store"; val pairs = s"$root/pairs"
    MediaIngest.applyPhashBatch(b1, store, pairs, 7, 0, 2)
    final class Kill extends RuntimeException("crash at seam")
    intercept[Kill] {
      MediaIngest.applyPhashBatch(b2, store, pairs, 7, 0, 2,
        crashPoint = p => if (p == "between-merges") throw new Kill)
    }
    // the half-applied state is exactly as argued: the pairs table has
    // batch 2's pairs, the store still lacks batch 2's fingerprints
    assert(pairsOf(pairs) === pairsOf(cleanPairs))
    assert(CommittedTable.read(spark, store).count() === 2L)
    // the replay (foreachBatch is at-least-once) pairs against a store
    // WITHOUT the batch — re-deriving identical pair rows that tie on
    // (key, version) — then completes the store merge: both tables
    // converge on the clean twin's content
    MediaIngest.applyPhashBatch(b2, store, pairs, 7, 0, 2)
    assert(pairsOf(pairs) === pairsOf(cleanPairs))
    assert(CommittedTable.read(spark, store)
      .select($"media_id", $"phash").as[(Long, Long)].collect().toSet ===
      CommittedTable.read(spark, cleanStore)
        .select($"media_id", $"phash").as[(Long, Long)].collect().toSet)
  }

  test("compactEvery bounds the delta chain across 3x the hook interval") {
    val root = Files.createTempDirectory("graft-mingest-cad").toString
    val in = s"$root/in"; val cp = s"$root/cp"
    val store = s"$root/store"; val pairs = s"$root/pairs"
    // six one-image batches into a ONE-bucket store: every batch after
    // the first stages a delta segment on the same bucket, so without
    // maintenance the chain grows one delta per batch
    val rasters = (0 until 6).map(i =>
      MediaFixture.patternPng(1L << (i * 9 + 1) | 1L << (i * 7 + 3)))
    def maxDeltaChain(): Int = {
      val m = CommittedTable.manifestAt(spark, store)
      if (m.segments.isEmpty) 0
      else m.segments.keysIterator
        .map(p => CommittedTable.liveDeltas(m, p).size).max
    }
    var schema: org.apache.spark.sql.types.StructType = null
    (0 until 6).foreach { i =>
      val df = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(Seq(
            org.apache.spark.sql.Row(100L + i, rasters(i)))).asJava),
        org.apache.spark.sql.types.StructType.fromDDL(
          "media_id bigint, payload binary"))
      df.coalesce(1).write.parquet(s"$in/b$i")
      if (schema == null) schema = spark.read.parquet(s"$in/b$i").schema
      val media = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$in/*")
      // compactEvery = 2: batches 1, 3, 5 (0-based) end with a pass;
      // compactMaxFiles = 1 is the tight point — any base + delta pair
      // (2 live files) is already past the threshold, so every pass
      // folds the bucket back to one base segment
      val q = MediaIngest.phashIngest(media, store, pairs, cp,
        maxHamming = 7, storeParts = 1, compactEvery = 2,
        compactMaxFiles = 1).start()
      q.awaitTermination(120000); q.stop()
      // the provable bound: at most compactEvery deltas accrue between
      // passes, and a pass folds its targets to zero — the chain never
      // exceeds the interval no matter how long the stream runs
      assert(maxDeltaChain() <= 2,
        s"after batch $i the delta chain is ${maxDeltaChain()}")
    }
    // all six fingerprints are present and correct despite the rewrites
    assert(CommittedTable.read(spark, store).count() === 6L)
  }

  test("oriented ingest: the rotated re-upload pairs against the PLAIN store batches later") {
    val root = Files.createTempDirectory("graft-mingest-or").toString
    val store = s"$root/store"; val pairs = s"$root/pairs"
    val frame = MediaFixture.orientedFrame(spark)
      .select($"media_id", $"payload")
    // batch 1 stores the original (141) and the far image (144) —
    // plain hashes, no orbit in the store
    MediaIngest.applyPhashBatch(frame.filter($"media_id".isin(141L, 144L)),
      store, pairs, 7, 0, 16, oriented = true)
    assert(pairsOf(pairs) === Set.empty)
    // batch 2 brings the rot-90 copy (142), the mirrored perturbation
    // (143), and the audio decoy: the orbit explode rides the BATCH,
    // so 142 pairs with the stored 141 without any store migration,
    // and 142/143 pair within the batch
    MediaIngest.applyPhashBatch(
      frame.filter($"media_id".isin(142L, 143L, 145L)),
      store, pairs, 7, 0, 16, oriented = true)
    assert(pairsOf(pairs) ===
      Set((141L, 142L), (141L, 143L), (142L, 143L)))
    // replay converges (the keyed-merge argument is orientation-blind)
    MediaIngest.applyPhashBatch(
      frame.filter($"media_id".isin(142L, 143L, 145L)),
      store, pairs, 7, 0, 16, oriented = true)
    assert(pairsOf(pairs) ===
      Set((141L, 142L), (141L, 143L), (142L, 143L)))
    assert(CommittedTable.read(spark, store).count() === 4L)
    // the meaningless dct composition is rejected before the stream
    frame.coalesce(1).write.parquet(s"$root/in")
    val schema = spark.read.parquet(s"$root/in").schema
    intercept[IllegalArgumentException] {
      MediaIngest.phashIngest(
        spark.readStream.schema(schema).parquet(s"$root/in"),
        store, pairs, s"$root/cp", kernel = "dct", oriented = true)
    }
  }

  test("streamed audio ingest: the literal staircase corpus through the audio path") {
    val root = Files.createTempDirectory("graft-aingest").toString
    val store = s"$root/store"; val pairs = s"$root/pairs"
    val frame = MediaFixture.audioLiteralFrame(spark)
      .select($"media_id", $"payload")
    MediaIngest.applyAudioBatch(frame.filter($"media_id".isin(71L, 73L)),
      store, pairs, 7, 0, 16)
    MediaIngest.applyAudioBatch(frame.filter($"media_id".isin(72L, 74L)),
      store, pairs, 7, 0, 16)
    assert(CommittedTable.read(spark, pairs)
      .select($"id_a", $"id_b", $"hamming")
      .as[(Long, Long, Int)].collect().toSet === Set((71L, 72L, 2)))
    assert(CommittedTable.read(spark, store).count() === 3L) // 74 is an image
  }
}
