package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.Multimodal
import graft.sources.CommittedTable

/** Streaming perceptual near-dup ingest: a stream of (media_id, payload)
  * rows fingerprints ONLY its own micro-batches, pairs each batch against
  * the accumulated fingerprint store (existing ∪ batch — the
  * [[Multimodal.phashPairsAgainstHashes]] contract, so per-batch pair
  * sets union to exactly the full-corpus set), appends the pairs to a
  * committed pairs table, and upserts the batch's fingerprints into the
  * committed store. The 100 TB crawl loop: each day's media decodes once,
  * pairs against years of corpus for the cost of hashing the day, and
  * both tables stay atomically-published committed tables a concurrent
  * reader can poll without ever seeing a mid-publish mix.
  *
  * Delivery semantics (the [[StreamingMerge]] argument, made exactly-once
  * here the same way): foreachBatch is at-least-once, but every write is
  * an IDEMPOTENT keyed merge —
  *   - pairs are keyed by `id_a:id_b` with a constant version, and a
  *     given pair is only ever emitted by the batch that introduces its
  *     LATER member (both sides' complete fingerprints are in
  *     existing ∪ new by then), so a replay re-derives the identical row
  *     and the merge keeps the existing one;
  *   - fingerprints are keyed by media id (frame hashes by
  *     `media_id:frame_no`), constant version, same argument.
  * Crash ordering is safe in both directions: pairs merge BEFORE store
  * merge, so a crash between them replays against a store without the
  * batch (same pairs re-derived); a crash after the store merge but
  * before the checkpoint commit replays against a store that already
  * contains the batch — the batch's own rows match only themselves there
  * (same media_id, excluded by id ≠ id) and duplicate candidates
  * collapse in the banded join's distinct, so the pair set is again
  * identical. MediaIngestSpec pins both replay directions by invoking
  * the batch body twice.
  *
  * Both tables hash-partition on `pmod(id, storeParts)` and upsert
  * MERGE-ON-READ (see [[upsert]]): a batch's ids hash across every
  * bucket, so the CoW route would rewrite the whole store per batch —
  * the MoR route stages each insert-only batch as pure delta segments,
  * O(batch rows) written at any store size (PerceptualBench's
  * `stream`/`streamaudio`/`streamvideo` modes measure fixed batches
  * flat through 16× store growth in all three modalities — BENCH_NOTES
  * r19/r20 — both committed merges included). */
object MediaIngest {

  /** Image ingest: [[Multimodal.perceptualHash]] per batch, pairs =
    * batch × (store ∪ batch) at `maxHamming`. Store rows:
    * (media_id, phash, bucket, version); pair rows:
    * (pair_key, id_a, id_b, hamming, bucket, version).
    *
    * PRECONDITION — new ids only: each micro-batch must carry media ids
    * the store has never seen (the crawl-ingest contract; replays of the
    * SAME batch are of course fine — that is what the constant-version
    * keyed merges make idempotent). Re-ingesting an ALREADY-STORED id
    * with a changed payload is silently ignored: the replayed key ties
    * on version and loses, so stale fingerprints and pair rows survive.
    * Changed payloads are an update flow — route them through a keyed
    * merge with a real version (e.g. [[StreamingMerge]]), not this
    * insert-only ingest.
    *
    * `compactEvery = n > 0` runs the store-maintenance pass (the
    * `CALL graft.optimize` body: compact fragmented / read-amplified
    * partitions) on BOTH tables after every n-th micro-batch, bounding
    * the MoR delta chain a long-running ingest accrues: a bucket's
    * live-file count (base + deltas) can exceed `compactMaxFiles` (the
    * `CALL graft.optimize` `max_files` knob) by at most one inter-pass
    * accrual, so the chain is provably ≤ compactMaxFiles + compactEvery
    * (MediaIngestSpec pins it at the tight compactMaxFiles = 1 point).
    * compactEvery = 0 (default) = external maintenance (the
    * spec-composed ad-hoc `CALL graft.optimize`).
    *
    * `kernel` picks the image fingerprint ([[Multimodal.hashKernel]]:
    * `ahash` default, `dct` for tone-edit robustness) and
    * `oriented = true` pairs at min-over-dihedral-orbit hamming (the
    * rotated re-upload; ahash only — the stored hashes stay PLAIN, the
    * orbit explode rides each batch, so flipping the flag needs no
    * store migration); a store and every batch ingested into it must
    * use ONE kernel — same for [[audioIngest]]'s `trimNoiseFloor`. */
  def phashIngest(media: DataFrame, storePath: String, pairsPath: String,
      checkpoint: String, maxHamming: Int = 7, bands: Int = 0,
      storeParts: Int = 16, availableNow: Boolean = true,
      interval: String = "30 seconds", compactEvery: Int = 0,
      compactMaxFiles: Int = 8,
      kernel: String = "ahash",
      oriented: Boolean = false): DataStreamWriter[Row] = {
    Multimodal.hashKernel(kernel) // fail fast before the stream starts
    if (oriented && kernel != "ahash")
      throw new IllegalArgumentException(
        "oriented pairing permutes aHash grid cells; kernel must be " +
          s"'ahash', got '$kernel'")
    writer(media, checkpoint, availableNow, interval, compactEvery,
      compactMaxFiles, Seq(storePath, pairsPath))(b =>
      applyPhashBatch(b, storePath, pairsPath, maxHamming, bands,
        storeParts, kernel = kernel, oriented = oriented))
  }

  /** Audio ingest: [[Multimodal.audioFingerprints]] per batch, same
    * shapes on the `ahash` column — and the same new-ids-only
    * precondition and `compactEvery` cadence as [[phashIngest]]. */
  def audioIngest(media: DataFrame, storePath: String, pairsPath: String,
      checkpoint: String, maxHamming: Int = 7, bands: Int = 0,
      storeParts: Int = 16, availableNow: Boolean = true,
      interval: String = "30 seconds", compactEvery: Int = 0,
      compactMaxFiles: Int = 8,
      trimNoiseFloor: Int = -1): DataStreamWriter[Row] =
    writer(media, checkpoint, availableNow, interval, compactEvery,
      compactMaxFiles, Seq(storePath, pairsPath))(b =>
      applyAudioBatch(b, storePath, pairsPath, maxHamming, bands,
        storeParts, trimNoiseFloor = trimNoiseFloor))

  /** Video ingest: [[Multimodal.videoFrameHashes]] per batch (frame
    * granularity, keyed `media_id:frame_no` in the store), pairs =
    * videos sharing >= `minSharedFrames` matched frames — same
    * new-ids-only precondition and `compactEvery` cadence as
    * [[phashIngest]]. */
  def videoIngest(media: DataFrame, storePath: String, pairsPath: String,
      checkpoint: String, everyNth: Int = 4, maxHamming: Int = 7,
      minSharedFrames: Int = 2, bands: Int = 0, storeParts: Int = 16,
      availableNow: Boolean = true,
      interval: String = "30 seconds", compactEvery: Int = 0,
      compactMaxFiles: Int = 8,
      kernel: String = "ahash"): DataStreamWriter[Row] = {
    Multimodal.hashKernel(kernel) // fail fast before the stream starts
    writer(media, checkpoint, availableNow, interval, compactEvery,
      compactMaxFiles, Seq(storePath, pairsPath))(b =>
      applyVideoBatch(b, storePath, pairsPath, everyNth, maxHamming,
        minSharedFrames, bands, storeParts, kernel = kernel))
  }

  private def writer(media: DataFrame, checkpoint: String,
      availableNow: Boolean, interval: String, compactEvery: Int,
      compactMaxFiles: Int, maintainPaths: Seq[String])(
      apply: DataFrame => Unit): DataStreamWriter[Row] = {
    val trigger =
      if (availableNow) Trigger.AvailableNow()
      else Trigger.ProcessingTime(interval)
    media.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          if (!batch.isEmpty) apply(batch)
          // maintenance rides the batch callback AFTER the merges: a
          // replayed batch re-runs it harmlessly (compaction is
          // content-idempotent), and the fence-retry route absorbs any
          // race with an external optimize
          if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
            maintainPaths.foreach(p =>
              maintain(batch.sparkSession, p, compactMaxFiles))
        } finally batch.unpersist()
      }
  }

  /** The in-stream maintenance pass — the `CALL graft.optimize` body on
    * one table: compact partitions fragmented past `maxFiles` live
    * files or read-amplified past the default dead ratio. No-op before
    * the table's first publish. */
  private[graft] def maintain(spark: SparkSession, path: String,
      maxFiles: Int = 8): Unit =
    if (exists(spark, path)) {
      val targets = (CommittedTable.fragmentedPartitions(spark, path,
        maxFiles = maxFiles) ++
        CommittedTable.readAmplifiedPartitions(spark, path,
          maxDeadRatio = 0.5)).distinct.sorted
      if (targets.nonEmpty)
        CommittedTable.compactPartitions(spark, path, targets)
    }

  private[graft] def applyPhashBatch(batch: DataFrame,
      storePath: String, pairsPath: String, maxHamming: Int, bands: Int,
      storeParts: Int, crashPoint: String => Unit = _ => (),
      kernel: String = "ahash", oriented: Boolean = false): Unit = {
    val hashed = Multimodal.perceptualHash(batch, kernel)
      .filter(col("phash").isNotNull)
    mediaLevelBatch(hashed, "phash", storePath, pairsPath, storeParts,
      crashPoint)(
      (nh, ex) =>
        if (oriented) Multimodal.phashPairsOrientedAgainstHashes(nh, ex,
          maxHamming, bands)
        else Multimodal.phashPairsAgainstHashes(nh, ex, maxHamming,
          bands))
  }

  private[graft] def applyAudioBatch(batch: DataFrame,
      storePath: String, pairsPath: String, maxHamming: Int, bands: Int,
      storeParts: Int, crashPoint: String => Unit = _ => (),
      trimNoiseFloor: Int = -1): Unit = {
    val hashed = Multimodal.audioFingerprints(batch, trimNoiseFloor)
      .filter(col("ahash").isNotNull)
    mediaLevelBatch(hashed, "ahash", storePath, pairsPath, storeParts,
      crashPoint)(
      (nh, ex) => Multimodal.audioPairsAgainstHashes(nh, ex, maxHamming,
        bands))
  }

  /** Shared media-level (one hash per item) batch body: pairs first,
    * then the store upsert — see the crash-ordering argument above.
    * `crashPoint` is [[StreamingMerge.mergeWithRetry]]'s test seam,
    * fired at `"between-merges"` after the pairs merge and before the
    * store merge so specs can kill THAT exact ordering and prove the
    * replay converges. */
  private def mediaLevelBatch(hashed: DataFrame, hashCol: String,
      storePath: String, pairsPath: String, storeParts: Int,
      crashPoint: String => Unit)(
      pairsAgainst: (DataFrame, DataFrame) => DataFrame): Unit = {
    val spark = hashed.sparkSession
    val h = hashed.persist()
    try {
      if (h.isEmpty) return
      val existing = readStore(spark, storePath,
        Seq(("media_id", "bigint"), (hashCol, "bigint")))
      val pairs = pairsAgainst(h.select("media_id", hashCol), existing)
      upsert(spark, pairsPath, keyedPairs(pairs, storeParts), "pair_key")
      crashPoint("between-merges")
      upsert(spark, storePath,
        h.select("media_id", hashCol)
          .withColumn("bucket", bucketOf(col("media_id"), storeParts))
          .withColumn("version", lit(1L)),
        "media_id")
    } finally { h.unpersist(); () }
  }

  private[graft] def applyVideoBatch(batch: DataFrame,
      storePath: String, pairsPath: String, everyNth: Int,
      maxHamming: Int, minSharedFrames: Int, bands: Int,
      storeParts: Int, crashPoint: String => Unit = _ => (),
      kernel: String = "ahash"): Unit = {
    val spark = batch.sparkSession
    val hashed = Multimodal.videoFrameHashes(batch, everyNth, kernel)
      .persist()
    try {
      if (hashed.isEmpty) return
      val existing = readStore(spark, storePath,
        Seq(("media_id", "bigint"), ("frame_no", "int"),
          ("fhash", "bigint")))
      val pairs = Multimodal.videoPairsAgainstHashes(hashed, existing,
        maxHamming, minSharedFrames, bands)
      upsert(spark, pairsPath, keyedPairs(pairs, storeParts), "pair_key")
      crashPoint("between-merges")
      upsert(spark, storePath,
        hashed
          .withColumn("fkey",
            concat_ws(":", col("media_id"), col("frame_no")))
          .withColumn("bucket", bucketOf(col("media_id"), storeParts))
          .withColumn("version", lit(1L)),
        "fkey")
    } finally { hashed.unpersist(); () }
  }

  private def bucketOf(id: org.apache.spark.sql.Column, storeParts: Int) =
    pmod(id, lit(storeParts.toLong)).cast("string")

  private def keyedPairs(pairs: DataFrame, storeParts: Int): DataFrame =
    pairs
      .withColumn("pair_key", concat_ws(":", col("id_a"), col("id_b")))
      .withColumn("bucket", bucketOf(col("id_a"), storeParts))
      .withColumn("version", lit(1L))

  /** The store's current fingerprints; a typed EMPTY frame before the
    * first publish (the first batch pairs only within itself). */
  private def readStore(spark: SparkSession, path: String,
      cols: Seq[(String, String)]): DataFrame =
    if (exists(spark, path))
      CommittedTable.read(spark, path)
        .select(cols.map(c => col(c._1)): _*)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType
          .fromDDL(cols.map(c => s"${c._1} ${c._2}").mkString(", ")))

  private def exists(spark: SparkSession, path: String): Boolean = {
    val t = new org.apache.hadoop.fs.Path(path)
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    CommittedTable.readManifestRoot(fs, t).isDefined
  }

  /** First batch creates the table (keyed, bucket-partitioned); later
    * batches keyed-merge — latest-version-wins with a CONSTANT version,
    * so replays keep the existing rows (idempotent). Empty frames write
    * nothing (and create nothing — readers treat an absent table as
    * empty, exactly like [[readStore]]). The merge goes through
    * [[StreamingMerge.mergeWithRetry]]: an ad-hoc maintenance publish
    * on the store (a `CALL graft.optimize`, a compaction) racing the
    * micro-batch costs one fence loss + an idempotent re-apply on top
    * of the winner, not the stream.
    *
    * MERGE-ON-READ, deliberately: a micro-batch's ids hash across every
    * bucket, so a copy-on-write merge would rewrite the WHOLE store
    * every batch — O(corpus) per day of ingest. These batches are
    * insert-only (media ids and pair keys are new), so the MoR route
    * stages them as pure delta segments: O(batch rows) written per
    * publish at any store size, with the accrued fragmentation absorbed
    * by the ordinary `CALL graft.optimize` maintenance pass the spec
    * composes in-stream. */
  private def upsert(spark: SparkSession, path: String, df: DataFrame,
      key: String): Unit = {
    // persisted: the emptiness probe and the merge's own jobs must not
    // re-run the banded join that produced the frame
    val d = df.persist()
    try {
      if (d.isEmpty) return
      if (exists(spark, path))
        StreamingMerge.mergeWithRetry(d, path, key, "version", "bucket",
          maxMergeRetries = 3, mor = true)
      else
        CommittedTable.write(d, path, "bucket", keyCol = Some(key),
          versionCol = Some("version"))
    } finally { d.unpersist(); () }
  }
}
