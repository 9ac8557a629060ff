package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.MediaFixture
import graft.operators.Multimodal

/** One-off measurement main for the perceptual near-dup family
  * (BENCH_NOTES r19 evidence): generates a synthetic media corpus
  * MAP-SIDE at a given size (payload construction in executor tasks —
  * the driver never holds a corpus), then times each phase separately:
  *
  *   1. the hash pass (decode → fingerprint, the linear map-side cost),
  *   2. the band-bucket histogram (max + p99 bucket size and the exact
  *      candidate-pair count Σ|bucket|·(|bucket|−1)/2 per band — the
  *      sole driver of the pair join's cost, reported so bucket skew is
  *      EVIDENCE rather than assumption),
  *   3. the banded pair join itself (from the fingerprint table only).
  *
  * Corpus shape: ids are split-mixed into effectively random 64-bit
  * patterns (worst case for banding — real corpora cluster, random
  * hashes spread mass evenly across buckets); every 10th id is a
  * 3-bit-flipped twin of its predecessor, so ~n/10 true pairs exist at
  * maxHamming 7 (and ≥ n/10 survive at maxHamming 3 with wider bands).
  * Patterns paint EXACT hashes ([[MediaFixture.patternPng]] /
  * [[MediaFixture.wavStaircase]]), so pair counts are verifiable.
  *
  * The `stream` / `streamaudio` / `streamvideo` modes measure the
  * [[graft.streaming.MediaIngest]] batch body instead (decode + pair +
  * both committed MERGE-ON-READ merges) at a FIXED batch size against a
  * store of n items — the flat-per-day claim, end to end per modality.
  *
  * Usage: runMain graft.tools.PerceptualBench
  *          <image|audio|video|incr|oriented|stream|streamaudio|streamvideo>
  *          <n1[,n2,…]> [maxHamming] [bands] [kernel]
  *
  * `kernel` (image mode only): ahash (default) | dct — times the DCT
  * hash pass against the same corpus and banding.
  */
object PerceptualBench {
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def clamp(base: Long): Long = {
    val k = java.lang.Long.bitCount(base)
    if (k == 0) 1L else if (k == 64) base & ~1L else base
  }

  /** Random-looking pattern with 1..63 set bits; every (10k+1)th id is
    * its predecessor's 3-bit twin. */
  private def pat(i: Long): Long =
    clamp(if (i % 10 == 1) clamp(mix(i - 1)) ^ 0x7L else mix(i))

  /** Video frame pattern: every (10k+1)th VIDEO shares its first two
    * frames with its predecessor as 3-bit twins (the re-encoded-clip
    * case — pairs need minSharedFrames = 2), other frames fresh. */
  private def vpat(i: Long, f: Int): Long =
    clamp(
      if (i % 10 == 1 && f < 2) clamp(mix((i - 1) * 4 + f)) ^ 0x7L
      else mix(i * 4 + f))

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("image")
    val sizes = args.lift(1).getOrElse("2500,10000").split(",").map(_.toInt)
    val maxHamming = args.lift(2).map(_.toInt).getOrElse(7)
    val bands = args.lift(3).map(_.toInt).getOrElse(0)
    val kernel = args.lift(4).getOrElse("ahash")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val b = if (bands > 0) bands else maxHamming + 1

    def mediaDf(n: Int, make: Long => Array[Byte]): DataFrame =
      spark.range(n).repartition(32).map { i =>
        (i, make(i))
      }.toDF("media_id", "payload")

    def bucketStats(hashes: DataFrame, hashCol: String): (Long, Long, Long) = {
      val slices = (0 until b).map { i =>
        val lo = i * 64 / b
        val width = (i + 1) * 64 / b - lo
        val mask = if (width >= 64) -1L else (1L << width) - 1L
        struct(lit(i).as("band_no"),
          shiftrightunsigned(col(hashCol), lo).bitwiseAND(lit(mask)).as("bits"))
      }
      val buckets = hashes
        .select(explode(array(slices: _*)).as("bd"))
        .groupBy(col("bd.band_no"), col("bd.bits")).count()
      val agg = buckets.agg(
        max("count").as("max"),
        expr("approx_percentile(count, 0.99)").as("p99"),
        expr("CAST(SUM(count * (count - 1) / 2) AS BIGINT)").as("cand"))
        .collect().head
      (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    }

    def report(n: Int, hashSec: Double, hashes: DataFrame, hashCol: String,
        pairJoin: => Long): Unit = {
      val ((mx, p99, cand), histSec) = time(bucketStats(hashes, hashCol))
      val (pairs, joinSec) = time(pairJoin)
      println(s"""{"mode":"$mode","n":$n,"maxHamming":$maxHamming,""" +
        s""""bands":$b,"hash_sec":${f"$hashSec%.2f"},""" +
        s""""hist_sec":${f"$histSec%.2f"},"join_sec":${f"$joinSec%.2f"},""" +
        s""""max_bucket":$mx,"p99_bucket":$p99,"candidates":$cand,""" +
        s""""pairs":$pairs}""")
    }

    sizes.foreach { n =>
      mode match {
        case "image" =>
          val media = mediaDf(n, i => MediaFixture.patternPng(pat(i)))
          val (hashes, hashSec) = time {
            val h = Multimodal.perceptualHash(media, kernel)
              .filter($"phash".isNotNull).cache()
            h.count(); h
          }
          report(n, hashSec, hashes, "phash",
            Multimodal.phashNearDupsFromHashes(hashes, maxHamming, bands)
              .count())
          hashes.unpersist()
        case "oriented" =>
          // the dihedral-orbit join on the same corpus: the <=8x-rows
          // claim measured — hash pass identical to image mode, the
          // oriented join's cost vs the plain join's on equal banding
          val media = mediaDf(n, i => MediaFixture.patternPng(pat(i)))
          val (hashes, hashSec) = time {
            val h = Multimodal.perceptualHash(media)
              .filter($"phash".isNotNull).cache()
            h.count(); h
          }
          val (plainPairs, plainSec) = time(
            Multimodal.phashNearDupsFromHashes(hashes, maxHamming, bands)
              .count())
          val (orPairs, orSec) = time(
            Multimodal.phashNearDupsOrientedFromHashes(hashes, maxHamming,
              bands).count())
          println(s"""{"mode":"oriented","n":$n,"maxHamming":$maxHamming,""" +
            s""""bands":$b,"hash_sec":${f"$hashSec%.2f"},""" +
            s""""plain_join_sec":${f"$plainSec%.2f"},""" +
            s""""oriented_join_sec":${f"$orSec%.2f"},""" +
            s""""plain_pairs":$plainPairs,"oriented_pairs":$orPairs}""")
          hashes.unpersist()
        case "audio" =>
          val media = mediaDf(n, i => MediaFixture.wavStaircase(pat(i)))
          val (hashes, hashSec) = time {
            val h = Multimodal.audioFingerprints(media)
              .filter($"ahash".isNotNull).cache()
            h.count(); h
          }
          report(n, hashSec, hashes, "ahash",
            Multimodal.audioNearDupsFromHashes(hashes, maxHamming, bands)
              .count())
          hashes.unpersist()
        case "video" =>
          // 4 frames per video: twins share their predecessor's frame
          // patterns bit-perturbed, so video pairs need >= 2 matched frames
          val media = mediaDf(n, i => MediaFixture.mjpegMp4(
            (0 until 4).map(f => MediaFixture.patternJpeg(vpat(i, f))),
            30, 3))
          val (hashes, hashSec) = time {
            val h = Multimodal.videoFrameHashes(media, everyNth = 1).cache()
            h.count(); h
          }
          report(n, hashSec, hashes, "fhash",
            Multimodal.videoNearDupsFromHashes(hashes, maxHamming,
              minSharedFrames = 2, bands = bands).count())
          hashes.unpersist()
        case "incr" =>
          // the 100 TB deployment shape: a 10% batch pairs against a
          // 90% stored fingerprint table — only the batch decodes
          val cut = (n * 9L) / 10
          val stored = Multimodal.perceptualHash(
              mediaDf(n, i => MediaFixture.patternPng(pat(i)))
                .filter($"media_id" < cut))
            .filter($"phash".isNotNull).cache()
          stored.count()
          val batchMedia = mediaDf(n, i => MediaFixture.patternPng(pat(i)))
            .filter($"media_id" >= cut)
          val (hashes, hashSec) = time {
            val h = Multimodal.perceptualHash(batchMedia)
              .filter($"phash".isNotNull).cache()
            h.count(); h
          }
          report(n, hashSec, hashes, "phash",
            Multimodal.phashPairsAgainstHashes(hashes, stored, maxHamming,
              bands).count())
          hashes.unpersist(); stored.unpersist()
        case "stream" | "streamaudio" | "streamvideo" =>
          // the MediaIngest batch body (hash + pair + MoR keyed merges)
          // at a FIXED batch against a store of n items — the
          // flat-per-day claim measured end to end per modality, merges
          // included. Video uses a smaller batch (4 frames decode+hash
          // per item) so all three modes run in comparable wall time.
          val batchN = if (mode == "streamvideo") 250 else 1000
          val root = java.nio.file.Files
            .createTempDirectory(s"graft-pb-$mode-$n").toString
          val store = s"$root/store"; val prs = s"$root/pairs"
          def ingest(df: DataFrame): Unit = mode match {
            case "stream" => graft.streaming.MediaIngest
              .applyPhashBatch(df, store, prs, maxHamming, b, 16)
            case "streamaudio" => graft.streaming.MediaIngest
              .applyAudioBatch(df, store, prs, maxHamming, b, 16)
            case _ => graft.streaming.MediaIngest.applyVideoBatch(
              df, store, prs, 1, maxHamming, 2, b, 16)
          }
          def make(i: Long): Array[Byte] = mode match {
            case "stream" => MediaFixture.patternPng(pat(i))
            case "streamaudio" => MediaFixture.wavStaircase(pat(i))
            case _ => MediaFixture.mjpegMp4(
              (0 until 4).map(f => MediaFixture.patternJpeg(vpat(i, f))),
              30, 3)
          }
          ingest(mediaDf(n, make))
          val batch = spark.range(n, n + batchN.toLong).repartition(32)
            .map(i => (i, make(i)))
            .toDF("media_id", "payload")
          val (_, batchSec) = time(ingest(batch))
          val storeRows = graft.sources.CommittedTable
            .count(spark, store)
          println(s"""{"mode":"$mode","store_n":$n,"batch_n":$batchN,""" +
            s""""maxHamming":$maxHamming,"bands":$b,""" +
            s""""batch_sec":${f"$batchSec%.2f"},"store_rows":$storeRows}""")
        case other => sys.error(s"unknown mode $other")
      }
    }
    spark.stop()
  }
}
