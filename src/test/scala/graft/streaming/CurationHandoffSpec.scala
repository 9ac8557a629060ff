package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Curation, Dedup, TextAnalysis}

/** The streaming→batch handoff DocStream's scaladoc promises: the stream
  * dedups exactly WITHIN its watermark and delegates historical near-dup
  * detection to the batch incremental path (minhashCandidatesAgainst over
  * the stored signature table). This spec runs the whole contract: N file
  * drops stream into the warehouse, each batch's survivors dedup
  * incrementally against the accumulated signatures, and the final corpus
  * must equal what the from-scratch batch `Curation.run` produces over the
  * union of all drops — same survivors, same transitive canonical
  * attribution, no doc ever re-hashed after its ingest batch. */
class CurationHandoffSpec extends SparkSpec {
  import spark.implicits._

  test("streamed ingest + per-batch incremental dedup == from-scratch Curation.run") {
    val landing = Files.createTempDirectory("graft-handoff-landing").toString
    val wh = Files.createTempDirectory("graft-handoff-wh").toString + "/docs"
    val ckpt = Files.createTempDirectory("graft-handoff-ckpt").toString

    // Three drops, ids increasing by drop (streaming first-arrival keeps
    // the same survivor batch dedup's lowest-id rule does). Drop 2 plants
    // an exact dup (11≡1) and a near dup of 1; drop 3 extends it into a
    // CHAIN: 21 is a near dup of 12 but NOT of 1 at threshold 0.6 — the
    // incremental path must still attribute 21 to canonical 1 transitively.
    val base = "the quick brown fox jumps over the lazy dog"
    val drops: Seq[Seq[(Long, String)]] = Seq(
      Seq((1L, base),
        (2L, "columnar formats amortize io across wide analytical scans"),
        (3L, "sbt compiles scala sources into jars for the jvm runtime")),
      Seq((11L, base),                                              // exact dup of 1
        (12L, "the quick brown fox jumps over the lazy cat"),       // near dup of 1
        (13L, "watermarks bound state for long running streams")),
      Seq((21L, "a quick brown fox jumps over the lazy cat"),       // near dup of 12 only
        (22L, "completely novel content about query planners today")))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))

    val stream = DocStream.curate(DocStream.read(spark, landing, schema))
    val q = DocStream.toWarehouse(stream, wh, ckpt).start()
    try {
      // stored signature table starts empty and accumulates per batch —
      // the corpus is never re-hashed after its own ingest batch
      // 6 bands × 1 row (vs the 3×2 default): with a planted chain at
      // J=0.75/0.846 the single-row bands make a candidate miss
      // ((1-J)^6 ≈ 2e-4) deterministically implausible, and BOTH paths
      // (incremental and from-scratch) band identically
      val (nBands, nRows) = (6, 1)
      var storedSigs: DataFrame = Dedup.signatureTable(
        Seq.empty[(Long, String)].toDF("doc_id", "text"), "text", "doc_id",
        bands = nBands, rows = nRows)
      var verified: DataFrame =
        Seq.empty[(Long, Long, Double)].toDF("doc_a", "doc_b", "jaccard")
      var seenMax = 0L
      drops.foreach { drop =>
        drop.toDF("doc_id", "text").repartition(1)
          .write.mode("append").parquet(landing)
        q.processAllAvailable()
        // this batch's stream SURVIVORS (exact dups already dropped by the
        // watermark state) are the only docs hashed this round
        val whNow = spark.read.parquet(wh).select($"doc_id", $"text")
        val newBatch = whNow.filter($"doc_id" > seenMax)
        seenMax = drop.map(_._1).max
        val cands = Dedup.minhashCandidatesAgainst(
          newBatch, storedSigs, "text", "doc_id", bands = nBands, rows = nRows)
        verified = verified.unionByName(
          Dedup.verifyPairs(cands, whNow, "text", "doc_id", threshold = 0.6))
        storedSigs = storedSigs.unionByName(
          Dedup.signatureTable(newBatch, "text", "doc_id",
            bands = nBands, rows = nRows))
      }

      val whDocs = spark.read.parquet(wh).select($"doc_id", $"text")
      // stream-side exact dedup matched the batch rule (11 folded into 1)
      assert(whDocs.select("doc_id").as[Long].collect().toSet ===
        Set(1L, 2L, 3L, 12L, 13L, 21L, 22L))

      // union of per-batch verified pairs == from-scratch verified pairs
      val incPairs = verified.select("doc_a", "doc_b")
        .as[(Long, Long)].collect().toSet
      val scratchPairs = Dedup.minhashNearDups(whDocs, "text", "doc_id", 0.6,
          bands = nBands, rows = nRows)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(incPairs === scratchPairs, s"inc=$incPairs scratch=$scratchPairs")
      // and the planted chain is really a chain: (1,12) and (12,21), no (1,21)
      assert(incPairs.contains((1L, 12L)) && incPairs.contains((12L, 21L)))
      assert(!incPairs.contains((1L, 21L)))

      // final handoff result == from-scratch Curation.run over all drops
      val collapsed = Dedup.collapseToCanonical(whDocs, verified, "doc_id")
      val canon = collapsed.select("doc_id", "canonical_id")
        .as[(Long, Long)].collect().toMap
      assert(canon(12L) === 1L)
      assert(canon(21L) === 1L) // transitive attribution through 12
      val incIds = TextAnalysis.filterByQuality(
          collapsed.filter($"canonical_id" === $"doc_id").drop("canonical_id"),
          0.3, "text")
        .select("doc_id").as[Long].collect().toSet

      val batchRes = Curation.run(drops.flatten.toDF("doc_id", "text"),
        minQuality = 0.3, jaccardThreshold = 0.6, bands = nBands, rows = nRows)
      val batchIds = batchRes.curated.select("doc_id").as[Long].collect().toSet
      assert(batchIds.nonEmpty)
      assert(incIds === batchIds, s"inc=$incIds batch=$batchIds")
    } finally q.stop()
  }
}
