package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Empty and degenerate inputs through every composed operator: a library
  * that throws on a zero-row partition dies on real backfills (an empty
  * day, a filter that matched nothing). */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val one = Seq((1L, "just one document here")).toDF("doc_id", "text")

  test("dedup family: empty and single-doc corpora") {
    assert(Dedup.exact(empty, "text", "doc_id").count() === 0L)
    assert(Dedup.exact(one, "text", "doc_id").count() === 1L)
    assert(Dedup.minhashNearDups(empty, "text", "doc_id", 0.5).count() === 0L)
    assert(Dedup.minhashNearDups(one, "text", "doc_id", 0.5).count() === 0L)
    assert(Dedup.simhashCandidates(empty, "text", "doc_id").count() === 0L)
    assert(Dedup.lineDedup(empty, "text", "doc_id").count() === 0L)
    assert(Dedup.minhashCandidatesAgainst(empty,
      Dedup.signatureTable(one, "text", "doc_id"), "text", "doc_id").count() === 0L)
  }

  test("round-6 operators: empty corpora flow through") {
    assert(TextAnalysis.redactPii(empty).count() === 0L)
    assert(TextAnalysis.withGopherSignals(empty).count() === 0L)
    assert(TextAnalysis.gopherFilter(empty).count() === 0L)
    assert(Dedup.contaminated(empty, one, "text", "doc_id").count() === 0L)
    assert(Dedup.contaminated(one, empty, "text", "doc_id").count() === 0L)
    assert(Packing.chunk(empty, "text", "doc_id", maxTokens = 10).count() === 0L)
    assert(Sampling.sampleByGroup(empty, "doc_id", "text",
      Map("x" -> 0.5)).count() === 0L)
    assert(Sampling.upsampleByGroup(empty, "doc_id", "text",
      Map("x" -> 2.5)).count() === 0L)
    assert(Dedup.collapseToCanonical(empty,
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"), "doc_id").count() === 0L)
  }

  test("curation of an empty corpus yields an all-zero summary") {
    val res = Curation.run(empty)
    val s = res.summary.collect().head
    assert(s.getAs[Long]("n_input") === 0L)
    assert(s.getAs[Long]("n_curated") === 0L)
    assert(res.curated.count() === 0L)
  }

  test("text analysis and sampling: empty inputs flow through") {
    assert(TextAnalysis.enrich(empty).count() === 0L)
    assert(TextAnalysis.unigramNll(empty).count() === 0L)
    assert(Sampling.sample(empty, "doc_id", 0.5).count() === 0L)
    assert(Sampling.withSplit(empty, "doc_id").count() === 0L)
    assert(Packing.assignBins(empty, "text", "doc_id", 100L).count() === 0L)
  }

  test("similarity: empty corpus against a query returns no rows") {
    val emptyVec = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val q = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("qvec")
    assert(Similarity.bruteForceTopK(emptyVec, q, 5).count() === 0L)
    assert(Similarity.lshTopK(emptyVec, q, 5, dims = 2).count() === 0L)
    assert(Similarity.ivfTopK(emptyVec, q, 5, nCells = 4, nProbe = 2).count() === 0L)
  }

  test("stored IVF index round-trips an empty corpus") {
    val emptyVec = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val q = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("qvec")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-empty").toString + "/idx"
    Similarity.ivfWriteIndex(emptyVec, dir, nCells = 4)
    assert(Similarity.ivfTopKFromIndex(spark, dir, q, 5, nProbe = 2).count() === 0L)
  }

  test("multimodal: NULL payloads decode to NULLs, rows kept") {
    import org.apache.spark.sql.Row
    val nullPayload = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "image", "image/png", null, null, null, null)),
      Multimodal.metadataSchema)
    val out = Multimodal.decodeMedia(nullPayload).collect()
    assert(out.length === 1)
    assert(out.head.isNullAt(out.head.fieldIndex("width")))
    assert(out.head.getAs[Long]("n_bytes") === 0L)
  }

  test("round-12 operators: empty and degenerate inputs flow through") {
    // fuzzy join: either side empty → no pairs, never a throw
    assert(Dedup.fuzzyJoin(empty, one, "text", "doc_id", 0.5).count() === 0L)
    assert(Dedup.fuzzyJoin(one, empty, "text", "doc_id", 0.5).count() === 0L)
    // decontamination drop: empty benchmark keeps everything; empty corpus
    // survives both paths (bloom handles the null sketch of zero grams)
    assert(Dedup.decontaminate(one, empty, "text", "doc_id", n = 3).count() === 1L)
    assert(Dedup.decontaminate(empty, one, "text", "doc_id", n = 3).count() === 0L)
    assert(Dedup.decontaminate(empty, one, "text", "doc_id", n = 3,
      bloom = true).count() === 0L)
    // split-leakage guard: empty corpus → empty report
    assert(Sampling.splitLeakage(empty, "text", "doc_id").count() === 0L)
    // audio features: empty frame and a NULL payload both yield zero rows
    val nullAudio = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(Seq(
          org.apache.spark.sql.Row(1L, "audio", "audio/wav",
            null, null, null, null))).asJava),
      Multimodal.metadataSchema)
    assert(Multimodal.audioFrameStats(nullAudio).count() === 0L)
    assert(Multimodal.audioFrameStats(nullAudio.limit(0)).count() === 0L)
    // streaming-capable interval join on empty batch frames
    val noPts = Seq.empty[(Long, java.sql.Timestamp)].toDF("event_id", "ts")
    val noIv = Seq.empty[(java.sql.Timestamp, java.sql.Timestamp)]
      .toDF("w_start", "w_end")
    assert(IntervalJoin.pointInIntervalBounded(noPts, "ts", noIv,
      "w_start", "w_end", bucketMicros = 1000000L,
      maxSpanUs = 1000000L).count() === 0L)
  }
}
