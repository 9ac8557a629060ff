package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.Registry

/** The whole training-data pipeline, composed end to end over the real
  * fixture corpus — the "a user of the reference could switch" proof at
  * the WORKFLOW level, not per-operator: curate (dedup→collapse→quality)
  * → decontaminate against a benchmark → split leakage-free by canonical
  * id → BPE-tokenize with a learned vocabulary → pack into token-bounded
  * bins. Every stage's operator is individually oracle- or spec-gated
  * elsewhere; this spec pins that their CONTRACTS line up (id columns,
  * canonical grouping, split keys, token accounting) with no glue code a
  * user would have to invent. */
class PipelineE2ESpec extends SparkSpec {
  import spark.implicits._

  test("curate -> decontaminate -> leakage-free split -> tokenize -> pack") {
    val docs = Registry.table(spark, sf0001, "documents")
      .select("doc_id", "source", "text")
    val bench = docs.filter(col("source") === "src0")
    val corpus = docs.filter(col("source") =!= "src0")

    // 1. curate: exact + near dedup, quality floor, enrichment
    val scope = new CacheScope
    val curated = Curation.run(corpus, resultScope = Some(scope)).curated
    val nCurated = curated.count()
    assert(nCurated > 0 && nCurated < corpus.count())

    // 2. decontaminate against the benchmark (3-grams on this tiny corpus)
    val clean = Dedup.decontaminate(curated, bench, "text", "doc_id", n = 3)
    val nClean = clean.count()
    assert(nClean > 0 && nClean <= nCurated)

    // 3. split by CANONICAL id so dup groups land together; the guard
    // must report zero cross-arm near-dup pairs — the leakage-free claim
    val pairs = Dedup.minhashCandidates(clean, "text", "doc_id")
    val canon = Dedup.collapseToCanonical(clean, pairs, "doc_id")
    val withSplit = Sampling.withSplit(
      clean.join(canon.select("doc_id", "canonical_id"), "doc_id"),
      "canonical_id")
    val leaked = pairs
      .join(withSplit.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(withSplit.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(leaked === 0L, s"$leaked near-dup pairs straddle split arms")
    // arms are non-trivial: train holds the bulk, something held out
    val arms = withSplit.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(arms.getOrElse("train", 0L) > 0L && arms.size >= 2, arms.toString)

    // 4. learn a small BPE vocabulary on train, tokenize every split with
    // it (the vocabulary is config once learned — applied everywhere)
    val train = withSplit.filter(col("split") === "train")
    val merges = TextAnalysis.bpeLearn(train, numMerges = 8)
    assert(merges.nonEmpty)
    val tokenized = withSplit.withColumn("n_tokens",
      size(graft.functions.Bpe.tokens(
        graft.functions.Text.normalize(col("text")), merges)).cast("long"))
    val (bpeTotal, charTotal) = tokenized
      .agg(sum(col("n_tokens")), sum(length(col("text")).cast("long")))
      .as[(Long, Long)].head()
    assert(bpeTotal > 0 && bpeTotal < charTotal, // merges actually compress
      s"bpe $bpeTotal vs chars $charTotal")

    // 5. pack the train split into token-bounded bins in deterministic
    // shuffle order; bin accounting must cover every document exactly once
    val shuffled = Sampling.deterministicShuffle(
      train.select("doc_id", "text"), "doc_id", nShards = 4, seed = "e2e")
    val bins = Packing.assignBinsOrdered(shuffled, "text", "shard", "pos",
      maxTokens = 400L)
    val nTrain = train.count()
    assert(bins.count() === nTrain)
    assert(bins.select("doc_id").distinct().count() === nTrain)
    // the defining fill property (the q103 oracle's): a doc's bin is the
    // floor of the shard-local running token total BEFORE it, over the
    // shuffled order — recomputed here independently for every row
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val misfiled = bins
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .filter(col("bin").cast("long") =!=
        floor((col("__cum") - col("n_tokens")) / 400.0).cast("long"))
      .count()
    assert(misfiled === 0L, s"$misfiled rows in the wrong bin")

    scope.unpersistAll()
  }
}
