package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed pipeline a training-data run
  * executes over raw documents:
  *
  *   1. exact dedup (fingerprint groupBy, keep lowest id);
  *   2. MinHash-LSH near-dup detection → collapse to canonical ids, keep
  *      only canonical representatives;
  *   3. quality floor + optional repetition (boilerplate) ceiling;
  *   4. enrichment (language, quality, token counts, fingerprint).
  *
  * Scale shape: stages 1-2 are the only shuffles (fingerprint, band key);
  * stages 3-4 are map-side. Returns the curated corpus plus a one-row
  * summary for monitoring.
  */
object Curation {

  final case class Result(curated: DataFrame, summary: DataFrame)

  /** Cache lifecycle (single-pass guarantee): every stage boundary the
    * summary counts re-read (`exact`, `collapsed`, the LSH signature table
    * inside [[Dedup.minhashNearDups]]) is persisted under a [[CacheScope]]
    * for the duration of the call — the input is scanned twice (n_input +
    * materializing the exact-dedup cache) and every downstream count reads
    * a cache, never the dedup DAG again.
    *
    * `resultScope` decides what survives the call. None (default): all
    * caches are released before returning — nothing stays pinned, and a
    * later action on the returned lazy `curated` recomputes its lineage
    * from the input (including both sides of the LSH self-join). A caller
    * that will CONSUME `curated` should pass its own scope: `collapsed` —
    * the materialized frame `curated` is a map-side projection of — then
    * stays cached until the caller releases the scope, making the
    * consuming action one cheap pass:
    * {{{
    * val scope = new CacheScope
    * val res = Curation.run(docs, resultScope = Some(scope))
    * res.curated.write.parquet(out)  // map-side over the cached collapse
    * scope.unpersistAll()
    * }}} */
  def run(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      minQuality: Double = 0.3,
      jaccardThreshold: Double = 0.5,
      maxRepetition: Double = 1.0,
      bands: Int = 3,
      rows: Int = 2,
      resultScope: Option[CacheScope] = None): Result = {
    val scope = new CacheScope
    try {
      // explicit-count spread of the survivors before the CPU-bound stages:
      // AQE's byte-based coalescing folds the exact-dedup window's output
      // to one partition at small corpus sizes (bytes ≪ the 1 MB floor),
      // which then runs the MinHash signature kernels, the shingle verify
      // and the quality scoring on ONE core (measured: most of q74's
      // wall). defaultParallelism is cluster-derived; the exchange moves
      // exactly the deduped survivors once. At warehouse scale this
      // pipeline is the small-corpus convenience anyway (the signature
      // table is WRITTEN bucketed by band key — see signatureTable's doc).
      val exact = scope.persist(Dedup.exact(docs, textCol, idCol)
        .repartition(docs.sparkSession.sparkContext.defaultParallelism,
          col(idCol)))

      val nearPairs = Dedup.minhashNearDups(exact, textCol, idCol,
        jaccardThreshold, bands = bands, rows = rows, scope = scope)
      val collapsed = resultScope.getOrElse(scope).persist(
        Dedup.collapseToCanonical(exact, nearPairs, idCol)
          .filter(col("canonical_id") === col(idCol))
          .drop("canonical_id"))

      val qualityFloor = TextAnalysis.filterByQuality(collapsed, minQuality, textCol)
      // optional boilerplate ceiling (Gopher repetition signal); 1.0 = off
      val filtered =
        if (maxRepetition >= 1.0) qualityFloor
        else qualityFloor
          .withColumn("__sh", graft.functions.Text.shingles(col(textCol), 3))
          .filter(graft.functions.Text.repetitionRatioOf(col("__sh")) <= maxRepetition)
          .drop("__sh")
      val curated = TextAnalysis.enrich(filtered, textCol)

      val spark = docs.sparkSession
      import spark.implicits._
      val total = docs.count()
      val nExact = exact.count()         // materializes `exact` (the one dedup pass over the input)
      val nCollapsed = collapsed.count() // LSH over the cached `exact`; materializes `collapsed`
      val nFinal = curated.count()       // map-side over the cached `collapsed`
      val summary = Seq((total, nExact, nCollapsed, nFinal))
        .toDF("n_input", "n_after_exact_dedup", "n_after_near_dedup", "n_curated")
      Result(curated, summary)
    } finally scope.unpersistAll()
  }
}
