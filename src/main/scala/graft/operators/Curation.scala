package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed pipeline a training-data run
  * executes over raw documents:
  *
  *   1. exact dedup (fingerprint groupBy, keep lowest id);
  *   2. MinHash-LSH near-dup detection → collapse to canonical ids, keep
  *      only canonical representatives;
  *   3. quality floor;
  *   4. enrichment (language, quality, token counts, fingerprint).
  *
  * Scale shape: stages 1-2 are the only shuffles (fingerprint, band key);
  * stages 3-4 are map-side. Returns the curated corpus plus a one-row
  * summary for monitoring.
  */
object Curation {

  final case class Result(curated: DataFrame, summary: DataFrame)

  def run(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      minQuality: Double = 0.3,
      jaccardThreshold: Double = 0.5): Result = {
    val total = docs.count()

    val exact = Dedup.exact(docs, textCol, idCol)

    val nearPairs = Dedup.minhashNearDups(exact, textCol, idCol, jaccardThreshold)
    val collapsed = Dedup.collapseToCanonical(exact, nearPairs, idCol)
      .filter(col("canonical_id") === col(idCol))
      .drop("canonical_id")

    val filtered = TextAnalysis.filterByQuality(collapsed, minQuality, textCol)
    val curated = TextAnalysis.enrich(filtered, textCol)

    val spark = docs.sparkSession
    import spark.implicits._
    val nExact = exact.count()
    val nCollapsed = collapsed.count()
    val nFinal = curated.count()
    val summary = Seq((total, nExact, nCollapsed, nFinal))
      .toDF("n_input", "n_after_exact_dedup", "n_after_near_dedup", "n_curated")
    Result(curated, summary)
  }
}
