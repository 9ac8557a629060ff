package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text._

/** Text-analysis operators over a document corpus (north star): language ID,
  * quality scoring, token counting, fingerprinting. All per-row native
  * expressions — embarrassingly parallel, no shuffle until the caller
  * aggregates.
  */
object TextAnalysis {

  /** Attach language-ID, quality, token-count, and fingerprint columns. */
  def enrich(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("lang_pred", langId(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("n_bpeish_tokens", bpeishTokenCount(col(textCol)))
      .withColumn("fingerprint", fingerprint(col(textCol)))

  /** Corpus-level quality report grouped by a key column. */
  def qualityReport(df: DataFrame, keyCol: String, textCol: String = "text"): DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol)).cast("long")).as("total_tokens"),
        (sum(qualityScore(col(textCol)).cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("avg_quality"),
        min(length(col(textCol))).as("min_chars"),
        max(length(col(textCol))).as("max_chars"))

  /** Filter documents below a quality threshold (the curation primitive). */
  def filterByQuality(df: DataFrame, minQuality: Double,
      textCol: String = "text"): DataFrame =
    df.filter(qualityScore(col(textCol)) >= minQuality)
}
