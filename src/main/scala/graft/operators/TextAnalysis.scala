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

  /** PII patterns applied by [[redactPii]], in application ORDER (email
    * first: an address contains digit runs a later phone pass would
    * otherwise shred mid-token). Patterns are deliberately restricted to
    * the regex intersection of Java's engine and RE2 (no lookaround, no
    * backreferences, no `\s` — Java's includes \x0B, RE2's does not) so an
    * oracle replica running the same patterns elsewhere matches
    * byte-for-byte. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b" -> "<IP>",
    "\\+?[0-9][0-9()\\- ]{6,}[0-9]\\b" -> "<PHONE>")

  /** Redact personal identifiers (emails, IPv4s, phone-shaped digit runs)
    * with typed placeholder tokens — the scrub a corpus takes before text
    * leaves curation. Pure map-side `regexp_replace` chain: no UDF, no
    * shuffle, codegen'd, NULL text stays NULL. Deliberately conservative
    * pattern set: a redactor must never mangle prose, so only
    * unambiguously-shaped identifiers match (precision over recall — a
    * production deployment extends [[piiPatterns]], it doesn't loosen
    * them). */
  def redactPii(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn(textCol,
      piiPatterns.foldLeft(col(textCol)) { case (c, (pat, repl)) =>
        regexp_replace(c, pat, repl)
      })

  /** CCNet-style perplexity proxy: per-document mean negative log
    * probability of its tokens under the CORPUS'S OWN unigram distribution.
    * Low = built from common tokens (prose-like for this corpus), high =
    * rare-token-heavy (jargon, noise, other languages). The classic cheap
    * stand-in for an LM perplexity filter.
    *
    * Scale shape: one explode+groupBy shuffle builds the unigram table,
    * one shuffle join on the token scores every occurrence, one groupBy on
    * the doc id averages — all keys uniform. Per-token logs are rounded
    * then summed as decimals so the per-doc mean is independent of join
    * order (FP sums are order-nondeterministic; see Registry notes).
    *
    * Returns (idCol, n_scored_tokens, unigram_nll) — documents with no
    * scorable tokens (empty/whitespace-only text splits to a single empty
    * string, which is NOT a token: same guard as tokenCount) produce no
    * output row rather than a fake finite score. */
  def unigramNll(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .filter(length(col("__tok")) > 0)
    val counts = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__cnt"))
    val total = counts.agg(sum(col("__cnt")).as("__total"))
    toks.join(counts, Seq("__tok"))
      .crossJoin(broadcast(total))
      .withColumn("__nll", round(-log(col("__cnt") / col("__total")), 6))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_scored_tokens"),
        (sum(col("__nll").cast("decimal(28,6)")).cast("double") /
          count(lit(1))).as("unigram_nll"))
  }
}
