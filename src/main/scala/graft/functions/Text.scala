package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline operators (north star):
  * normalization, tokenization, shingling, md5-based min-wise hashing,
  * quality stats, language-ID scoring.
  *
  * Design constraint: every primitive is a pure native-column expression
  * whose semantics are reproducible in ANSI-ish SQL (the DuckDB oracle), so
  * the dedup/fingerprint operators built on top are hash-checkable. That is
  * why hashing is md5-based (identical across engines) rather than
  * xxhash64/murmur (engine-specific seeds).
  *
  * At 100 TB these all stay inside whole-stage codegen — no UDFs, no
  * collect; the only shuffles are the groupBy/join steps of the operators
  * that consume them.
  */
object Text {

  /** Canonical text normalization for fingerprinting: lowercase, collapse
    * whitespace runs to single spaces, trim. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Whitespace tokenization of normalized text → array<string>. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** Token count (whitespace): empty/NULL-safe. */
  def tokenCount(text: Column): Column =
    when(length(normalize(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** BPE-ish subword-count proxy: letter runs + digit runs + individual
    * symbol characters (a cheap, deterministic stand-in for a real
    * tokenizer's piece count). RE2-safe — no lookarounds — so the oracle
    * engine computes the identical quantity. */
  def bpeishTokenCount(text: Column): Column = {
    val s = normalize(text)
    val letterRuns = greatest(size(split(s, "[a-z]+")) - 1, lit(0))
    val digitRuns = greatest(size(split(s, "[0-9]+")) - 1, lit(0))
    val symbolChars = length(regexp_replace(s, "[a-z0-9 ]", ""))
    letterRuns + digitRuns + symbolChars
  }

  /** Word n-gram shingles over normalized text → array<string> of
    * space-joined n-grams (distinct not applied — callers choose).
    *
    * Implementation: zip the token array with its k-shifted copies and join
    * per element. CRITICAL perf property: a lambda body must never reference
    * an outer expression like tokens(text) — Catalyst re-evaluates embedded
    * outer expressions PER ELEMENT (the original formulation re-ran
    * normalize+split ~|tokens| times per row). Here tokens appear only at
    * projection level (n+1 references, CSE-collapsible), and the lambda
    * touches nothing but its own struct argument. */
  def shingles(text: Column, n: Int): Column = shinglesOfTokens(tokens(text), n)

  def shinglesOfTokens(toks: Column, n: Int): Column = {
    val shifted = (0 until n).map(k =>
      slice(toks, lit(k + 1), greatest(size(toks) - n + 1, lit(0))))
    val zipped = arrays_zip(shifted: _*)
    transform(zipped, s =>
      concat_ws(" ", (0 until n).map(k => s.getField(k.toString)): _*))
  }

  /** Min-wise hash of a shingle set under seed `j`: min over shingles of
    * md5(j || ':' || shingle), compared lexicographically. A string-min
    * MinHash — engine-portable (md5 is identical everywhere), and a valid
    * min-wise permutation family for Jaccard estimation. */
  def minhash(shingleArr: Column, seed: Int): Column =
    array_min(transform(shingleArr, s => md5(concat(lit(s"$seed:"), s))))

  /** Document fingerprint: md5 of normalized text (exact-dup key). */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Distinct word-n-gram shingles hashed to 60-bit longs (first 15 hex
    * digits of md5 — reproducible in any md5-capable engine). Set ops over
    * long arrays are far cheaper than over shingle strings: this is the
    * representation pairwise Jaccard should run on at scale. */
  def shingleHashes(text: Column, n: Int): Column =
    shingleHashesOfTokens(tokens(text), n)

  /** Same, over a pre-materialized token array column — callers staging
    * `tokens(text)` once in a projection avoid recomputing normalize+split
    * for each of the n+1 shifted references. */
  def shingleHashesOfTokens(toks: Column, n: Int): Column =
    transform(array_distinct(shinglesOfTokens(toks, n)),
      s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))

  /** Repeated-n-gram ratio in [0,1]: 1 − |distinct shingles| / |shingles|
    * (0 for texts shorter than n tokens). The Gopher-style repetition
    * signal — high values mark boilerplate/spam for the quality floor.
    *
    * PERF: prefer staging the shingle array in its own projection
    * (`withColumn("__sh", shingles(...))` then [[repetitionRatioOf]]) — the
    * conditional references here sit in CaseWhen branches, which Spark's
    * subexpression elimination does not hoist, so the inline form hashes
    * the shingles up to twice per row. */
  def repetitionRatio(text: Column, n: Int = 3): Column =
    repetitionRatioOf(shingles(text, n))

  /** Ratio over a pre-staged shingle-array column. */
  def repetitionRatioOf(sh: Column): Column = {
    val total = size(sh)
    when(total <= 0, lit(0.0)).otherwise(
      round(lit(1.0) -
        size(array_distinct(sh)).cast("double") / total.cast("double"), 6))
  }

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?]", ""))

  /** Tiny deterministic English stopword list for the ratio signal. */
  val stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is", "that")

  /** Stopword-token ratio (≈[0,1]): literal-replace hit counting over the
    * space-padded normalized text ÷ token count. The classic prose signal —
    * near-zero marks code/tables/keyword spam. Same non-overlapping replace
    * semantics as [[matchCount]] (an immediately repeated stopword counts
    * once — shared-space undercount, identical in the oracle engine). */
  def stopwordRatio(text: Column): Column = {
    val padded = concat(lit(" "), normalize(text), lit(" "))
    val hits = stopwords.map(w => matchCount(padded, s" $w ")).reduce(_ + _)
    round(hits.cast("double") / greatest(tokenCount(text), lit(1)).cast("double"), 6)
  }

  /** Quality score in [0,1]: blend of length sanity, punctuation ratio and
    * mean word length (deterministic arithmetic only — oracle-expressible). */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val nTok = tokenCount(text).cast("double")
    val punct = punctCount(text).cast("double")
    val lenOk = least(len / lit(200.0), lit(1.0))
    val punctRatio = least(punct / greatest(nTok, lit(1.0)), lit(1.0))
    val meanWord = len / greatest(nTok, lit(1.0))
    val wordOk = when(meanWord >= 3 && meanWord <= 10, lit(1.0)).otherwise(lit(0.5))
    round((lenOk * 0.4 + (lit(1.0) - punctRatio) * 0.3 + wordOk * 0.3), 6)
  }

  /** Count non-overlapping occurrences of a LITERAL marker in a string:
    * (len(s) − len(replace(s, m, ''))) / len(m). Literal `replace` beats a
    * regex split by an order of magnitude and has identical left-to-right
    * non-overlapping semantics in the oracle engine. */
  def matchCount(text: Column, marker: String): Column = {
    val removed = call_function("replace", text, lit(marker))
    ((length(text) - length(removed)) / lit(marker.length)).cast("int")
  }

  /** n-gram-heuristic language ID over a fixed marker table: per language,
    * count marker-word hits in the normalized text; argmax wins, 'und' when
    * nothing matches. Marker lists are deliberately tiny and deterministic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " is "),
    "de" -> Seq(" der ", " und ", " die ", " ist "),
    "fr" -> Seq(" le ", " la ", " et ", " est "),
    "es" -> Seq(" el ", " los ", " y ", " es "),
    "zh" -> Seq("的", "是", "了", "在"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), normalize(text), lit(" "))
    // Markers contain no regex metacharacters, so they double as patterns
    // verbatim in both Spark (java.util.regex) and the oracle (RE2).
    langMarkers.map { case (lang, markers) =>
      lang -> markers.map(m => matchCount(padded, m)).reduce(_ + _)
    }
  }

  /** Predicted language: argmax of marker scores (ties broken by language
    * code order), 'und' if all scores are 0. */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce(greatest(_, _))
    scores.sortBy(_._1).foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }
}
