package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** N-gram NOVELTY against a reference corpus — the data-SELECTION twin
    * of decontamination: instead of dropping overlap with an eval suite,
    * score how much of each document is new relative to what the model
    * has already seen (dedup-aware mixing, curriculum ordering, dataset
    * diffing). Per document: `n_grams` distinct word n-grams, `n_novel`
    * of them absent from the reference's distinct n-gram set, and their
    * ratio `novelty` (NULL for a document with no n-grams — too short to
    * judge, the caller's policy). Documents with no n-grams stay in the
    * output with n_grams = 0.
    *
    * Scale shape: the reference collapses to its DISTINCT n-gram set and
    * BROADCASTS into the corpus explode (same plan family as
    * [[Dedup.contaminated]] — the corpus is never shuffled by n-gram;
    * the only corpus-wide exchange keys on the doc id). A reference too
    * big to broadcast wants the bloom route ([[Dedup.contaminatedBloom]]
    * pattern); here novelty tolerates the sketch's fpp directly (a false
    * positive marks a novel gram as seen — novelty UNDERestimates by
    * ≤ fpp, no verify join needed), so the exact form is the gate and
    * the bloom form is the documented 100 TB path. */
  def ngramNovelty(docs: DataFrame, reference: DataFrame, textCol: String,
      idCol: String, n: Int = 3): DataFrame = {
    val refGrams = reference
      .select(explode(shingles(col(textCol), n)).as("__g")).distinct()
      .withColumn("__seen", lit(1))
    val scored = docs
      .select(col(idCol), explode(array_distinct(shingles(col(textCol), n))).as("__g"))
      .join(broadcast(refGrams), Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_novel"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty",
        when(col("n_grams") > 0,
          col("n_novel").cast("double") / col("n_grams")))
  }

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

  /** ADAPTIVE per-group quality floor: keep EXACTLY ceil(fraction·n) of
    * each n-row group, best score first — "top half of every source"
    * instead of one global threshold, which over-prunes clean sources and
    * under-prunes noisy ones. Rank-based (row_number with an id tie-break
    * against a per-group count), not value-threshold-based: a value cut at
    * an interpolated quantile is sensitive to last-ulp quantile
    * differences when scores tie at the boundary, and a percent_rank cut
    * over-keeps (rank 1 has percent_rank 0, so even fraction 0 would keep
    * a row); the exact-count rule makes output size a function of
    * fraction alone. Scale: ONE shuffle on the group key + in-partition
    * sort — the same shape as any per-group window; groups are sources,
    * so partition counts are small and skew follows source size (AQE
    * handles it). */
  def keepTopFraction(df: DataFrame, groupCol: String, scoreCol: Column,
      fraction: Double, idCol: String): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction not in [0,1]")
    Seq("__rn", "__n").foreach(c =>
      require(!df.columns.contains(c),
        s"input must not contain reserved column $c (it would be overwritten)"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(scoreCol.desc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .filter(col("__rn") <= ceil(lit(fraction) * col("__n")))
      .drop("__rn", "__n")
  }

  /** Gopher-style document quality signals (the published rule family from
    * the Gopher/MassiveText filtering recipe), as map-side columns:
    *
    *  - `g_n_words` — whitespace token count;
    *  - `g_mean_word_len` — mean token length over normalized text
    *    (len(norm) minus the ntok−1 separator spaces, over ntok);
    *  - `g_symbol_ratio` — (# chars + "..." occurrences) per word;
    *  - `g_alpha_ratio` — fraction of tokens containing a letter.
    *
    * Ratios round to 6 dp (the engine-parity discipline q71 documents).
    * The alpha fraction uses a higher-order `filter` — interpreted, not
    * codegen'd, but still one pass per row with no outer-expression
    * re-evaluation inside the lambda (the trap [[graft.functions.Text
    * .shingles]] documents). */
  def withGopherSignals(df: DataFrame, textCol: String = "text"): DataFrame = {
    val ntok = tokenCount(col(textCol))
    val norm = normalize(col(textCol))
    val toks = tokens(col(textCol))
    val hashes = length(col(textCol)) -
      length(regexp_replace(col(textCol), "#", ""))
    val ellipses = (length(col(textCol)) -
      length(regexp_replace(col(textCol), "\\.\\.\\.", ""))) / lit(3)
    df.withColumn("g_n_words", ntok.cast("long"))
      .withColumn("g_mean_word_len",
        round((length(norm) - col("g_n_words") + 1).cast("double") /
          greatest(col("g_n_words"), lit(1L)), 6))
      .withColumn("g_symbol_ratio",
        round((hashes + ellipses).cast("double") /
          greatest(col("g_n_words"), lit(1L)), 6))
      .withColumn("g_alpha_ratio",
        round(size(filter(toks, t => t.rlike("[a-z]"))).cast("double") /
          greatest(col("g_n_words"), lit(1L)), 6))
  }

  /** Keep documents passing every Gopher rule. Defaults are the published
    * operating points; short-document corpora lower `minWords`. */
  def gopherFilter(df: DataFrame, textCol: String = "text",
      minWords: Long = 50, maxWords: Long = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaRatio: Double = 0.8): DataFrame =
    withGopherSignals(df, textCol)
      .filter(col("g_n_words") >= minWords && col("g_n_words") <= maxWords &&
        col("g_mean_word_len") >= minMeanWordLen &&
        col("g_mean_word_len") <= maxMeanWordLen &&
        col("g_symbol_ratio") <= maxSymbolRatio &&
        col("g_alpha_ratio") >= minAlphaRatio)
      .drop("g_n_words", "g_mean_word_len", "g_symbol_ratio", "g_alpha_ratio")

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
    // phone matches REQUIRE an explicit phone signal: a leading +country
    // code, a parenthesized area code followed by a ≥3-digit group (so a
    // citation year "(2010) 20-30" can't chain), or the unambiguous
    // 3-3-4 separator shape. A bare spaced digit run is indistinguishable
    // from a year range ("2010 - 2020") or a number table ("10 20 30 40")
    // by shape alone and is deliberately NOT matched: for those, a
    // redactor must never mangle prose — precision over recall, with the
    // recall loss confined to space-separated local formats.
    "(\\+[0-9]{1,3}[ -]?)?\\([0-9]{2,4}\\)[ -]?[0-9]{3,4}([ -][0-9]{2,4}){1,2}\\b" -> "<PHONE>",
    "\\+[0-9]{1,3}([ -]?[0-9]{2,4}){2,4}\\b" -> "<PHONE>",
    "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b" -> "<PHONE>")

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

  /** BM25 relevance of every document to a bag of query `terms` — the
    * retrieval/relevance-filter primitive (rank a corpus against a probe
    * set, e.g. "how textbook-like is this document"). Okapi BM25 with the
    * Lucene idf variant: ln(1 + (N − df + ½)/(df + ½)), never negative.
    *
    * Scale shape: the corpus explode is FILTERED TO THE QUERY TERMS before
    * any shuffle (a literal IN over a handful of terms), so the only
    * shuffled rows are actual term hits — the full token stream never moves.
    * Document frequencies and the corpus stats (N, avgdl) are broadcast
    * scalars; the per-doc length projection joins the hit table on the doc
    * key (uniform). No UDF, all codegen'd built-ins.
    *
    * Determinism: tf/df/dl/N are exact integers and the score's IEEE
    * expression tree is identical across engines; ln differs in the last
    * ulp across libm, so per-(doc,term) scores round to 6 dp before the
    * decimal per-doc sum (the q77 discipline). Documents matching no term
    * produce no row (score 0 by omission, not a fake 0.0 row). */
  def bm25(df: DataFrame, terms: Seq[String], textCol: String = "text",
      idCol: String = "doc_id", k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(terms.forall(t => t == t.toLowerCase.trim && t.nonEmpty),
      "terms must be normalized (lowercase, trimmed, non-empty)")
    val docs = df.select(col(idCol), tokenCount(col(textCol)).cast("long").as("__dl"))
    val stats = docs.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__sumdl"))
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .filter(col("__tok").isin(terms: _*))
      .groupBy(col(idCol), col("__tok")).agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
    val avgdl = col("__sumdl").cast("double") / col("__n")
    val w = log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))) *
      (col("__tf") * lit(k1 + 1)) /
      (col("__tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("__dl") / avgdl))
    tf.join(broadcast(dfreq), Seq("__tok"))
      .join(docs, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("__w", round(w, 6))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matched_terms"),
        sum(col("__w").cast("decimal(28,6)")).cast("double").as("bm25"))
  }

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

  /** Learn a BPE merge table from the corpus (Sennrich et al., ACL 2016):
    * `numMerges` rounds, each counting adjacent symbol pairs over the
    * corpus UNDER THE MERGES LEARNED SO FAR and adopting the most
    * frequent (ties broken (left, right) ascending — deterministic
    * across engines and runs). Returns merges in rank order, ready for
    * [[graft.functions.Bpe.tokens]].
    *
    * Scale shape — the published learner's one-pass-then-iterate form:
    * the corpus is aggregated ONCE to a `(word, count)` frequency table
    * (pairs never cross whitespace, so that table carries everything the
    * learner needs; it is vocabulary-sized, tiny relative to the corpus).
    * Under `maxDistinctWords` the table is collected and merges are
    * learned driver-local with an inverted pair→words index, so each
    * round touches only the words that actually contain the adopted pair
    * (the classic Sennrich `learn_bpe` shape) — a 32k-merge vocabulary is
    * zero further cluster work. Above the cap, rounds run distributed
    * over the CACHED word table weighted by count — per-round work is on
    * the distinct-word table, and the corpus itself is never re-scanned
    * either way. `minCount` stops early when no pair clears the floor
    * (noise merges memorize singletons).
    *
    * Distributed rounds adopt BATCHES from the top-`batchTopK` ranked
    * pairs (see [[bpeLearnDistributed]]): with `exactBatching = true`
    * (default) the batch provably equals sequential adoption — exactness
    * caps it at the disjoint rank prefix, ~1 merge/round on natural text,
    * one aggregation job each; `exactBatching = false` adopts up to 8
    * disjoint near-top pairs per round — the fast-trainer production path
    * for big vocabularies, ÷8 the job count, with bounded characterized
    * deviation (BpeSpec: same first picks, ≥70% merge-set overlap, <2%
    * token-count drift on the fixture corpus). */
  def bpeLearn(df: DataFrame, textCol: String = "text",
      numMerges: Int = 100, minCount: Long = 2L,
      maxDistinctWords: Long = 2000000L,
      batchTopK: Int = 256, exactBatching: Boolean = true): Seq[(String, String)] = {
    require(batchTopK >= 1, s"batchTopK ($batchTopK) must be >= 1")
    require(numMerges >= 0, s"numMerges ($numMerges) must be >= 0")
    // pairs are counted WITHIN words (a merge never crosses whitespace),
    // so the (word, count) table is a lossless sufficient statistic
    val wordFreq = df
      .select(explode(split(normalize(col(textCol)), " ")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("__w")).agg(count(lit(1)).as("__cnt"))
      .persist()
    try {
      val nDistinct = wordFreq.count() // materializes the cache: the ONE corpus pass
      if (nDistinct <= maxDistinctWords) {
        val table = wordFreq.collect()
          .map(r => (r.getString(0), r.getLong(1)))
        bpeLearnLocal(table, numMerges, minCount)
      } else bpeLearnDistributed(wordFreq, numMerges, minCount, batchTopK,
        exactBatching)
    } finally { wordFreq.unpersist(); () }
  }

  /** Driver-local learner over the collected word-frequency table: pair
    * counts and a pair→words inverted index are maintained incrementally,
    * so round k touches only the words containing round k's pair. Merging
    * the adopted pair in place is exact (one leftmost-non-overlapping pass
    * removes every occurrence: the merged symbol `l+r` can equal `l` or
    * `r` only if the other were empty, and merges never create an
    * adjacency between two pre-existing symbols), so the evolving state
    * equals a from-scratch re-apply each round. */
  private def bpeLearnLocal(table: Array[(String, Long)], numMerges: Int,
      minCount: Long): Seq[(String, String)] = {
    import scala.collection.mutable
    // code-point order == UTF-8 byte order == Spark's string sort, which
    // differs from Java's UTF-16 code-unit order for supplementary chars;
    // ties must break identically to the distributed path's orderBy
    def cpCompare(a: String, b: String): Int = {
      var i = 0; var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i); val cb = b.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca); j += Character.charCount(cb)
      }
      Integer.compare(a.length - i, b.length - j)
    }
    // word state: symbol arrays (code-point split, as the apply kernel)
    val syms = new Array[mutable.ArrayBuffer[String]](table.length)
    val cnts = new Array[Long](table.length)
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def addPair(p: (String, String), wi: Int, c: Long): Unit = {
      pairCount.update(p, pairCount.getOrElse(p, 0L) + c)
      pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += wi
    }
    var wi = 0
    while (wi < table.length) {
      val (w, c) = table(wi)
      val b = new mutable.ArrayBuffer[String](w.length)
      var si = 0
      while (si < w.length) {
        val cp = w.codePointAt(si)
        b += new String(Character.toChars(cp))
        si += Character.charCount(cp)
      }
      syms(wi) = b; cnts(wi) = c
      var i = 0
      while (i < b.length - 1) { addPair((b(i), b(i + 1)), wi, c); i += 1 }
      wi += 1
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      // total order (count desc, left asc, right asc) — deterministic
      // regardless of hash-map iteration order
      var best: (String, String) = null
      var bestN = 0L
      pairCount.foreach { case (p, n) =>
        if (n > bestN || (n == bestN && best != null && {
          val c1 = cpCompare(p._1, best._1)
          c1 < 0 || (c1 == 0 && cpCompare(p._2, best._2) < 0)
        })) { best = p; bestN = n }
      }
      if (best == null || bestN < minCount) exhausted = true
      else {
        merges += best
        val affected = pairWords.getOrElse(best, mutable.BitSet.empty).toArray
        affected.foreach { w =>
          val old = syms(w); val c = cnts(w)
          val oldPairs = mutable.HashSet.empty[(String, String)]
          var i = 0
          while (i < old.length - 1) {
            val p = (old(i), old(i + 1)); oldPairs += p
            val n = pairCount(p) - c
            if (n <= 0L) pairCount.remove(p) else pairCount.update(p, n)
            i += 1
          }
          val next = new mutable.ArrayBuffer[String](old.length)
          i = 0
          while (i < old.length) {
            if (i < old.length - 1 && old(i) == best._1 && old(i + 1) == best._2) {
              next += (old(i) + old(i + 1)); i += 2
            } else { next += old(i); i += 1 }
          }
          syms(w) = next
          val newPairs = mutable.HashSet.empty[(String, String)]
          i = 0
          while (i < next.length - 1) {
            val p = (next(i), next(i + 1)); newPairs += p
            pairCount.update(p, pairCount.getOrElse(p, 0L) + c)
            i += 1
          }
          oldPairs.foreach { p =>
            if (!newPairs.contains(p)) pairWords.get(p).foreach { s =>
              s -= w; if (s.isEmpty) { pairWords.remove(p); () }
            }
          }
          newPairs.foreach { p =>
            pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += w; ()
          }
        }
      }
    }
    merges.toSeq
  }

  /** Distributed fallback above the driver cap: each round re-symbolizes
    * the CACHED distinct-word table under the merges so far (the codegen'd
    * apply kernel), explodes to pairs weighted by word count — per-round
    * work on the word table, never the corpus — and adopts a BATCH of
    * merges per aggregation, so a 4k-merge request costs ~hundreds of
    * Spark jobs, not 4k (the r13 job-floor fix).
    *
    * The batch is EXACTLY what one-merge-per-round would have adopted —
    * provably, not heuristically. From the ranked pair list (count desc,
    * then the same codepoint tie order as the driver path) take the
    * maximal prefix whose pairs (a) share no symbol with each other,
    * (b) form merged strings that equal no symbol currently present in
    * any pair and no other accepted merge's product, and (c) count
    * strictly above `c_stop`, the count at the first position violating
    * (a)/(b) (or the last collected rank). Why that equals sequential
    * adoption: applying an accepted pair cannot change another accepted
    * pair's count (disjoint symbols, and its product is a FRESH string —
    * check (b) — so no created pair aliases an existing one); every pair
    * it can create or boost shares a symbol with it, and all such pairs
    * sit at or below the stop position, count ≤ c_stop; accepted counts
    * are strictly above. So at each sequential step the next accepted
    * pair still outranks every alternative, in the same total order. An
    * empty surviving prefix (rank-1/rank-2 overlap with equal counts)
    * falls back to adopting rank 1 alone — sequential's unconditional
    * first pick. Exhaustion stays the sequential rule: a round whose
    * global best sits under `minCount` ends learning (created pairs
    * cannot beat c_stop < minCount, so no hidden candidates are lost).
    *
    * On natural text the EXACT batch is often small — the top-ranked
    * pairs share letters, so the disjoint prefix ends early (measured:
    * ~1.06 merges/round on the fixture corpus). The alias-check job is
    * therefore ELIDED when a cheap pre-scan shows the batch cannot
    * exceed one (adopting rank 1 alone never needs it), keeping exact
    * mode at one job per round in the common case. `exact = false`
    * switches to the fast-trainer compromise: SKIP conflicting
    * candidates instead of stopping, adopting every rank-ordered
    * disjoint fresh-product pair ≥ `minCount` in the collected window —
    * tens of merges per aggregation. The adopted set can then deviate
    * from sequential BPE (a skipped pair's count may have shifted before
    * its sequential turn) — characterized in BpeSpec: same first picks,
    * high merge-set overlap, equivalent corpus compression. */
  private def bpeLearnDistributed(wordFreq: DataFrame, numMerges: Int,
      minCount: Long, batchTopK: Int = 256,
      exact: Boolean = true): Seq[(String, String)] = {
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    var rounds = 0
    while (merges.size < numMerges && !exhausted) {
      rounds += 1
      val pairs = wordFreq
        .select(graft.functions.Bpe.tokens(col("__w"), merges.toSeq).as("__t"),
          col("__cnt"))
        .filter(size(col("__t")) >= 2)
        .withColumn("__p", expr(
          "transform(sequence(0, size(__t)-2), i -> struct(__t[i] AS l, __t[i+1] AS r))"))
        .select(explode(col("__p")).as("p"), col("__cnt"))
        .groupBy(col("p.l").as("__l"), col("p.r").as("__r"))
        .agg(sum(col("__cnt")).as("__n"))
        .persist()
      try {
        val ranked = pairs
          .orderBy(col("__n").desc, col("__l"), col("__r"))
          .limit(batchTopK).collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        if (ranked.isEmpty || ranked.head._3 < minCount) { exhausted = true }
        else {
          // the greedy scan, parameterized by the alias set; in exact
          // mode a conflict STOPS the prefix (and records c_stop), in
          // approximate mode it is SKIPPED and the scan continues
          def scan(present: String => Boolean)
              : (Seq[(String, String, Long)], Long) = {
            val used = scala.collection.mutable.HashSet.empty[String]
            val products = scala.collection.mutable.HashSet.empty[String]
            val accepted =
              scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
            var cStop = ranked.last._3 // beyond-K counts are ≤ the K-th
            // approximate-mode floor: adopt only pairs within 2× of the
            // round's top count — a merge shifts a neighbor's count by at
            // most its own occurrences, so near-top candidates keep their
            // relative rank far more often (measured: overlap vs
            // sequential rises from ~0.56 to ~0.9 on the fixture corpus)
            val floor =
              if (exact) minCount
              else math.max(minCount, (ranked.head._3 + 1) / 2)
            var stopped = false
            var i = 0
            while (i < ranked.length && !stopped) {
              val (l, r, n) = ranked(i)
              val product = l + r
              if (n < floor) { cStop = n; stopped = true }
              else if (used(l) || used(r) || products(l) || products(r) ||
                  present(product) || products(product)) {
                if (exact) { cStop = n; stopped = true }
              } else {
                accepted += ((l, r, n)); used += l; used += r
                products += product
                // approximate-mode batch cap: each adopted merge postpones
                // the product pairs it would have surfaced for sequential
                // adoption mid-window; small batches bound that drift
                // while still dividing the round count by the cap
                if (!exact && accepted.sizeIs >= 8) stopped = true
              }
              i += 1
            }
            (accepted.toSeq, cStop)
          }
          // alias-check pre-scan elision: if even the OPTIMISTIC prefix
          // (no alias set) truncates to ≤ 1, adopt rank 1 — sequential's
          // unconditional first pick needs no second job
          val (optimistic, optimisticStop) = scan(_ => false)
          val trivial = exact &&
            optimistic.takeWhile(_._3 > optimisticStop).sizeIs <= 1
          val batch =
            if (trivial) Seq((ranked.head._1, ranked.head._2, ranked.head._3))
            else {
              // every symbol participating in ANY pair — the alias check
              // (b); vocab-bounded (charset + merges so far), tiny collect
              val present: Set[String] = pairs
                .select(explode(array(col("__l"), col("__r"))).as("__s"))
                .distinct().collect().map(_.getString(0)).toSet
              val (accepted, cStop) = scan(present)
              val kept =
                if (exact) accepted.takeWhile(_._3 > cStop) else accepted
              if (kept.isEmpty) Seq((ranked.head._1, ranked.head._2, ranked.head._3))
              else kept
            }
          merges ++= batch.take(numMerges - merges.size).map(t => (t._1, t._2))
        }
      } finally { pairs.unpersist(); () }
    }
    lastDistributedRounds = rounds
    merges.toSeq
  }

  /** Aggregation rounds of the LAST [[bpeLearnDistributed]] call on this
    * JVM — bench/spec telemetry for the batch amortization (merges per
    * round), nothing more. */
  @volatile private[graft] var lastDistributedRounds: Int = 0
}
