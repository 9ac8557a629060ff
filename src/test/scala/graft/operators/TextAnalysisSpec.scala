package graft.operators

import org.apache.spark.sql.functions.{col, lit}
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat and the dog is on the mat and it is fine"),
    (2L, "der Hund und die Katze ist hier und der Ball ist rot"),
    (3L, "xyzzy qwerty"),
    (4L, "這是一個測試的句子在這裡了"))
    .toDF("doc_id", "text")

  test("langId picks marker-dominant language, 'und' when no markers") {
    val out = TextAnalysis.enrich(docs).select("doc_id", "lang_pred")
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "en")
    assert(out(2L) === "de")
    assert(out(3L) === "und")
    assert(out(4L) === "zh")
  }

  test("enrich attaches quality/tokens/fingerprint; quality in [0,1]") {
    val rows = TextAnalysis.enrich(docs).collect()
    rows.foreach { r =>
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0)
      assert(r.getAs[Int]("n_tokens") > 0)
      assert(r.getAs[String]("fingerprint").length === 32)
    }
  }

  test("filterByQuality drops low-quality docs") {
    val kept = TextAnalysis.filterByQuality(docs, 0.5).count()
    assert(kept < docs.count())
    assert(kept > 0)
  }

  test("repetitionRatio: boilerplate high, varied text zero, short text zero") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val out = Seq(
      (1L, "buy now " * 20),                                    // pure repetition
      (2L, "the quick brown fox jumps over one lazy sleeping dog"), // all-distinct trigrams
      (3L, "two words"))                                        // shorter than n
      .toDF("id", "text")
      .select(col("id"), graft.functions.Text.repetitionRatio(col("text"), 3).as("rep"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) > 0.9)
    assert(out(2L) === 0.0)
    assert(out(3L) === 0.0)
  }

  test("unigramNll: rare-token docs score higher than common-token docs") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = Seq(
      (1L, "the the the the the the"),            // only the most common token
      (2L, "the the the zyzzyva qoph"),           // mixes in two rare tokens
      (3L, "xylotomy zyzzyva qoph vexillology"))  // all rare
      .toDF("doc_id", "text")
    val out = TextAnalysis.unigramNll(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_scored_tokens"), r.getAs[Double]("unigram_nll"))).toMap
    assert(out(1L)._1 === 6L)
    assert(out(1L)._2 < out(2L)._2 && out(2L)._2 < out(3L)._2)
    // doc 1: p(the) = 9/15 → nll = round(-ln(0.6), 6)
    assert(math.abs(out(1L)._2 - 0.510826) < 1e-9)
  }

  test("qualityReport aggregates per key") {
    val rep = TextAnalysis.qualityReport(docs.withColumn("src",
      org.apache.spark.sql.functions.lit("s")), "src").collect().head
    assert(rep.getAs[Long]("n_docs") === 4L)
    assert(rep.getAs[Long]("total_tokens") > 0)
  }

  test("redactPii scrubs identifiers map-side and preserves everything else") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "reach ops@team.example.org or 10.1.2.3 or +44 20 7946 0958 today"),
      (2L, "version 1.2.3 of lib and section 4.5 stay untouched"),
      (3L, null.asInstanceOf[String]),
      (4L, "between 2010 - 2020 scores were 10 20 30 40 in order"),
      (5L, "dial 555-867-5309 or read Smith (2010) 20-30"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> Option(r.getAs[String]("text"))).toMap
    assert(out(1L) === Some("reach <EMAIL> or <IP> or <PHONE> today"))
    // near-miss shapes (semver, section numbers) must survive: the pattern
    // set is precision-first
    assert(out(2L) === Some("version 1.2.3 of lib and section 4.5 stay untouched"))
    assert(out(3L) === None)
    // year ranges and number tables are NOT phones — no explicit + or (...)
    assert(out(4L) === Some("between 2010 - 2020 scores were 10 20 30 40 in order"))
    // 3-3-4 local format IS a phone; a citation year with page range is not
    assert(out(5L) === Some("dial <PHONE> or read Smith (2010) 20-30"))
    // no shuffle: the plan is a single projection over the scan
    val plan = TextAnalysis.redactPii(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("contaminated: n-gram overlap against a broadcast benchmark") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a completely unrelated sentence about parquet files"),
      (3L, "the quick brown cat sat still"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox ran away")).toDF("doc_id", "text")
    val hits = Dedup.contaminated(corpus, bench, "text", "doc_id", n = 3)
      .as[(Long, Long)].collect().toMap
    // doc 1 shares "the quick brown" + "quick brown fox"; doc 3 only the
    // first; doc 2 nothing
    assert(hits === Map(1L -> 2L, 3L -> 1L))
    // excision is a left-anti join away
    val clean = corpus.join(
        Dedup.contaminated(corpus, bench, "text", "doc_id", n = 3),
        Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(clean === Set(2L))
  }

  test("contaminatedBloom: exact answer through the bloom prefilter, even undersized") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a completely unrelated sentence about parquet files"),
      (3L, "the quick brown cat sat still"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox ran away")).toDF("doc_id", "text")
    val exact = Dedup.contaminated(corpus, bench, "text", "doc_id", n = 3)
      .as[(Long, Long)].collect().toMap
    val viaBloom = Dedup.contaminatedBloom(corpus, bench, "text", "doc_id", n = 3)
      .as[(Long, Long)].collect().toMap
    assert(viaBloom === exact)
    // a deliberately undersized filter degrades fpp (more survivors reach
    // the verify join), NEVER correctness — the exact semi-join is the
    // answer, the bloom only a volume valve
    val tiny = Dedup.contaminatedBloom(corpus, bench, "text", "doc_id", n = 3,
        expectedGrams = 4, fpp = 0.5)
      .as[(Long, Long)].collect().toMap
    assert(tiny === exact)
  }

  test("bm25: term-hit docs ranked by tf saturation; no-hit docs absent") {
    val docs = Seq(
      (1L, "spark spark spark spark is all this document talks about"),
      (2L, "spark appears once in this much longer document about other things entirely"),
      (3L, "nothing relevant here at all"),
      (4L, "spark spark here"))
      .toDF("doc_id", "text")
    val scored = TextAnalysis.bm25(docs, Seq("spark"))
      .as[(Long, Long, Double)].collect().map(t => t._1 -> t._3).toMap
    // doc 3 matches nothing → no row (score 0 by omission)
    assert(scored.keySet === Set(1L, 2L, 4L))
    assert(scored.values.forall(_ > 0)) // Lucene idf is never negative
    // length normalization: 2 hits in 3 words (doc 4) outranks 4 hits in 10
    // (doc 1 — tf saturates at k1), which outranks 1 hit in 12 (doc 2)
    assert(scored(4L) > scored(1L) && scored(1L) > scored(2L))
    // hand check doc 4: N=4, df=3, tf=2, dl=3, avgdl=(10+12+5+3)/4=7.5
    // idf = ln(1 + 1.5/3.5); w = idf·(2·2.2)/(2 + 1.2·(0.25 + 0.75·3/7.5))
    val idf = math.log(1 + 1.5 / 3.5)
    val expect = BigDecimal(idf * 4.4 / (2 + 1.2 * (0.25 + 0.75 * 3 / 7.5)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(scored(4L) === expect)
    // terms must arrive normalized — a cased term would silently never match
    intercept[IllegalArgumentException] { TextAnalysis.bm25(docs, Seq("Spark")) }
  }

  test("gopherFilter keeps only docs passing the whole rule conjunction") {
    val docs = Seq(
      (1L, "this corpus document has enough normal words to pass the gate easily today"),
      (2L, "a b c d e f g h i j"),        // mean word length 1 < 3
      (3L, "ok"),                          // below the word floor
      (4L, "#### #### #### #### ####"))    // no alpha words, symbol-heavy
      .toDF("doc_id", "text")
    val kept = TextAnalysis.gopherFilter(docs, minWords = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L))
    // the signal columns are droppable extras, not part of the contract
    assert(TextAnalysis.gopherFilter(docs, minWords = 5).columns.toSeq ===
      Seq("doc_id", "text"))
  }

  test("keepTopFraction keeps exactly ceil(f*n) per group, id tie-break") {
    import spark.implicits._
    // group a: 5 rows → ceil(2.5) = 3 kept; group b: all-tied scores → the
    // kept set falls to the id tie-break, deterministically (ceil(1.5)=2)
    val df = (Seq((1L, "a", 5.0), (2L, "a", 4.0), (3L, "a", 3.0),
      (4L, "a", 2.0), (5L, "a", 1.0),
      (6L, "b", 7.0), (7L, "b", 7.0), (8L, "b", 7.0))).toDF("id", "g", "score")
    val kept = TextAnalysis.keepTopFraction(df, "g", col("score"), 0.5, "id")
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L, 6L, 7L))
    // helper columns are internal
    assert(!TextAnalysis.keepTopFraction(df, "g", col("score"), 0.5, "id")
      .columns.exists(c => c == "__rn" || c == "__n"))
    // fraction 1.0 keeps everything; 0.0 keeps NOTHING (exact-count rule —
    // a percent_rank cut would keep rank 1 of every group even at 0.0)
    assert(TextAnalysis.keepTopFraction(df, "g", col("score"), 1.0, "id")
      .count() === 8L)
    assert(TextAnalysis.keepTopFraction(df, "g", col("score"), 0.0, "id")
      .count() === 0L)
    // reserved input columns fail loudly
    val clash = df.withColumn("__rn", lit(1))
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.keepTopFraction(clash, "g", col("score"), 0.5, "id")
    }
    assert(e.getMessage.contains("__rn"))
  }

  test("ngramNovelty: hand-counted trigram overlap; short docs stay with NULL ratio") {
    import spark.implicits._
    val reference = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quick brown fox jumps"),      // all 3 trigrams seen → 0 novel
      (2L, "the quick brown dog sleeps"),     // 1 seen, 2 novel
      (3L, "completely different text here"), // 2 trigrams, both novel
      (4L, "too short"),                      // < 3 tokens → 0 grams, NULL ratio
      (5L, "")).toDF("doc_id", "text")
    val out = TextAnalysis
      .ngramNovelty(docs, reference, "text", "doc_id", n = 3)
      .select($"doc_id", $"n_grams", $"n_novel")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map(
      1L -> ((3L, 0L)), 2L -> ((3L, 2L)), 3L -> ((2L, 2L)),
      4L -> ((0L, 0L)), 5L -> ((0L, 0L))))
    val ratios = TextAnalysis
      .ngramNovelty(docs, reference, "text", "doc_id", n = 3)
      .select($"doc_id", $"novelty").as[(Long, Option[Double])]
      .collect().toMap
    assert(ratios(1L).contains(0.0) && ratios(2L).contains(2.0 / 3.0))
    assert(ratios(4L).isEmpty && ratios(5L).isEmpty)
  }
}
