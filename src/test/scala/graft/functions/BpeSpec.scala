package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference formulation (immutable lists, per-iteration
    * rebuild) of the SAME published algorithm the kernel implements:
    * repeatedly merge every leftmost-non-overlapping occurrence of the
    * lowest-ranked adjacent pair. Parity between the two code paths is
    * the spec's core claim. */
  private def ref(word: String, merges: Seq[(String, String)]): List[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.codePoints().toArray.toList
      .map(cp => new String(Character.toChars(cp)))
    var continue = true
    while (continue) {
      val present = syms.zip(syms.drop(1)).flatMap(p => rank.get(p).map(_ -> p))
      if (present.isEmpty) continue = false
      else {
        val best = present.minBy(_._1)._2
        val buf = scala.collection.mutable.ListBuffer.empty[String]
        var rest = syms
        while (rest.nonEmpty) rest match {
          case a :: b :: t if (a, b) == best => buf += (a + b); rest = t
          case a :: t => buf += a; rest = t
          case Nil => ()
        }
        syms = buf.toList
      }
    }
    syms
  }

  private val merges = Seq(("a", "n"), ("b", "an"), ("a", "a"), ("aa", "b"))

  private def encode(text: String): Seq[String] =
    Seq(text).toDF("t")
      .select(Bpe.tokens(col("t"), merges).as("toks"))
      .as[Seq[String]].head()

  test("hand-derived cases: rank priority, chaining, overlap, unknown chars") {
    assert(encode("banana") === Seq("ban", "an", "a"))
    assert(encode("band") === Seq("ban", "d"))
    // overlap: (a,a) merges leftmost-non-overlapping — never [a,aa,a]
    assert(encode("aaaa") === Seq("aa", "aa"))
    // chain: (a,a) then the merged symbol participates in (aa,b)
    assert(encode("aab") === Seq("aab"))
    // no ranked pair present: code points pass through
    assert(encode("cabbage") === Seq("c", "a", "b", "b", "a", "g", "e"))
    // words are independent; merges never cross the space
    assert(encode("nan na") === Seq("n", "an", "n", "a"))
    assert(encode("") === Seq.empty)
  }

  test("kernel == independent reference over real corpus words") {
    val words = graft.queries.Registry.table(spark, sf0001, "documents")
      .select(explode(split(Text.normalize(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct().limit(300)
    val viaKernel = words
      .select(col("w"), Bpe.tokens(col("w"), merges).as("toks"))
      .as[(String, Seq[String])].collect()
    viaKernel.foreach { case (w, got) =>
      assert(got === ref(w, merges), s"word '$w'")
      assert(got.mkString === w, s"word '$w' not partitioned losslessly")
    }
    assert(viaKernel.nonEmpty)
  }

  test("bpeLearn: adopts the most frequent pair per round, deterministically") {
    val docs = Seq(
      (1L, "aaab aaab aaab"),
      (2L, "xy xy"),
      (3L, "aaab xy")).toDF("doc_id", "text")
    // round 1: (a,a) appears once per "aaab" under leftmost-non-overlap
    // symbolization ×4 words... as RAW code points it is 2 per word = 8 —
    // the clear top. round 2: under [(a,a)], "aaab" = [aa,a,b] so (aa,a)
    // and (a,b) tie at 4; the deterministic (left, right) ascending
    // tie-break picks (a,b). round 3: "aaab" = [aa,ab] → (aa,ab) 4 beats
    // (x,y) 3.
    val learned = graft.operators.TextAnalysis.bpeLearn(docs, numMerges = 3)
    assert(learned === Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    // determinism across runs (the tie-break is total)
    assert(learned === graft.operators.TextAnalysis.bpeLearn(docs, numMerges = 3))
    // applying the learned merges compresses the corpus
    val n = docs.select(explode(
        Bpe.tokens(Text.normalize(col("text")), learned)).as("t")).count()
    val n0 = docs.select(explode(
        Bpe.tokens(Text.normalize(col("text")), Nil)).as("t")).count()
    assert(n < n0)
    // minCount floor: singleton pairs are never adopted
    val tiny = Seq((1L, "qz")).toDF("doc_id", "text")
    assert(graft.operators.TextAnalysis.bpeLearn(tiny, numMerges = 5) === Nil)
  }

  test("bpeLearn: driver-local and distributed paths learn IDENTICAL merges") {
    // real fixture corpus; the tiny maxDistinctWords cap forces the
    // distributed per-round fallback, the default takes the local path
    val docs = graft.queries.Registry.table(spark, sf0001, "documents")
      .limit(60).select(col("doc_id"), col("text"))
    val local = graft.operators.TextAnalysis.bpeLearn(docs, numMerges = 24)
    val dist = graft.operators.TextAnalysis.bpeLearn(docs, numMerges = 24,
      maxDistinctWords = 1L)
    assert(local === dist)
    assert(local.size === 24) // a real corpus sustains 24 merges ≥ minCount
  }

  test("bpeLearn: batched distributed adoption == sequential, deep into the merge list") {
    // 150 merges over a real corpus slice: the batch prefix rule fires on
    // every shape that matters (symbol overlap, chained products, count
    // ties) and must still replay the driver path's exact sequence —
    // including the exhaustion tail if the corpus runs dry
    val docs = graft.queries.Registry.table(spark, sf0001, "documents")
      .limit(120).select(col("doc_id"), col("text"))
    val local = graft.operators.TextAnalysis.bpeLearn(docs, numMerges = 150)
    val dist = graft.operators.TextAnalysis.bpeLearn(docs, numMerges = 150,
      maxDistinctWords = 1L)
    assert(dist === local)
    // the slice runs dry under minCount before 150 — the exhaustion tail
    // is exercised and both paths must agree on WHERE it ends
    assert(local.size > 50 && local.size < 150)
  }

  test("bpeLearn: approximate batching — fewer rounds, characterized deviation") {
    val docs = graft.queries.Registry.table(spark, sf0001, "documents")
      .limit(120).select(col("doc_id"), col("text"))
    val seq = graft.operators.TextAnalysis.bpeLearn(docs, numMerges = 80,
      maxDistinctWords = 1L)
    val seqRounds = graft.operators.TextAnalysis.lastDistributedRounds
    val approx = graft.operators.TextAnalysis.bpeLearn(docs, numMerges = 80,
      maxDistinctWords = 1L, exactBatching = false)
    val approxRounds = graft.operators.TextAnalysis.lastDistributedRounds
    // the point of the mode: an order of magnitude fewer aggregation rounds
    assert(approxRounds * 5 <= seqRounds,
      s"approx took $approxRounds rounds vs sequential $seqRounds")
    // deviation is bounded, not wild: identical first pick, high merge-set
    // overlap, equivalent corpus compression
    assert(approx.head === seq.head)
    assert(approx.size === seq.size)
    val overlap = approx.toSet.intersect(seq.toSet).size.toDouble / seq.size
    assert(overlap >= 0.7, s"merge-set overlap $overlap")
    def tokenCount(merges: Seq[(String, String)]): Long =
      docs.select(explode(Bpe.tokens(Text.normalize(col("text")), merges)).as("t"))
        .count()
    val (na, ns) = (tokenCount(approx), tokenCount(seq))
    assert(math.abs(na - ns).toDouble / ns < 0.02,
      s"compression drift: approx $na vs sequential $ns tokens")
    // determinism: the approximate path is still a pure function of input
    assert(approx === graft.operators.TextAnalysis.bpeLearn(docs,
      numMerges = 80, maxDistinctWords = 1L, exactBatching = false))
  }

  test("bpeLearn: ONE corpus pass regardless of numMerges") {
    // opaque mapPartitions barrier counts input-scan tasks (Catalyst can
    // neither prune nor skip it) — the CurationSpec pass-count pattern
    val nPart = 4
    val acc = spark.sparkContext.longAccumulator("bpe-input-scans")
    val docs = spark.range(0, 200, 1, nPart)
      .mapPartitions { it => acc.add(1); it }
      .map(i => (i, s"shared words repeat here tail${i % 7} tok$i"))
      .toDF("doc_id", "text")
    val m1 = graft.operators.TextAnalysis.bpeLearn(docs, numMerges = 2)
    val after1 = acc.value
    val m8 = graft.operators.TextAnalysis.bpeLearn(docs, numMerges = 16)
    val after8 = acc.value - after1
    assert(after1 === nPart.toLong,
      s"expected 1 corpus pass (${nPart} tasks), saw $after1")
    assert(after8 === nPart.toLong,
      s"numMerges=16 must not rescan the corpus: saw $after8 tasks")
    assert(m8.take(m1.size) === m1) // prefix-stability of greedy learning
  }

  test("byte level: round-trip losslessness on multi-byte / emoji / control text") {
    // texts no whitespace-split word-level BPE can represent faithfully:
    // CJK (3-byte UTF-8), an astral-plane emoji (4-byte), combining
    // accents, tabs/newlines/runs of spaces, and a contraction+punct mix
    val texts = Seq(
      "the theme", "don't stop.", "héllo wörld", "火花 引擎 分散式",
      "mixed 中文 and ascii", "emoji 😀 done", "tab\tnew\nline",
      "a  b   c", "  leading and trailing  ", "", "café́ naïve")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val merges = Seq(("t", "h"), ("th", "e"), ("Ġ", "the"), ("Ã", "©"))
    val back = df.select(col("id"),
        Bpe.decodeByteLevel(Bpe.tokensByteLevel(col("text"), merges)).as("rt"),
        col("text"))
      .as[(Long, String, String)].collect()
    back.foreach { case (id, rt, orig) =>
      assert(rt === orig, s"round trip broke doc $id: '$rt' != '$orig'")
    }
    // under an EMPTY merge table too (pure byte alphabet)
    val back0 = df.select(
        Bpe.decodeByteLevel(Bpe.tokensByteLevel(col("text"), Nil)) === col("text"))
      .as[Boolean].collect()
    assert(back0.forall(identity))

    // decode contract: a token outside the byte alphabet (a word-level
    // token with a literal space, a char >= 324) fails naming the
    // offender — never AIOOBE, never a silent NUL byte
    for (bad <- Seq("the quick", "日 本")) { // space = non-image; 日 >= 324
      // constant folding may evaluate eagerly (bare IAE) or at task run
      // (wrapped in SparkException) — accept either, demand the message
      val e = intercept[Exception](
        Seq(Seq(bad)).toDF("toks")
          .select(Bpe.decodeByteLevel(col("toks"))).collect())
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(msgs.contains("not a byte-level BPE token stream"), msgs)
    }
  }

  test("byte level: pretokenizer contract (concatenation identity, GPT-2 splits)") {
    import scala.jdk.CollectionConverters._
    def pre(s: String): List[String] = BpeKernel.pretokenize(s).asScala.toList
    // matches concatenate to the input exactly — the losslessness root
    val texts = Seq("don't stop.", "a  b   c", "x 12,34!", " héllo", "7am'll")
    texts.foreach(t => assert(pre(t).mkString === t, t))
    // contraction split + punctuation detachment
    assert(pre("don't stop.") === List("don", "'t", " stop", "."))
    // a space belongs to the FOLLOWING word; extra spaces stay behind
    assert(pre("a  b") === List("a", " ", " b"))
    // digit runs split from letter runs, space-prefixed
    assert(pre("ab 12cd") === List("ab", " 12", "cd"))
    // trailing whitespace is its own token
    assert(pre("ab  ") === List("ab", "  "))
    // byte alphabet: the canonical images
    assert(BpeKernel.byteToChar(' '.toInt) === 'Ġ') // Ġ
    assert(BpeKernel.byteToChar('\n'.toInt) === 'Ċ') // Ċ
    assert(BpeKernel.byteToChar('a'.toInt) === 'a')      // printable: identity
    // bijective: 256 distinct images
    assert(BpeKernel.byteToChar.toSet.size === 256)
  }

  test("byte level: merges operate over byte symbols, punctuation never glues") {
    // "word." word-level would see one word; byte level detaches "." so
    // a (d, .) merge can never apply across the pretoken boundary
    val df = Seq((1L, "word. word")).toDF("id", "text")
    val toks = df.select(
        Bpe.tokensByteLevel(col("text"), Seq(("d", "."))).as("t"))
      .select(concat_ws("|", col("t"))).as[String].head()
    assert(toks === "w|o|r|d|.|Ġ|w|o|r|d", toks)
    // the expression stays inside whole-stage codegen, like the word form
    val scan = graft.queries.Registry.table(spark, sf0001, "documents")
      .select(size(Bpe.tokensByteLevel(col("text"), Seq(("t", "h")))).as("n"))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(scan.agg(sum(col("n"))).as[Long].head() > 0L)
  }

  test("the expression stays inside whole-stage codegen (no UDF barrier)") {
    // a real file scan (a local relation would collapse to LocalTableScan)
    val df = graft.queries.Registry.table(spark, sf0001, "documents")
      .select(size(Bpe.tokens(Text.normalize(col("text")), merges)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    // the *(n) prefix marks a WholeStageCodegen span over the projection
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("pythonudf"))
    assert(df.agg(sum(col("n"))).as[Long].head() > 0L)
  }
}
