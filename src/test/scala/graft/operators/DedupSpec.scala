package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.Registry

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "THE QUICK  brown fox jumps over the lazy dog near the river bank today"), // exact dup after normalize
    (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup (1 word)
    (4L, "completely different content about spark query engines and columnar formats"),
    (5L, "completely different content about spark query engines and columnar format")) // near dup of 4
    .toDF("doc_id", "text")

  test("exact dedup keeps lowest id per normalized-text group") {
    val out = Dedup.exact(docs, "text", "doc_id")
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 3L, 4L, 5L))
  }

  test("minhash LSH finds planted near-dup pairs, skips unrelated docs") {
    val pairs = Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))  // identical after normalization
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists { case (a, b) => Set(a, b).intersect(Set(4L, 5L)).size == 1 &&
      Set(a, b).intersect(Set(1L, 2L, 3L)).size == 1 }) // no cross-cluster pairs
  }

  test("simhash: near-identical docs have close fingerprints, unrelated far") {
    val sims = docs.select($"doc_id", Dedup.simhash32($"text").as("sim"))
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sims(1L) === sims(2L)) // identical token multiset after normalize
    assert(hamming(sims(1L), sims(3L)) < hamming(sims(1L), sims(4L)))
  }

  test("simhashCandidates buckets near-dups together") {
    val cands = Dedup.simhashCandidates(docs, "text", "doc_id")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)))
  }

  test("incremental candidates: per-batch union reproduces the full-corpus set") {
    val corpus = graft.queries.Registry.table(spark, sf0001, "documents")
      .limit(200).select("doc_id", "text")
    val cut = 150L
    val existing = corpus.filter($"doc_id" < cut)
    val newBatch = corpus.filter($"doc_id" >= cut)
    val full = Dedup.minhashCandidates(corpus, "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    val oldOnly = Dedup.minhashCandidates(existing, "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    val inc = Dedup.minhashCandidatesAgainst(newBatch,
        Dedup.signatureTable(existing, "text", "doc_id"), "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(inc.forall { case (a, b) => a >= cut || b >= cut }) // touches new
    assert(inc.intersect(oldOnly).isEmpty)                     // no old×old
    assert(oldOnly.union(inc) === full)                        // exact identity
  }

  test("incremental simhash candidates: batch union identity holds too") {
    val corpus = graft.queries.Registry.table(spark, sf0001, "documents")
      .limit(200).select("doc_id", "text")
    val cut = 150L
    val existing = corpus.filter($"doc_id" < cut)
    val newBatch = corpus.filter($"doc_id" >= cut)
    // narrow 8-bit keys force enough collisions to make the identity non-trivial
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      Dedup.simhashCandidates(df, "text", "doc_id", bits = 32, bands = 4)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val full = pairsOf(corpus)
    val oldOnly = pairsOf(existing)
    val inc = Dedup.simhashCandidatesAgainst(newBatch,
        Dedup.simhashBanded(existing, "text", "doc_id", bits = 32, bands = 4),
        "text", "doc_id", bits = 32, bands = 4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(inc.forall { case (a, b) => a >= cut || b >= cut })
    assert(oldOnly.union(inc) === full)
  }

  test("subBits sub-split: pairs ⊆ exact banding, buckets measurably shrink") {
    // Narrow 8-bit band keys (bits=32/bands=4) force random band collisions
    // on a 300-doc corpus, so the sub-split has something to split; all
    // hashing is deterministic md5, so the counts are stable run to run.
    val docs = graft.queries.Registry.table(spark, sf0001, "documents")
      .limit(300).select("doc_id", "text")
    def pairs(subBits: Int): Set[(Long, Long)] =
      Dedup.simhashCandidates(docs, "text", "doc_id",
          bits = 32, bands = 4, subBits = subBits)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val exact = pairs(0)
    val sub = pairs(2)
    assert(exact.nonEmpty)
    // containment: a pair matching on band+borrowed bits matches the band
    assert(sub.subsetOf(exact), s"${(sub -- exact).take(5)} not in exact set")
    // the valve actually splits: ~2^2 fewer random collisions survive
    assert(sub.size < exact.size,
      s"sub-split did not shrink: ${sub.size} vs ${exact.size}")
    info(s"exact-band pairs=${exact.size}, subBits=2 pairs=${sub.size}")
  }

  test("autoSubBits: integer-exact ceil-log2 of n/target, clamped to width") {
    // below one bucketful: no widening (the tiny-fixture / sf0.01 regime)
    assert(Dedup.autoSubBits(0L, 16) === 0)
    assert(Dedup.autoSubBits(4096L, 16) === 0)
    // power-of-two edges must not wobble (the reason for integer arithmetic)
    assert(Dedup.autoSubBits(4097L, 16) === 1)
    assert(Dedup.autoSubBits(8192L, 16) === 1)
    assert(Dedup.autoSubBits(8193L, 16) === 2)
    assert(Dedup.autoSubBits(4096L * 8, 16) === 3)
    // the measured-scale points: sf0.1 (5k docs) → 1, sf1.0 (50k) → 4
    assert(Dedup.autoSubBits(5000L, 16) === 1)
    assert(Dedup.autoSubBits(50000L, 16) === 4)
    // each 10× in n adds ~log2(10) bits → per-band key space grows with n
    assert(Dedup.autoSubBits(500000L, 16) === 7)
    // clamp: the borrowed window may never spill past the following band
    assert(Dedup.autoSubBits(Long.MaxValue / 2, 16) === 16)
    assert(Dedup.autoSubBits(Long.MaxValue / 2, 8) === 8)
  }

  test("auto band width == explicit subBits at the derived width") {
    val docs = graft.queries.Registry.table(spark, sf0001, "documents")
      .limit(300).select("doc_id", "text")
    // bits=32/bands=4 keeps the 8-bit base keys collision-rich so the test
    // is non-trivial even though 300 docs derive sub=0
    val derived = Dedup.autoSubBits(300L, 8)
    def pairs(df: org.apache.spark.sql.DataFrame, subBits: Int) =
      Dedup.simhashCandidates(df, "text", "doc_id",
          bits = 32, bands = 4, subBits = subBits)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val auto = Dedup.simhashCandidates(docs, "text", "doc_id",
        bits = 32, bands = 4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(auto === pairs(docs, derived))
    assert(auto.nonEmpty)
    // and a corpus big enough to derive sub > 0 matches its explicit twin:
    // shrink the occupancy target instead of inflating the corpus
    val subBig = Dedup.autoSubBits(300L, 8, targetOccupancy = 64L)
    assert(subBig === 3)
    val explicitBig = pairs(docs, subBig)
    assert(explicitBig.subsetOf(auto)) // more borrowed bits only drop pairs
  }

  test("auto-width incremental Against re-bands a narrower stored table") {
    // stored table banded at an EXPLICIT narrow width (subBits=0); the
    // auto Against path must ignore the frozen band_key, re-band both sides
    // from sim at the derived width, and reproduce the full-corpus auto set
    val corpus = graft.queries.Registry.table(spark, sf0001, "documents")
      .limit(200).select("doc_id", "text")
    val cut = 150L
    val existing = corpus.filter($"doc_id" < cut)
    val newBatch = corpus.filter($"doc_id" >= cut)
    val full = Dedup.simhashCandidates(corpus, "text", "doc_id",
        bits = 32, bands = 4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val oldOnly = Dedup.simhashCandidates(existing, "text", "doc_id",
        bits = 32, bands = 4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val inc = Dedup.simhashCandidatesAgainst(newBatch,
        Dedup.simhashBanded(existing, "text", "doc_id",
          bits = 32, bands = 4, subBits = 0),
        "text", "doc_id", bits = 32, bands = 4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(inc.forall { case (a, b) => a >= cut || b >= cut })
    // 200 and 150 docs both derive sub=0 → the exact identity holds here
    assert(oldOnly.union(inc) === full)
  }

  test("fuzzyJoin: strictly left×right, id spaces never mix, verified Jaccard") {
    // ids COLLIDE across tables on purpose: 1L names different texts on
    // each side, and the join must resolve each side by its own table
    val left = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "completely different content about spark query engines today"))
      .toDF("doc_id", "text")
    val right = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the creek"), // ≈ left 1
      (2L, "unrelated text on cooking pasta with garlic and fresh basil"),
      (3L, "completely different content about spark query engines tonight")) // ≈ left 2
      .toDF("doc_id", "text")
    val got = Dedup.fuzzyJoin(left, right, "text", "doc_id", threshold = 0.3)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L), (2L, 3L)), got)
    // within-table near-dups never pair: left 1 vs left 1 is not a row,
    // and the (2,3) pair proves right ids are right-table ids
    val scores = Dedup.fuzzyJoin(left, right, "text", "doc_id", threshold = 0.3)
      .select("jaccard").as[Double].collect()
    assert(scores.forall(j => j >= 0.3 && j <= 1.0))
    // the stored-signature form (corpus hashed once at ingest) is the
    // same join: fuzzyJoinSigs over pre-built signature tables == fuzzyJoin
    val viaSigs = Dedup.fuzzyJoinSigs(
        Dedup.signatureTable(left, "text", "doc_id"), left,
        Dedup.signatureTable(right, "text", "doc_id"), right,
        "text", "doc_id", threshold = 0.3)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    assert(viaSigs === got)
  }

  test("fuzzyJoinBest: one row per left id, ties break to smallest right_id") {
    // right 10 and 11 carry IDENTICAL text, so both verify at the same
    // jaccard against left 1 — the heap must keep the smaller id, the
    // exact tie-break of row_number() ORDER BY jaccard DESC, right_id ASC
    val left = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "completely different content about spark query engines today"))
      .toDF("doc_id", "text")
    val right = Seq(
      (11L, "the quick brown fox jumps over the lazy dog near the creek"),
      (10L, "the quick brown fox jumps over the lazy dog near the creek"), // tie with 11
      (12L, "the quick brown fox jumps over the lazy dog by the river"),   // also ≥ threshold
      (13L, "completely different content about spark query engines tonight"))
      .toDF("doc_id", "text")
    val best = Dedup.fuzzyJoinBest(left, right, "text", "doc_id",
        threshold = 0.2, k = 1)
      .select("left_id", "right_id").as[(Long, Long)].collect().toMap
    assert(best.size === 2)
    assert(best(1L) === 10L) // tie (10,11) resolved to the smaller id
    assert(best(2L) === 13L)
    // k=2: rank order is jaccard desc then right_id asc, starting at 1
    val top2 = Dedup.fuzzyJoinBest(left, right, "text", "doc_id",
        threshold = 0.2, k = 2)
      .select("left_id", "rank", "right_id", "jaccard")
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val l1 = top2(1L)
    assert(l1.map(_._2) === Seq(1L, 2L))
    assert(l1.map(_._3) === Seq(10L, 11L)) // the tied pair, id-ordered
    assert(l1(0)._4 === l1(1)._4)
    assert(top2(1L).forall(r => r._4 >= 0.2))
    // the heap head never widens the row set: every (left, right) in k=2
    // with rank 1 equals the k=1 result
    assert(top2.view.mapValues(_.head._3).toMap === best)

    // id contract: the bounded heap is typed on integral ids — a string
    // id fails up front naming the escape hatch, not at analysis depth
    val strIds = left.withColumn("doc_id", col("doc_id").cast("string"))
    val e = intercept[IllegalArgumentException](
      Dedup.fuzzyJoinBest(strIds, right.withColumn("doc_id",
        col("doc_id").cast("string")), "text", "doc_id", threshold = 0.2))
    assert(e.getMessage.contains("integral") &&
      e.getMessage.contains("fuzzyJoinSigs"), e.getMessage)
  }

  test("containmentOverPairs == containmentPairs on the same candidate set") {
    // the explicit-bucket operator (q90) and the candidate-driven one
    // (q93's building block) must score IDENTICALLY when handed the same
    // pairs: feed containmentOverPairs exactly the source-bucket pairs and
    // compare against containmentPairs bucketed by source
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Registry.table(spark, sf0001, "documents")
      .limit(200).select("doc_id", "source", "text")
    val a = docs.select(col("doc_id").as("doc_a"), col("source"))
    val b = docs.select(col("doc_id").as("doc_b"), col("source"))
    val bucketPairs = a.join(b, "source")
      .filter(col("doc_a") < col("doc_b")).select("doc_a", "doc_b")
    def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.as[(Long, Long, Double)].collect().toSet
    val viaCandidates = canon(Dedup.containmentOverPairs(
      bucketPairs, docs, "text", "doc_id", n = 2, minContainment = 0.25))
    val viaBuckets = canon(Dedup.containmentPairs(
      docs, "source", "text", "doc_id", n = 2, minContainment = 0.25))
    assert(viaCandidates === viaBuckets)
    assert(viaCandidates.nonEmpty)
  }

  test("lineDedup removes cross-doc boilerplate lines, keeps within-doc repeats") {
    val docs = Seq(
      (1L, "alpha beta\nCOOKIE NOTICE\ngamma"),
      (2L, "COOKIE NOTICE\ndelta"),
      (3L, "epsilon\nzeta"),
      (4L, "COOKIE NOTICE"),          // fully boilerplate → empty, row kept
      (5L, "echo\necho\nfoxtrot"))    // repeats within ONE doc only → kept
      .toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "text", "doc_id")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out(1L) === "alpha beta\ngamma")
    assert(out(2L) === "delta")
    assert(out(3L) === "epsilon\nzeta")
    assert(out(4L) === "")
    assert(out(5L) === "echo\necho\nfoxtrot")
    assert(out.size === 5)
  }

  test("lineDedup: blank lines are structure (never boilerplate), NULL text stays NULL") {
    val docs = Seq(
      (1L, "para one\n\npara two"),   // blank separator in both docs...
      (2L, "intro\n\nbody"),          // ...must NOT be stripped as boilerplate
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "text", "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[String]("text"))).toMap
    assert(out(1L) === Some("para one\n\npara two")) // paragraphs intact
    assert(out(2L) === Some("intro\n\nbody"))
    assert(out(3L) === None)                         // NULL preserved, not ""
  }

  test("collapseToCanonical maps dup group members to min id") {
    val pairs = Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.5)
    val out = Dedup.collapseToCanonical(docs, pairs, "doc_id")
      .select("doc_id", "canonical_id").as[(Long, Long)].collect().toMap
    assert(out(2L) === 1L)
    assert(out(4L) === 4L)
  }

  test("collapseToCanonical resolves chains TRANSITIVELY to the component min") {
    // chain 1-2-3-4 plus a branch (2,5): one component {1..5}; pair (6,7);
    // isolated 8. The old one-pass collapse would misattribute 3→2, 4→3,
    // 5→2 — every chain doc must resolve to the component MINIMUM.
    val ids = (1L to 8L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L), (6L, 7L))
      .toDF("doc_a", "doc_b")
    val out = Dedup.collapseToCanonical(ids, pairs, "doc_id")
      .select("doc_id", "canonical_id").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 6L, 7L -> 6L, 8L -> 8L))
  }

  test("collapseToCanonical: a 64-deep chain converges (pointer doubling)") {
    // worst-case diameter for the iteration bound: a pure path graph;
    // pointer doubling must resolve depth 64 in ~6 rounds, far under the cap
    val ids = (1L to 65L).toDF("doc_id")
    val pairs = (1L to 64L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.collapseToCanonical(ids, pairs, "doc_id")
      .select("doc_id", "canonical_id").as[(Long, Long)].collect()
    assert(out.forall(_._2 == 1L), s"non-root labels: ${out.filter(_._2 != 1L).toSeq}")
  }

  test("containmentPairs catches a doc quoted inside a larger one; Jaccard misses it") {
    val small = "alpha beta gamma delta epsilon"
    val big = small + " " + (1 to 40).map(i => s"filler$i").mkString(" ")
    val docs = Seq(
      (1L, "g0", small),                       // fully contained in doc 2
      (2L, "g0", big),
      (3L, "g0", "unrelated words entirely different content here"),
      (4L, "g1", small))                       // other bucket: never paired
      .toDF("doc_id", "source", "text")
    val pairs = Dedup.containmentPairs(docs, "source", "text", "doc_id",
        n = 2, minContainment = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(pairs.head._3 === 1.0) // every 2-shingle of doc 1 is in doc 2
    // the same pair's Jaccard is tiny — the class containment exists for
    val jac = Dedup.verifyPairs(
      Seq((1L, 2L)).toDF("doc_a", "doc_b"), docs, "text", "doc_id",
      threshold = 0.0, n = 2).select("jaccard").as[Double].head()
    assert(jac < 0.15, s"jaccard $jac")
    // empty docs divide 0/0 -> NaN and must never surface as pairs
    val withEmpty = Seq((1L, "g0", ""), (2L, "g0", "")).toDF("doc_id", "source", "text")
    assert(Dedup.containmentPairs(withEmpty, "source", "text", "doc_id").count() === 0L)
  }

  test("winnowNearDups finds verbatim substring reuse; maxDf drops template text") {
    import spark.implicits._
    val sharedRun = "the quick brown fox jumps over the lazy dog near the river bank today"
    val template = "copyright notice all rights reserved contact us at example dot com"
    val docs = Seq(
      (1L, s"alpha beta $sharedRun gamma delta unique one"),
      (2L, s"$sharedRun totally different continuation zzz"),
      (3L, "nothing in common with anyone qqq www eee rrr ttt yyy"),
      // 4..30: the template line appears in MANY docs — its fingerprints
      // exceed maxDf and must not produce pairs on their own
      (4L, s"doc four $template"),
      (5L, s"doc five $template")) ++
      (6L to 30L).map(i => (i, s"doc number $i $template"))
    val pairs = Dedup.winnowNearDups(docs.toDF("doc_id", "text"), "text", "doc_id",
        k = 8, w = 4, maxDf = 20, minShared = 5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))          // the long shared run is caught
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // no spurious pair
    // template-only overlap produces NO pairs: its fingerprints have df=27 > maxDf
    assert(!pairs.exists(p => p._1 >= 4L))
  }

  test("winnowNearDups pair generation == posting self-join derivation") {
    import spark.implicits._
    import graft.functions.{Text, TextKernels}
    val docs = Registry.table(spark, sf0001, "documents")
    val fast = Dedup.winnowNearDups(docs, "text", "doc_id")
      .select("doc_a", "doc_b", "n_shared").as[(Long, Long, Long)].collect().toSet
    // reference: explode postings, df-filter, self-join on fingerprint
    val posts = docs.select(col("doc_id"),
        explode(TextKernels.winnowFingerprints(
          Text.normalize(col("text")), 8, 4)).as("fp"))
    val rare = posts.groupBy("fp").count().filter(col("count") <= 20).select("fp")
    val filtered = posts.join(rare, "fp")
    val ref = filtered.as("a")
      .join(filtered.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 5)
      .select("doc_a", "doc_b", "n_shared").as[(Long, Long, Long)].collect().toSet
    assert(fast === ref)
    assert(fast.nonEmpty)
  }

  test("incremental winnow ingest: batch union == from-scratch (stable valve)") {
    import spark.implicits._
    val corpus = Registry.table(spark, sf0001, "documents")
    val batch1 = corpus.filter(col("doc_id") % 2 === 0)
    val batch2 = corpus.filter(col("doc_id") % 2 =!= 0)
    // maxDf far above any fingerprint's df on this corpus slice → the valve
    // never binds, so no df can CROSS it between batches (the identity
    // precondition); minShared matches the default operating point
    val full = Dedup.winnowNearDups(corpus, "text", "doc_id", maxDf = 100000)
      .as[(Long, Long, Long)].collect().toSet
    val empty = Dedup.winnowPostings(corpus.limit(0), "text", "doc_id")
    val inc1 = Dedup.winnowNearDupsAgainst(batch1, empty, "text", "doc_id",
      maxDf = 100000).as[(Long, Long, Long)].collect().toSet
    val posts1 = Dedup.winnowPostings(batch1, "text", "doc_id")
    val inc2 = Dedup.winnowNearDupsAgainst(batch2, posts1, "text", "doc_id",
      maxDf = 100000).as[(Long, Long, Long)].collect().toSet
    assert((inc1 ++ inc2) === full)
    assert(inc1.intersect(inc2).isEmpty) // each pair scored exactly once
    assert(full.nonEmpty)
  }

  test("incremental winnow ingest: valve drift is the documented divergence") {
    import spark.implicits._
    val template = "copyright notice all rights reserved contact us at example dot com"
    // batch 1: template in 15 docs → df = 15 <= maxDf=20, pairs EMITTED
    val batch1 = (1L to 15L).map(i => (i, s"doc number $i $template")).toDF("doc_id", "text")
    // batch 2: 15 more → df = 30 > maxDf, from-scratch drops the template
    val batch2 = (16L to 30L).map(i => (i, s"doc number $i $template")).toDF("doc_id", "text")
    val empty = Dedup.winnowPostings(batch1.limit(0), "text", "doc_id")
    val inc1 = Dedup.winnowNearDupsAgainst(batch1, empty, "text", "doc_id")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val inc2 = Dedup.winnowNearDupsAgainst(batch2,
        Dedup.winnowPostings(batch1, "text", "doc_id"), "text", "doc_id")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val full = Dedup.winnowNearDups(batch1.unionByName(batch2), "text", "doc_id")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(full.isEmpty)      // from-scratch: template df=30 > 20, no pairs
    assert(inc1.nonEmpty)     // batch 1 scored under its ingest-time valve
    assert(inc2.isEmpty)      // batch 2 already sees df=30 > maxDf
    // the divergence is exactly the batch-1 pairs — one-directional drift
    assert((inc1 ++ inc2) -- full === inc1)
  }

  test("winnow plans: fingerprinting is shuffle-free; pairs never self-join postings") {
    import graft.functions.{Text, TextKernels}
    val docs = Registry.table(spark, sf0001, "documents")
    // the q95 shape: kernel + array aggregates in one map-side projection
    val fpPlan = docs.select(col("doc_id"),
        TextKernels.winnowFingerprints(Text.normalize(col("text")), 8, 4).as("fps"))
      .select(col("doc_id"), size(col("fps")).as("n_fp"))
      .queryExecution.executedPlan.toString
    assert(!fpPlan.contains("Exchange"), fpPlan)
    // the q96 shape: pair generation must come from bounded posting arrays
    // (Generate over collect_set output), never a posting self-join — no
    // sort-merge/cartesian pair explosion can appear in the plan
    val ndPlan = Dedup.winnowNearDups(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!ndPlan.contains("CartesianProduct"), ndPlan)
    assert(!ndPlan.contains("SortMergeJoin"), ndPlan)
    // exactly one join: postings ⨝ the df-filtered rare-fp set
    assert("(?i)join".r.findAllMatchIn(ndPlan).size >= 1)
    assert(ndPlan.contains("collect_set"), ndPlan)
  }

  test("canonicalLabels on an empty pair set leaves every doc its own canon") {
    val ids = (1L to 4L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val out = Dedup.collapseToCanonical(ids, pairs, "doc_id")
      .select("doc_id", "canonical_id").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }
}
