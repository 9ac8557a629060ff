package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text._

/** Deduplication operators for large-scale corpus curation (north star).
  *
  * Scale design:
  *  - exact dedup = one shuffle on a 16-byte fingerprint (uniform ⇒ no skew);
  *  - MinHash-LSH = explode to (band, doc) pairs → groupBy band → pairs only
  *    within buckets → Jaccard verify; candidate generation is linear in
  *    corpus size + bucket-quadratic (tunable via bands/rows), never globally
  *    quadratic;
  *  - SimHash = fingerprint per doc, near-dup = same-key join on rotated
  *    fingerprint bands (hamming-adjacent buckets);
  *  - cluster collapse resolves TRUE connected components over the verified
  *    pair graph (min-label propagation with pointer doubling, O(log D)
  *    rounds) — the iteration runs only on the pair graph, which at 100 TB
  *    is tiny relative to the corpus, never on the corpus itself.
  */
object Dedup {

  /** Exact dedup on normalized text: keeps the lowest `idCol` per
    * fingerprint group. Deterministic (no arbitrary dropDuplicates pick). */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    df.withColumn("__fp", fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** Per-document MinHash signature columns mh_0..mh_{k-1} over word
    * n-shingles of the normalized text. */
  def withMinhash(df: DataFrame, textCol: String, n: Int = 3, k: Int = 6): DataFrame = {
    val withToks = df.withColumn("__toks", tokens(col(textCol)))
    val sigs = (0 until k).map(j =>
      graft.functions.TextKernels.minhashHex(col("__toks"), n, j).as(s"mh_$j"))
    withToks.select((df.columns.map(col).toSeq ++ sigs): _*)
  }

  /** LSH band keys band_0..band_{bands-1}: md5 over `rows` consecutive
    * minhash values. Docs sharing ANY band key are near-dup candidates. */
  def withBands(sig: DataFrame, bands: Int, rows: Int): DataFrame =
    (0 until bands).foldLeft(sig) { (acc, b) =>
      val parts = (b * rows until (b + 1) * rows).map(j => col(s"mh_$j"))
      acc.withColumn(s"band_$b", md5(concat_ws("|", parts: _*)))
    }

  /** Exploded LSH signature table — one (doc, band_no, band_key) row per
    * band per document. THIS is the relation a 100 TB deployment writes at
    * ingest (partitioned/bucketed by band_key) so later batches dedup
    * against it without re-hashing the corpus ([[minhashCandidatesAgainst]]).
    */
  def signatureTable(
      df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, bands: Int = 3, rows: Int = 2): DataFrame = {
    val banded = withBands(withMinhash(df, textCol, n, bands * rows), bands, rows)
    val bandCols = (0 until bands).map(b =>
      struct(lit(b).as("band_no"), col(s"band_$b").as("band_key")))
    banded
      .select(col(idCol).as("doc"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc"), col("bk.band_no"), col("bk.band_key"))
  }

  /** MinHash-LSH candidate pairs (idA < idB), deduplicated across bands.
    * Pipeline: signature → bands → explode(band) → self-join per bucket. */
  def minhashCandidates(
      df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, bands: Int = 3, rows: Int = 2,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val exploded = scope.persist(signatureTable(df, textCol, idCol, n, bands, rows))
      // materialize once: a self-join's two sides don't share work (no
      // exchange to reuse under a broadcast join), so without this the
      // whole minhash pipeline runs twice. At warehouse scale this is a
      // written signature table rather than a cache; release via `scope`.
    val a = exploded.as("a"); val b = exploded.as("b")
    a.join(b, col("a.band_no") === col("b.band_no") &&
        col("a.band_key") === col("b.band_key") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()
  }

  /** Incremental-ingest candidates: pairs touching the NEW batch only —
    * new×existing and new×new, never existing×existing. `existingSigs` is a
    * previously written [[signatureTable]]; the old corpus is NOT re-hashed
    * and (at scale, with both sides bucketed by band_key) not even
    * re-shuffled. Emits (doc_a < doc_b) like [[minhashCandidates]], so
    * running it per batch and unioning reproduces exactly the full-corpus
    * candidate set. */
  def minhashCandidatesAgainst(
      newDf: DataFrame, existingSigs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, bands: Int = 3, rows: Int = 2,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val newSigs = scope.persist(signatureTable(newDf, textCol, idCol, n, bands, rows))
    val a = newSigs.as("a")
    val b = existingSigs.unionByName(newSigs).as("b")
    a.join(b, col("a.band_no") === col("b.band_no") &&
        col("a.band_key") === col("b.band_key") && col("a.doc") =!= col("b.doc"))
      .select(least(col("a.doc"), col("b.doc")).as("doc_a"),
        greatest(col("a.doc"), col("b.doc")).as("doc_b"))
      .distinct()
  }

  /** True n-gram Jaccard verification over an EXPLICIT candidate pair set
    * (doc_a, doc_b) — the second half of [[minhashNearDups]], exposed on
    * its own because the incremental-ingest path needs it too: candidates
    * from [[minhashCandidatesAgainst]] verify against the accumulated
    * corpus exactly like full-corpus candidates do. Joins shingles onto
    * candidates only — never all pairs. */
  def verifyPairs(cands: DataFrame, df: DataFrame, textCol: String,
      idCol: String, threshold: Double, n: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("__id"),
      array_distinct(shingles(col(textCol), n)).as("__sh"))
    cands
      .join(sh.as("sa"), col("doc_a") === col("sa.__id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.__id"))
      .withColumn("jaccard",
        size(array_intersect(col("sa.__sh"), col("sb.__sh"))).cast("double") /
          size(array_union(col("sa.__sh"), col("sb.__sh"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Shingle-CONTAINMENT near-dup pairs: containment = |A∩B| / min(|A|,|B|)
    * catches a document quoted wholesale inside a larger one — the pair
    * class Jaccard structurally misses (|A∩B|/|A∪B| stays small whenever
    * |B| ≫ |A|, no matter how completely A is contained). The standard
    * companion signal to Jaccard in corpus dedup: quote-expansion,
    * boilerplate-wrapped reposts, doc-plus-appendix.
    *
    * Scale shape: identical to the q25 Jaccard plan — bucketed self-join
    * (bucket = an LSH band key at scale), shingles hashed ONCE per side to
    * sorted 60-bit longs, the codegen'd two-pointer [[graft.functions
    * .ArrayOps.sortedIntersectCount]] kernel per pair, min taken from the
    * two stored sizes. Per-bucket quadratic, never global. */
  def containmentPairs(df: DataFrame, bucketCol: String, textCol: String,
      idCol: String, n: Int = 2, minContainment: Double = 0.9): DataFrame = {
    import graft.functions.ArrayOps._
    val d = df
      .withColumn("__toks", tokens(col(textCol)))
      .select(col(idCol), col(bucketCol),
        sortedShingleHashesOfTokens(col("__toks"), n).as("__sh"))
      .withColumn("__nsh", size(col("__sh")))
    // probe-side parallelism (the q25 fix): a single-file, single-row-group
    // corpus scans as ONE task, and the broadcast self-join fuses the whole
    // pairwise kernel into it. The explicit-count repartition spreads the
    // probe across the cluster; scale-safe for this shape — a broadcast
    // self-join's side fits in a broadcast by construction, so the
    // exchange is bounded and the per-pair kernel dominates it.
    val a = d.repartition(
      df.sparkSession.sparkContext.defaultParallelism, col(idCol)).as("a")
    val b = d.as("b")
    a.join(b, col(s"a.$bucketCol") === col(s"b.$bucketCol") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("__ni", sortedIntersectCount(col("a.__sh"), col("b.__sh")))
      // an empty shingle set divides 0/0 → NaN (IEEE doubles, both engines)
      // and the filter drops it — an empty doc is "contained" in nothing
      .withColumn("containment",
        col("__ni").cast("double") /
          least(col("a.__nsh"), col("b.__nsh")).cast("double"))
      .filter(col("containment") >= minContainment)
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"),
        col("containment"))
  }

  /** Containment scoring over an EXPLICIT candidate pair set (doc_a,
    * doc_b) — the [[verifyPairs]] analogue for containment, so candidates
    * from LSH bands ([[minhashCandidates]] / [[simhashCandidates]]) can be
    * scored without any bucketed self-join: THIS composition (band-keyed
    * candidates → containment verify) is the 100 TB plan, where
    * [[containmentPairs]]' explicit bucket column is the small-corpus
    * convenience. Shingles are hashed once per side to sorted 60-bit longs
    * and intersected with the codegen'd two-pointer kernel; min comes from
    * the two stored sizes. Cost is linear in the candidate count. */
  def containmentOverPairs(cands: DataFrame, df: DataFrame, textCol: String,
      idCol: String, n: Int = 2, minContainment: Double = 0.9): DataFrame = {
    import graft.functions.ArrayOps._
    val sh = df
      .withColumn("__toks", tokens(col(textCol)))
      .select(col(idCol).as("__id"),
        sortedShingleHashesOfTokens(col("__toks"), n).as("__sh"))
      .withColumn("__nsh", size(col("__sh")))
    cands
      .join(sh.as("sa"), col("doc_a") === col("sa.__id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.__id"))
      .withColumn("__ni", sortedIntersectCount(col("sa.__sh"), col("sb.__sh")))
      // an empty shingle set divides 0/0 → NaN and the filter drops it
      .withColumn("containment",
        col("__ni").cast("double") /
          least(col("sa.__nsh"), col("sb.__nsh")).cast("double"))
      .filter(col("containment") >= minContainment)
      .select(col("doc_a"), col("doc_b"), col("containment"))
  }

  /** Winnowing-fingerprint near-dup pairs — the MOSS composition
    * (Schleimer et al.): documents sharing ≥ `minShared` winnowed
    * rolling-hash fingerprints ([[graft.functions.TextKernels
    * .winnowFingerprints]], character `k`-grams, window `w`). Catches
    * verbatim substring reuse (quotes, mirrored passages, boilerplate-
    * wrapped reposts) at CHARACTER granularity — the signal word-shingle
    * Jaccard blurs and SimHash averages away.
    *
    * Scale shape: fingerprints explode map-side, ONE shuffle groups
    * postings by fingerprint VALUE (the join key is the fingerprint — same
    * family as the MinHash band-bucket plan), and pairs are generated
    * inside each posting array, then re-aggregated by pair. `maxDf` is
    * the boilerplate/skew valve, and it is Schleimer's own common-code
    * elimination: a fingerprint present in more than `maxDf` documents
    * carries no near-dup signal (it is template text) AND would fan out
    * quadratically. Crucially the valve runs BEFORE anything collects:
    * document frequency is a partial-aggregated COUNT (constant memory per
    * key — a df=10⁹ boilerplate fingerprint costs one counter, never a
    * 10⁹-element buffer), hot fingerprints are dropped by that count, and
    * only then do the surviving postings collect into arrays — which are
    * ≤ `maxDf` elements BY CONSTRUCTION. The shuffle on __fp is reused
    * across the count and the join (ReusedExchange), and the join output
    * is already hash-partitioned by __fp, so the collect groupBy adds no
    * exchange. */
  def winnowNearDups(df: DataFrame, textCol: String, idCol: String,
      k: Int = 8, w: Int = 4, maxDf: Int = 20, minShared: Int = 5): DataFrame = {
    val posts = winnowPostings(df, textCol, idCol, k, w)
    posts.join(rareFingerprints(posts, maxDf), "__fp")
      .groupBy(col("__fp"))
      .agg(array_sort(collect_set(col("__doc"))).as("__docs"))
      // all i<j pairs of the sorted posting array, generated in-plan
      .select(explode(flatten(transform(col("__docs"), (x, i) =>
        transform(
          slice(col("__docs"), i + lit(2), size(col("__docs")) - i - lit(1)),
          y => struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Winnow posting table — one (__doc, __fp) row per distinct fingerprint
    * per document; the winnow analogue of [[signatureTable]] /
    * [[simhashBanded]] for write-at-ingest incremental dedup: materialize
    * it once per batch at ingest and the corpus text is never re-hashed.
    * (k, w) must match between the stored table and later
    * [[winnowNearDupsAgainst]] calls. */
  def winnowPostings(df: DataFrame, textCol: String, idCol: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    import graft.functions.TextKernels
    df.select(col(idCol).as("__doc"),
      explode(TextKernels.winnowFingerprints(normalize(col(textCol)), k, w))
        .as("__fp"))
  }

  /** The df valve as a standalone relation: fingerprints whose document
    * frequency over `posts` lies in [2, maxDf]. COUNT is sum-aggregatable
    * (O(1) memory per key) — the valve never materializes a posting list,
    * so it is safe to evaluate over a 100 TB posting table. */
  private def rareFingerprints(posts: DataFrame, maxDf: Int): DataFrame =
    posts.groupBy(col("__fp"))
      .agg(count(lit(1)).as("__df"))
      // df < 2 → no pairs; df > maxDf → template fingerprint, dropped
      .filter(col("__df").between(2, maxDf))
      .select(col("__fp"))

  /** Incremental-ingest winnow near-dups: pairs TOUCHING THE NEW BATCH only
    * (new×existing ∪ new×new, never existing×existing), scored against the
    * accumulated posting table — the corpus is never re-fingerprinted, the
    * same ingest shape as [[minhashCandidatesAgainst]] /
    * [[simhashCandidatesAgainst]].
    *
    * The df valve is evaluated over the FULL union at call time, so each
    * batch's pairs carry the valve state of their ingest moment. Batch-wise
    * union equals the from-scratch [[winnowNearDups]] whenever no
    * fingerprint's document frequency CROSSES maxDf between batches (the
    * lower edge is always safe: a pair exists only once its second document
    * arrives, and that batch scores it). A boilerplate fingerprint that
    * crosses maxDf only after earlier batches were scored retroactively
    * over-counts those batches' n_shared — the inherent drift of any
    * global-frequency valve under streaming ingest; remedies are a
    * periodic full re-score or a deliberately conservative maxDf at
    * ingest. DedupSpec pins both the identity and the drift case. */
  def winnowNearDupsAgainst(newDf: DataFrame, existingPosts: DataFrame,
      textCol: String, idCol: String,
      k: Int = 8, w: Int = 4, maxDf: Int = 20, minShared: Int = 5,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val newPosts = scope.persist(winnowPostings(newDf, textCol, idCol, k, w))
    val allPosts = existingPosts.unionByName(newPosts)
    val rare = rareFingerprints(allPosts, maxDf)
    val a = newPosts.join(rare, "__fp").as("a")
    val b = allPosts.join(rare, "__fp").as("b")
    a.join(b, col("a.__fp") === col("b.__fp") && col("a.__doc") =!= col("b.__doc"))
      .select(least(col("a.__doc"), col("b.__doc")).as("doc_a"),
        greatest(col("a.__doc"), col("b.__doc")).as("doc_b"),
        col("a.__fp").as("__fp"))
      // a new×new pair arrives in both orders — dedupe (pair, fp) before
      // counting so each shared fingerprint contributes exactly once
      .distinct()
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Cross-table fuzzy join (entity resolution / record linkage): each
    * left row matched to the right rows whose normalized n-gram shingle
    * sets (a) collide in at least one MinHash LSH band and (b) verify at
    * exact Jaccard ≥ threshold. STRICTLY left×right — no within-table
    * pairs, and the two id spaces never mix (ids may even collide across
    * tables: each side's shingles join back by its OWN id). The linkage
    * join a curation pipeline needs where no equality key exists —
    * scraped metadata ↔ documents, catalog titles ↔ crawl pages.
    *
    * Scale shape: both sides band independently ([[signatureTable]] — the
    * write-at-ingest artifact, so a stored corpus is never re-hashed to
    * join a new catalog against it), candidates come from ONE equi-join
    * on (band_no, band_key) — never |L|×|R| — and the Jaccard verify is
    * linear in candidates. Same plan family as [[minhashCandidates]] with
    * the self-join replaced by the two-table join. */
  def fuzzyJoin(left: DataFrame, right: DataFrame, textCol: String,
      idCol: String, threshold: Double, n: Int = 3, bands: Int = 3,
      rows: Int = 2, scope: CacheScope = CacheScope.unmanaged): DataFrame =
    fuzzyJoinSigs(
      scope.persist(signatureTable(left, textCol, idCol, n, bands, rows)), left,
      scope.persist(signatureTable(right, textCol, idCol, n, bands, rows)), right,
      textCol, idCol, threshold, n)

  /** [[fuzzyJoin]] over PRE-COMPUTED signature tables — the at-scale form:
    * a stored corpus's [[signatureTable]] (written once at ingest) joins a
    * new catalog's signatures without the corpus ever being re-shingled
    * or re-hashed; only the verify step touches each side's text, and
    * only for candidate ids. `n` must match what the signatures were
    * built with (it also drives the verify shingles). */
  def fuzzyJoinSigs(sigL: DataFrame, left: DataFrame,
      sigR: DataFrame, right: DataFrame, textCol: String, idCol: String,
      threshold: Double, n: Int = 3): DataFrame = {
    val cands = sigL.as("a").join(sigR.as("b"),
        col("a.band_no") === col("b.band_no") &&
          col("a.band_key") === col("b.band_key"))
      .select(col("a.doc").as("left_id"), col("b.doc").as("right_id"))
      .distinct()
    def sh(df: DataFrame) = df.select(col(idCol).as("__id"),
      array_distinct(shingles(col(textCol), n)).as("__sh"))
    cands
      .join(sh(left).as("sa"), col("left_id") === col("sa.__id"))
      .join(sh(right).as("sb"), col("right_id") === col("sb.__id"))
      .withColumn("jaccard",
        size(array_intersect(col("sa.__sh"), col("sb.__sh"))).cast("double") /
          size(array_union(col("sa.__sh"), col("sb.__sh"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("left_id"), col("right_id"), col("jaccard"))
  }

  /** Best-match form of [[fuzzyJoinSigs]] — record linkage usually wants
    * THE best right-side match per left row (or the k best), not every
    * pair above the threshold. Candidates and the Jaccard verify are the
    * exact [[fuzzyJoinSigs]] plan; the head is one grouped bounded-heap
    * aggregation ([[TopKByScore]]): partial buffers carry ≤ k pairs per
    * left id per task, so the shuffle after the verify moves k·tasks rows
    * per left row instead of every qualifying pair — the full pair set is
    * never materialized, sorted, or windowed. Ties break deterministically
    * (jaccard desc, then right_id asc — the heap's eviction order), the
    * same order a `row_number() OVER (PARTITION BY left_id ORDER BY
    * jaccard DESC, right_id)` oracle produces.
    *
    * Id contract: unlike [[fuzzyJoinSigs]] (id-type-agnostic), the
    * bounded heap is typed on integral ids — `idCol` must be an integral
    * column on BOTH sides (checked up front; narrower integrals are
    * widened to long in the output). */
  def fuzzyJoinBestSigs(sigL: DataFrame, left: DataFrame,
      sigR: DataFrame, right: DataFrame, textCol: String, idCol: String,
      threshold: Double, n: Int = 3, k: Int = 1): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    Seq("left" -> left, "right" -> right).foreach { case (side, df) =>
      val dt = df.schema(idCol).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"fuzzyJoinBest needs an integral $idCol (the TopKByScore heap is " +
          s"typed on long ids); $side side has ${dt.simpleString} — " +
          "use fuzzyJoinSigs for arbitrary id types")
    }
    fuzzyJoinSigs(sigL, left, sigR, right, textCol, idCol, threshold, n)
      .select(col("left_id").cast("long"), col("right_id").cast("long"),
        col("jaccard"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues { case (_, rid, j) => ScoredId(rid, j) }
      .agg(new TopKByScore(k).toColumn.name("topk"))
      .toDF("left_id", "topk")
      .select(col("left_id"), posexplode(col("topk")))
      .select(col("left_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("right_id"), col("col.score").as("jaccard"))
  }

  /** [[fuzzyJoinBestSigs]] with signatures derived in-flight (the
    * convenience form mirroring [[fuzzyJoin]]). */
  def fuzzyJoinBest(left: DataFrame, right: DataFrame, textCol: String,
      idCol: String, threshold: Double, n: Int = 3, bands: Int = 3,
      rows: Int = 2, k: Int = 1,
      scope: CacheScope = CacheScope.unmanaged): DataFrame =
    fuzzyJoinBestSigs(
      scope.persist(signatureTable(left, textCol, idCol, n, bands, rows)), left,
      scope.persist(signatureTable(right, textCol, idCol, n, bands, rows)), right,
      textCol, idCol, threshold, n, k)

  /** Verified near-dup pairs: LSH candidates filtered by true n-gram
    * Jaccard ≥ threshold (computed only on candidates). */
  def minhashNearDups(
      df: DataFrame, textCol: String, idCol: String,
      threshold: Double, n: Int = 3, bands: Int = 3, rows: Int = 2,
      scope: CacheScope = CacheScope.unmanaged): DataFrame =
    verifyPairs(minhashCandidates(df, textCol, idCol, n, bands, rows, scope),
      df, textCol, idCol, threshold, n)

  /** `bits`-wide SimHash fingerprint column (md5 hex-digit bit voting over
    * whitespace tokens — the exact semantics the oracle reproduces), as the
    * one-pass codegen'd kernel. Prefix-stable: bits 0..31 of the 64-bit
    * fingerprint ARE the 32-bit fingerprint. */
  def simhash(text: Column, bits: Int): Column =
    graft.functions.SimHash.simhash(tokens(text), bits)

  /** 32-bit SimHash fingerprint column (kept for compact-fingerprint use;
    * banding should prefer 64-bit — see [[simhashCandidates]]). */
  def simhash32(text: Column): Column = simhash(text, 32)

  /** Reference formulation via composed expressions (one md5 per token PER
    * BIT — 32× the hashing; kept only to cross-check the kernel in tests). */
  def simhash32Ref(text: Column): Column = {
    val toks = tokens(text)
    (0 until 32).map { b =>
      val pos = b / 4 + 1
      val shift = b % 4
      val votes = aggregate(toks, lit(0L), (acc, t) => {
        val digit = conv(substring(md5(t), pos, 1), 16, 10).cast("int")
        val bit = shiftright(digit, shift) % 2
        acc + (bit * 2 - 1)
      })
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Sentinel `subBits` value: derive the band-key width from the corpus
    * size at call time via [[autoSubBits]] (costs one count job). */
  val AutoBand: Int = -1

  /** Expected-docs-per-bucket target [[autoSubBits]] sizes the band key for. */
  val SimhashTargetOccupancy: Long = 4096L

  /** Borrowed-bit count that keeps expected per-band bucket occupancy ≤
    * `targetOccupancy` for an `n`-doc corpus: ⌈log₂⌈n / target⌉⌉, computed in
    * exact integer arithmetic (2^i < ratio counting — no float log at power-
    * of-two edges), clamped to [0, width]. The clamp matters twice: the
    * borrowed window [band·width, band·width + width + subBits) then never
    * spills past the FOLLOWING band, so band-key equality stays exactly
    * "exact band equal AND borrowed window equal" (the decomposition the SQL
    * oracle and the q66 containment proof rely on); and width+subBits ≤
    * 2·width ≤ 63 keeps the key a positive Long.
    *
    * Why size by n/target and not by uniform occupancy n/2^width: fingerprint
    * keys are NOT uniform — similar corpora cluster (the measured sf1.0
    * exponent of the fixed 16-bit default was 1.32) — so the key space must
    * grow WITH the corpus. With 2^subBits ∝ n, per-bucket pair work
    * O(n²/(2^width·2^subBits)) is O(n): the banding stays linear at any scale
    * without a manual dial. */
  def autoSubBits(n: Long, width: Int,
      targetOccupancy: Long = SimhashTargetOccupancy): Int = {
    require(targetOccupancy > 0, "targetOccupancy must be positive")
    val ratio = (n + targetOccupancy - 1) / targetOccupancy
    val sub = (0 until 47).count(i => (1L << i) < ratio)
    math.min(math.min(sub, width), 63 - width)
  }

  private def resolveSubBits(subBits: Int, bits: Int, bands: Int,
      n: => Long): Int = {
    require(subBits >= 0 || subBits == AutoBand,
      s"subBits must be >= 0 or Dedup.AutoBand, got $subBits")
    if (subBits == AutoBand) autoSubBits(n, bits / bands) else subBits
  }

  /** One fingerprint row (doc, sim) per document. */
  private def simhashSims(df: DataFrame, textCol: String, idCol: String,
      bits: Int): DataFrame =
    df.select(col(idCol).as("doc"), simhash(col(textCol), bits).as("sim"))

  /** SimHash near-dup candidates: docs whose fingerprints share at least one
    * of `bands` (bits/bands)-wide bands (≈ hamming-distance tolerance
    * without an O(n²) scan).
    *
    * Scale: bucket count per band is 2^(bits/bands), so candidate pairs grow
    * O(n² / 2^(bits/bands)). The 64-bit/4-band default gives 65,536 keys per
    * band; the old 32-bit/4-band shape (256 keys) is bucket-quadratic at
    * warehouse scale — callers wanting the compact fingerprint can still ask
    * for it explicitly. `subBits > 0` additionally splits every bucket by
    * that many bits borrowed from the NEXT band's range (wrapping): bucket
    * sizes shrink 2^subBits× at the cost of recall (pairs that differ in a
    * borrowed bit are dropped) — the hot-bucket safety valve for corpora
    * whose fingerprints cluster. The default `subBits = AutoBand` derives
    * that width from the corpus size ([[autoSubBits]]; one count job over
    * the cached fingerprints), so the default path stays linear at any scale
    * with no manual dial; pass an explicit value (0 = exact banding) to pin
    * the historical behavior. */
  def simhashCandidates(df: DataFrame, textCol: String, idCol: String,
      bits: Int = 64, bands: Int = 4, subBits: Int = AutoBand,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val sims = scope.persist(simhashSims(df, textCol, idCol, bits))
    val sub = resolveSubBits(subBits, bits, bands, sims.count())
    val exploded = bandFromSims(sims, bits, bands, sub)
    val a = exploded.as("a"); val b = exploded.as("b")
    a.join(b, col("a.band_no") === col("b.band_no") &&
        col("a.band_key") === col("b.band_key") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        col("a.sim").as("sim_a"), col("b.sim").as("sim_b"))
      .distinct()
  }

  /** Exploded SimHash band table — one (doc, sim, band_no, band_key) row
    * per band per document; the simhash analogue of [[signatureTable]] for
    * write-at-ingest incremental dedup. Band b covers fingerprint bits
    * [b·width, (b+1)·width + subBits) wrapping at `bits` (rotation so the
    * borrowed high bits exist even for the last band); unsigned shifts keep
    * a sign-bit-set fingerprint from smearing into the borrowed positions.
    * With an explicit `subBits`, parameters must match between the stored
    * table and later [[simhashCandidatesAgainst]] calls; under the default
    * `AutoBand` the width is derived from THIS frame's row count (one count
    * job) and later auto-width Against calls re-band from the stored `sim`
    * column, so a frozen key width never goes stale. */
  def simhashBanded(df: DataFrame, textCol: String, idCol: String,
      bits: Int = 64, bands: Int = 4, subBits: Int = AutoBand): DataFrame = {
    val sub = resolveSubBits(subBits, bits, bands, df.count())
    bandFromSims(simhashSims(df, textCol, idCol, bits), bits, bands, sub)
  }

  /** Band-explode a (doc, sim) fingerprint frame — the shared kernel behind
    * [[simhashBanded]] and the auto-width paths (which must band ALREADY
    * computed fingerprints after a count decided the key width). */
  private def bandFromSims(withSim: DataFrame,
      bits: Int, bands: Int, subBits: Int): DataFrame = {
    require(bands >= 2 && bits % bands == 0,
      s"bits ($bits) must split evenly across bands ($bands)")
    val width = bits / bands
    require(width + subBits <= 63, "band key must fit in a positive Long")
    val mask = (1L << (width + subBits)) - 1
    def rotated(b: Int): Column = {
      val lo = b * width
      val base = shiftrightunsigned(col("sim"), lo)
      val wrapped = if (lo == 0) base
        else base.bitwiseOR(shiftleft(col("sim"), bits - lo))
      wrapped.bitwiseAND(lit(mask))
    }
    val bandCols = (0 until bands).map(b =>
      struct(lit(b).as("band_no"), rotated(b).as("band_key")))
    withSim.select(col("doc"), col("sim"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("doc"), col("sim"), col("bk.band_no"), col("bk.band_key"))
  }

  /** Incremental-ingest SimHash candidates: new×existing ∪ new×new, never
    * existing×existing — same batch-union identity as
    * [[minhashCandidatesAgainst]] (per-batch runs unioned reproduce the
    * full-corpus [[simhashCandidates]] set) when `subBits` is pinned
    * explicitly across every batch AND the stored table.
    *
    * Under the default `subBits = AutoBand`, the key width is re-derived
    * from the CURRENT total corpus (stored docs + new batch) and the stored
    * rows are RE-banded from their `sim` column at that width — the stored
    * `band_key` (frozen at some earlier, possibly narrower width) is
    * ignored, so mixed-vintage tables stay consistent. Because earlier
    * (smaller-corpus) batches banded with fewer borrowed bits, the union of
    * auto-width incremental runs is a SUPERSET of the from-scratch
    * auto-width set, converging as the corpus stops growing; pin subBits at
    * ingest time if the exact identity is required. */
  def simhashCandidatesAgainst(
      newDf: DataFrame, existingSigs: DataFrame, textCol: String, idCol: String,
      bits: Int = 64, bands: Int = 4, subBits: Int = AutoBand,
      scope: CacheScope = CacheScope.unmanaged): DataFrame =
    if (subBits == AutoBand) {
      val newSims = scope.persist(simhashSims(newDf, textCol, idCol, bits))
      // one fingerprint row per stored doc: band 0 exists for every banding
      val existingSims = existingSigs
        .filter(col("band_no") === 0).select(col("doc"), col("sim"))
      val sub = autoSubBits(newSims.count() + existingSims.count(), bits / bands)
      val newSigs = bandFromSims(newSims, bits, bands, sub)
      againstJoin(newSigs,
        bandFromSims(existingSims, bits, bands, sub).unionByName(newSigs))
    } else {
      val newSigs = scope.persist(
        simhashBanded(newDf, textCol, idCol, bits, bands, subBits))
      againstJoin(newSigs, existingSigs.unionByName(newSigs))
    }

  /** new×(existing ∪ new) band join with pair normalization — shared by both
    * [[simhashCandidatesAgainst]] key-width paths. */
  private def againstJoin(newSigs: DataFrame, allSigs: DataFrame): DataFrame = {
    val a = newSigs.as("a"); val b = allSigs.as("b")
    a.join(b, col("a.band_no") === col("b.band_no") &&
        col("a.band_key") === col("b.band_key") && col("a.doc") =!= col("b.doc"))
      .select(least(col("a.doc"), col("b.doc")).as("doc_a"),
        greatest(col("a.doc"), col("b.doc")).as("doc_b"),
        when(col("a.doc") < col("b.doc"), col("a.sim")).otherwise(col("b.sim")).as("sim_a"),
        when(col("a.doc") < col("b.doc"), col("b.sim")).otherwise(col("a.sim")).as("sim_b"))
      .distinct()
  }

  /** Line-level dedup across the corpus (the CCNet/RefinedWeb boilerplate
    * pass): a line occurring in ≥ `minDocs` DISTINCT documents is removed
    * from EVERY document; remaining lines are reassembled in their original
    * order. Cookie banners, nav bars, and license footers repeat across
    * pages while real prose does not — this removes them without touching
    * whole-document dedup.
    *
    * Scale shape: explode to (doc, pos, line) → one aggregation on the line
    * for the document-frequency (a viral line is NOT a hot reducer: the
    * countDistinct rewrite first partials by (line, doc), spreading its
    * occurrences, and the final count receives pre-deduped pairs) →
    * left-anti join back →
    * one aggregation on the doc id to reassemble (order restored by
    * sorting (pos, line) structs inside the group, so collect_list's
    * nondeterministic order never shows). Every doc survives — a fully
    * boilerplate document comes back as the empty string, keeping row
    * accounting intact — and BLANK lines are never boilerplate candidates
    * (a paragraph separator appears in every document; stripping it would
    * merge paragraphs corpus-wide). NULL text stays NULL. */
  def lineDedup(df: DataFrame, textCol: String, idCol: String,
      minDocs: Int = 2, sep: String = "\n"): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .toDF(idCol, "__pos", "__line")
    val boilerplate = lines
      .filter(length(col("__line")) > 0) // structure, not content
      .groupBy(col("__line"))
      .agg(countDistinct(col(idCol)).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select(col("__line"))
    val rebuilt = lines.join(boilerplate, Seq("__line"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line")), sep).as("__clean"))
    df.withColumn("__had_text", col(textCol).isNotNull)
      .drop(textCol)
      .join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol,
        when(col("__had_text"), coalesce(col("__clean"), lit(""))))
      .drop("__clean", "__had_text")
  }

  /** Canonical (connected-component-minimum) label for every doc appearing
    * in `pairs` (doc_a, doc_b): bounded min-label propagation with pointer
    * doubling, so a chain a–b–c resolves c to a, not to b — the attribution
    * a user joining dropped docs back to their representative depends on.
    *
    * Convergence: labels only decrease (min is monotone) and each round
    * both pulls the min over neighbors AND jumps one pointer level
    * (l ← l(l)), so component diameter D resolves in O(log D) rounds —
    * `maxIters` = 32 covers any graph that fits in storage. Each round is
    * two joins on the PAIRS graph (tiny relative to the corpus — only docs
    * with a verified near-dup appear), never on the corpus; the rounds run
    * over a localCheckpoint so the upstream pair-generation pipeline (LSH
    * self-join) executes exactly once and the returned frame stays valid
    * with no pinned cache to leak. */
  def canonicalLabels(pairs: DataFrame, maxIters: Int = 32): DataFrame = {
    // both edge orientations from ONE pass over `pairs`: the union form
    // (pairs ∪ pairs.swapped) plants the pair-generation subtree twice in
    // the plan, and the LSH self-join feeding it executed twice inside
    // this checkpoint — measured as the largest single cost in q74
    // (2.5 s/run at sf0.1, half of it the duplicate). explode keeps
    // row multiplicities identical to the union.
    val edges = pairs
      .select(explode(array(
        struct(col("doc_a").as("x"), col("doc_b").as("y")),
        struct(col("doc_b").as("x"), col("doc_a").as("y")))).as("__e"))
      .select(col("__e.x").as("x"), col("__e.y").as("y"))
      .localCheckpoint()
    var curChk = edges.groupBy(col("x"))
      .agg(least(col("x"), min(col("y"))).as("lbl"))
      .localCheckpoint()
    var cur = curChk
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      // pull: min label over neighbors
      val nbr = edges
        .join(cur.select(col("x").as("y"), col("lbl").as("ylbl")), Seq("y"))
        .groupBy(col("x")).agg(min(col("ylbl")).as("cand"))
      val pulled = cur.join(nbr, Seq("x"), "left")
        .select(col("x"),
          least(col("lbl"), coalesce(col("cand"), col("lbl"))).as("lbl"))
      // jump: l ← l(l) — labels are themselves node ids, so one self-join
      // halves the remaining chain depth
      val jumped = pulled
        .join(pulled.select(col("lbl").as("lbl2"), col("x").as("lbl")),
          Seq("lbl"), "left")
        .select(col("x"), coalesce(col("lbl2"), col("lbl")).as("lbl"))
      // fold the convergence comparison into the SAME materialization job
      // (a separate post-hoc join would double the per-round job count —
      // the rounds are all driver-side latency at small pair-graph sizes)
      val next = jumped
        .join(cur.select(col("x"), col("lbl").as("__old")), Seq("x"))
        .select(col("x"), col("lbl"), (col("lbl") < col("__old")).as("__changed"))
        .localCheckpoint()
      converged = next.filter(col("__changed")).isEmpty // checkpoint scan, limit-1
      releaseCheckpoint(curChk) // superseded round: next is materialized, free it
      curChk = next
      cur = next.select(col("x"), col("lbl"))
      iter += 1
    }
    releaseCheckpoint(edges)
    if (!converged)
      throw new IllegalStateException(
        s"canonicalLabels did not converge in $maxIters rounds — component " +
          "diameter exceeds 2^maxIters, which no physical pair graph does")
    cur
  }

  /** Drop a superseded localCheckpoint's blocks eagerly instead of waiting
    * for the ContextCleaner: during the label iteration only the newest
    * round is ever read again, so storage stays bounded at two label tables
    * regardless of round count. (The FINAL round's checkpoint is the
    * returned frame's physical data and is released by GC when the caller
    * drops it.) */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => () // not a materialized checkpoint — nothing to free
    }

  /** Benchmark decontamination (the GPT-3/PaLM discipline): flag every
    * corpus document sharing at least one word n-gram with a held-out
    * benchmark set, so evaluation data can be excised from training data.
    * Returns (idCol, n_contaminated_ngrams) for CONTAMINATED docs only —
    * left-anti join the result against the corpus to drop them.
    *
    * Scale shape: the benchmark is eval-set sized (thousands of docs, not
    * the corpus), so its distinct n-grams BROADCAST; the corpus side is a
    * map-side explode into a broadcast hash join plus one groupBy on the
    * doc id. The corpus is never shuffled by n-gram. `n` defaults to 13 —
    * the published decontamination window; small fixtures use smaller n. */
  def contaminated(docs: DataFrame, benchmark: DataFrame, textCol: String,
      idCol: String, n: Int = 13): DataFrame = {
    val benchGrams = benchmark
      .select(explode(shingles(col(textCol), n)).as("__g")).distinct()
    docs.select(col(idCol),
        explode(array_distinct(shingles(col(textCol), n))).as("__g"))
      .join(broadcast(benchGrams), Seq("__g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_contaminated_ngrams"))
  }

  /** Decontamination at benchmark scales where even the DISTINCT n-gram
    * set outgrows an exact broadcast (a 10⁹-gram eval suite is gigabytes
    * of strings; a bloom of it is tens of megabytes): a Bloom filter of
    * the benchmark grams — built DISTRIBUTED by Spark's
    * `BloomFilterAggregate` (partial filters per task, OR-merged; the
    * same machinery AQE's runtime row-group filtering uses, reached
    * through the sanctioned catalyst bridge because it is not in the
    * public function registry) — prefilters the corpus explode MAP-SIDE,
    * and only the survivors (matches + ~fpp of the rest) pay the exact
    * semi-join verification. The finished sketch is driver-collected and
    * inlined as a FOLDABLE binary literal — bounded by `nBits` (CONFIG,
    * never data: ~1.2 MB at the defaults), the same class of
    * driver-side decision as a broadcast threshold, and the form
    * `BloomFilterMightContain` requires (constant or scalar subquery).
    * Output is EXACT, identical to [[contaminated]]: a bloom has no false
    * negatives, and the verify join kills its false positives — the
    * filter only shrinks the volume entering the gram shuffle, by ~1/fpp
    * for a mostly-clean corpus (the common case: contamination is rare).
    * `expectedGrams` sizes the filter (bits ≈ -n·ln(fpp)/ln²2); an
    * undersized filter degrades fpp, never correctness.
    *
    * Input-determinism contract (same as
    * [[FrequentItems.exactHeavyHitters]]): the benchmark frame is
    * evaluated TWICE — once to build the bloom, once as the verify
    * semi-join side. A nondeterministic benchmark (sample()/rand-derived)
    * can present grams to the join that were never inserted into the
    * bloom, turning the no-false-negatives guarantee into silent false
    * negatives. Persist or localCheckpoint such inputs before calling. */
  def contaminatedBloom(docs: DataFrame, benchmark: DataFrame, textCol: String,
      idCol: String, n: Int = 13,
      expectedGrams: Long = 1L << 22, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.graft.bridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val benchGrams = benchmark
      .select(explode(shingles(col(textCol), n)).as("__g")).distinct()
    val nBits = math.ceil(
      -expectedGrams * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val bloomAgg = column(new BloomFilterAggregate(
      expression(xxhash64(col("__g"))),
      expression(lit(expectedGrams)), expression(lit(nBits)))
      .toAggregateExpression())
    val bloomBytes = benchGrams.agg(bloomAgg.as("__bloom"))
      .head().getAs[Array[Byte]](0)
    val bloomLit =
      if (bloomBytes == null) lit(null).cast("binary") // empty benchmark
      else lit(bloomBytes)
    docs.select(col(idCol),
        explode(array_distinct(shingles(col(textCol), n))).as("__g"))
      .filter(column(new BloomFilterMightContain(
        expression(bloomLit), expression(xxhash64(col("__g"))))))
      .join(benchGrams, Seq("__g"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_contaminated_ngrams"))
  }

  /** The decontamination DROP in one call: documents sharing MORE than
    * `maxHits` distinct n-grams with the benchmark are removed (left-anti
    * on the [[contaminated]] / [[contaminatedBloom]] hit counts); maxHits
    * = 0 (default) drops on any overlap, a small positive value tolerates
    * incidental phrase collisions. `bloom = true` routes candidate
    * generation through the Bloom prefilter for benchmark suites whose
    * distinct gram set outgrows an exact broadcast — the answer is
    * identical (the bloom path's verify join is exact; see its
    * input-determinism caveat). Scale: the corpus pays the map-side
    * explode + one anti-join keyed by doc id; it is never shuffled by
    * n-gram. */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, textCol: String,
      idCol: String, n: Int = 13, maxHits: Long = 0L,
      bloom: Boolean = false): DataFrame = {
    val hits =
      if (bloom) contaminatedBloom(docs, benchmark, textCol, idCol, n)
      else contaminated(docs, benchmark, textCol, idCol, n)
    docs.join(hits.filter(col("n_contaminated_ngrams") > maxHits),
      Seq(idCol), "left_anti")
  }

  /** Keep-one collapse over verified near-dup pairs: every doc maps to the
    * MINIMUM id of its connected component ([[canonicalLabels]] — fully
    * transitive, so for chain pairs (a,b),(b,c) doc c resolves to a). Docs
    * in no pair keep their own id. */
  def collapseToCanonical(df: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    val canon = canonicalLabels(pairs)
      .select(col("x").as(idCol), col("lbl").as("__canon"))
    df.join(canon, Seq(idCol), "left")
      .withColumn("canonical_id", coalesce(col("__canon"), col(idCol)))
      .drop("__canon")
  }
}
