package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, key-based sampling and dataset splitting — the
  * reproducibility primitives of a training-data pipeline. Unlike
  * `df.sample`/`sampleBy` (RNG seeded per partition, so results change with
  * partitioning, task retries, and engine version), these derive every
  * decision from a hash of a stable KEY: the same row lands in the same
  * sample/split on every engine, every rerun, every repartition — which is
  * what makes held-out sets trustworthy and experiments repeatable.
  *
  * Scale shape: pure map-side expressions (one md5 per row, codegen'd
  * built-ins) — no shuffle, no state. md5 (not xxhash64/murmur) keeps the
  * bucket function portable across engines — the same discipline as the
  * dedup operators. Note the bucket predicate is an EXPRESSION over the
  * key, so it cannot prune file IO (the scan still reads every row and
  * filters map-side — cheap, but not free at 100 TB): a deployment that
  * samples the same table repeatedly should materialize `hashBucket` as a
  * partition/bucketing column at write time — that write is
  * [[graft.sources.Warehouse.writeBucketed]], and
  * [[graft.sources.Warehouse.sampleBucketed]] is the metadata-only prune
  * over it.
  */
object Sampling {

  val BUCKETS = 10000

  /** Uniform value in [0, n) hashed DIRECTLY from the key's md5 — never
    * compose this with a second modulo (x % B % n is biased whenever n does
    * not divide B, and caps the domain at B): anything needing a different
    * modulus hashes straight to it from the same 32 uniform bits. */
  def hashMod(key: Column, n: Long): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(n))

  /** Uniform bucket in [0, BUCKETS) from the first 8 md5 hex digits of the
    * key — 32 uniform bits, far more than the 10^4 resolution needs. */
  def hashBucket(key: Column): Column = hashMod(key, BUCKETS.toLong)

  /** Keep a deterministic `fraction` of rows by key (0.0..1.0, resolution
    * 1/BUCKETS). Stable under repartitioning and reruns; sampling by the
    * SAME key at a larger fraction yields a superset (nested samples —
    * bucket < f1·B ⊆ bucket < f2·B for f1 ≤ f2).
    *
    * NULL keys: a NULL key has no bucket, so the row is excluded at every
    * fraction (same rule as [[withSplit]], which gives NULL keys a NULL
    * split label) — an unkeyed row must never drift between samples. */
  def sample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction not in [0,1]")
    df.filter(hashBucket(col(keyCol)) < math.round(fraction * BUCKETS))
  }

  /** Default split proportions (also the q70 oracle's derivation base). */
  val defaultSplitWeights: Seq[(String, Double)] =
    Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)

  /** Bucket cut points for a weight list (exposed so oracle SQL derives
    * from the same arithmetic instead of hardcoding). */
  def splitCuts(weights: Seq[(String, Double)]): Seq[Long] = {
    val total = weights.map(_._2).sum
    weights.map(_._2 / total).scanLeft(0.0)(_ + _)
      .map(c => math.round(c * BUCKETS)).tail
  }

  /** Split-leakage guard — the QA pass a training-data run executes after
    * splitting: near-dup candidate pairs ([[Dedup.minhashCandidates]] —
    * band-bucketed, never all-pairs) whose two documents landed in
    * DIFFERENT hash-split arms, counted per unordered arm pair. A
    * train-side near-duplicate of a test document is memorized eval
    * leakage that no within-split dedup can see; the remedy is deduping
    * BEFORE splitting, or splitting by [[Dedup.collapseToCanonical]]'s
    * canonical id so whole dup groups land together, and this guard is
    * how a pipeline PROVES that happened (expect zero cross-arm rows).
    * Same-arm pairs are reported too — the baseline showing the detector
    * had signal. Scale: the split labels join to the pair table by doc id
    * (two hash joins on the candidate set), nothing touches the corpus
    * beyond candidate generation. */
  def splitLeakage(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, bands: Int = 3, rows: Int = 2,
      weights: Seq[(String, Double)] = defaultSplitWeights,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val pairs = Dedup.minhashCandidates(docs, textCol, idCol, n, bands, rows,
      scope)
    val splits = withSplit(docs.select(col(idCol)), idCol, weights)
    pairs
      .join(splits.select(col(idCol).as("doc_a"), col("split").as("__sa")),
        Seq("doc_a"))
      .join(splits.select(col(idCol).as("doc_b"), col("split").as("__sb")),
        Seq("doc_b"))
      .groupBy(least(col("__sa"), col("__sb")).as("split_a"),
        greatest(col("__sa"), col("__sb")).as("split_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("__sa") =!= col("__sb"), 1L).otherwise(0L))
          .as("n_leaked"))
  }

  /** Assign every row a split label by hash bucket: `weights` are
    * (label, weight) in priority order, normalized over their sum; each
    * label owns a contiguous bucket range, so splits are disjoint, exhaust
    * the KEYED data, and are stable under reruns/repartitioning. A NULL key
    * gets a NULL label (never silently the last split — an unkeyed row in
    * the held-out set would contaminate it), consistent with [[sample]]
    * dropping NULL keys. */
  def withSplit(df: DataFrame, keyCol: String,
      weights: Seq[(String, Double)] = defaultSplitWeights,
      splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    val cuts = splitCuts(weights)
    // last cut is exactly BUCKETS by construction → otherwise is unreachable,
    // but keep the final label there so no bucket can ever map to NULL
    // stage the bucket in its own projection: its references live in
    // CaseWhen branches, which subexpression elimination does not hoist —
    // inline, every labeled row would recompute the md5 up to
    // weights.size+1 times (the same trap Text.repetitionRatio documents)
    val bucket = col("__bucket")
    val labeled = weights.init.zip(cuts.init).foldRight(
      lit(weights.last._1): Column) { case (((label, _), cut), rest) =>
      when(bucket < cut, lit(label)).otherwise(rest)
    }
    df.withColumn("__bucket", hashBucket(col(keyCol)))
      .withColumn(splitCol,
        when(bucket.isNull, lit(null).cast("string")).otherwise(labeled))
      .drop("__bucket")
  }

  /** Deterministic per-group sampling rates — the data-MIXTURE primitive
    * (pretraining runs draw each source at its own rate: oversample books,
    * downsample crawl). Unlike `df.stat.sampleBy` (per-partition RNG), the
    * keep decision is the same md5 bucket as [[sample]], so mixtures are
    * stable under reruns/repartitioning AND nested across rate changes
    * per group (raising one source's rate only ADDS rows of that source).
    * Rows of groups absent from `fractions` keep `defaultFraction` (0 =
    * drop). Map-side: one md5 + one CASE per row, bucket staged out of the
    * CaseWhen branches (the q70 hoisting discipline). NULL group values
    * take the default; NULL keys drop at every rate, as everywhere. */
  def sampleByGroup(df: DataFrame, keyCol: String, groupCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0.0 && f <= 1.0),
      "all fractions must be in [0,1]")
    val cut = fractions.toSeq.sortBy(_._1).foldRight(
      lit(math.round(defaultFraction * BUCKETS)): Column) { case ((g, f), rest) =>
      when(col(groupCol) === g, lit(math.round(f * BUCKETS))).otherwise(rest)
    }
    df.withColumn("__bucket", hashBucket(col(keyCol)))
      .filter(col("__bucket") < cut)
      .drop("__bucket")
  }

  /** The OVERSAMPLING side of data mixtures: per-group rates may exceed 1
    * ("3 epochs of the books source, 0.4 epochs of crawl"). Rate r emits
    * floor(r) full copies of every row plus, deterministically by the same
    * md5 bucket as [[sample]], one more copy for the fractional remainder
    * — so rate 2.6 means every row twice and a stable 60% of rows a third
    * time. Adds `epoch` (0-based copy index) so downstream keys stay
    * unique; rate 0 drops the group; unlisted groups take `defaultRate`;
    * NULL keys drop (no bucket — the rule everywhere in this file).
    *
    * Scale shape: map-side sequence+explode, no shuffle; output size is
    * the mixture's token budget, which is the POINT. Nested like sample:
    * raising one group's rate only adds copies of that group. */
  def upsampleByGroup(df: DataFrame, keyCol: String, groupCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(_ >= 0.0),
      "rates must be non-negative")
    def byGroup(f: Double => Long): Column =
      rates.toSeq.sortBy(_._1).foldRight(lit(f(defaultRate)): Column) {
        case ((g, r), rest) => when(col(groupCol) === g, lit(f(r))).otherwise(rest)
      }
    val full = byGroup(r => math.floor(r).toLong)
    val fracCut = byGroup(r => math.round((r - math.floor(r)) * BUCKETS))
    // a NULL key has no bucket: it gets ZERO epochs, not floor(rate) — the
    // full copies must obey the same drop rule as the fractional one
    val nEpochs = when(col(keyCol).isNull, lit(0L)).otherwise(full +
      when(hashBucket(col(keyCol)) < fracCut, lit(1L)).otherwise(lit(0L)))
    df.withColumn("__n", nEpochs)
      .withColumn("epoch",
        explode(when(col("__n") > 0, sequence(lit(0L), col("__n") - 1))
          .otherwise(array().cast("array<long>"))))
      .drop("__n")
  }

  /** Deterministic corpus shuffle — the shuffle-before-packing step of a
    * training pipeline. Ordering by a seeded md5 of the key gives a
    * permutation that is reproducible across engines, reruns, and
    * partitionings (`orderBy(rand())` is none of those, and changes under
    * task retry). Output: the input rows plus `shard` (which of `nShards`
    * hash-range shards the row belongs to) and `pos` (the row's 0-based
    * ordinal within its shard) — reading shards 0..n−1 each in `pos` order
    * IS the permutation, and a sharded file write preserves it.
    *
    * Scale shape: shard assignment is MAP-SIDE — the top 16 hash bits
    * range-partition the hash space with integer arithmetic, so shard
    * boundaries need no sampling pass (unlike generic range partitioning);
    * then ONE exchange on `shard` and an in-partition sort. Never a global
    * sort barrier, and `(shard, pos)` is still a total order because the
    * shard ranges are monotone in the hash. Different seeds give
    * independent permutations (fresh shuffle per epoch).
    *
    * Contract: `keyCol` is unique per row (duplicate keys hash identically,
    * making their relative order nondeterministic) and NON-NULL — a NULL
    * key has no identity to hash, so its position could never be
    * reproducible; rather than emit a silently-nondeterministic row, the
    * job FAILS on the first NULL key (runtime raise_error: loud, and no
    * extra validation scan). The seed is length-prefixed into the hash so
    * distinct (seed, key) pairs can never collide through the delimiter
    * (seed "a" + key "b:c" vs seed "a:b" + key "c"). */
  def deterministicShuffle(df: DataFrame, keyCol: String, nShards: Int,
      seed: String = "shuffle"): DataFrame = {
    require(nShards >= 1 && nShards <= 65536,
      s"nShards ($nShards) must be in 1..65536 (shards are 16-bit hash ranges)")
    Seq("shard", "pos", "__h").foreach(c =>
      require(!df.columns.contains(c),
        s"input must not contain reserved column $c (it would be overwritten)"))
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__h",
        when(col(keyCol).isNull, raise_error(lit(
          s"deterministicShuffle: NULL $keyCol has no reproducible position")))
          .otherwise(md5(concat(
            lit(s"${seed.length}:$seed:"), col(keyCol).cast("string")))))
      .withColumn("shard",
        expr("int(cast(conv(substring(__h, 1, 4), 16, 10) as bigint)" +
          s" * $nShards div 65536)"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("__h"), col(keyCol))) - 1)
      .drop("__h")
  }

  /** Exact-count stratified sample: exactly min(n, |group|) rows per group,
    * chosen deterministically as the group's n lowest-md5 keys — the
    * EVAL-SET primitive ("1000 docs per source"), where a rate-based sample
    * ([[sampleByGroup]]) cannot promise exact counts on small groups.
    * Unlike rate sampling this is NOT nested across n (the md5 order is,
    * though: n=500 selects a prefix of n=1000's selection). Scale: one
    * shuffle on the group key + in-partition sort — the per-group-window
    * shape; the md5 order makes the pick independent of input
    * partitioning. NULL keys have no bucket and are excluded, as
    * everywhere in this file. */
  def sampleExactPerGroup(df: DataFrame, keyCol: String, groupCol: String,
      n: Int): DataFrame = {
    require(n >= 0, s"n ($n) must be non-negative")
    require(!df.columns.contains("__rn"),
      "input must not contain reserved column __rn (it would be overwritten)")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.filter(col(keyCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Token-BUDGETED mixture — the unit real pretraining mixes in ("30 B
    * tokens of books, 5 B of crawl"), vs [[sampleByGroup]]'s row rates:
    * per group, keep documents in the deterministic md5-by-key order
    * until the group's token budget is exhausted. A document is kept iff
    * the budget was not already spent BEFORE it, so a group overshoots by
    * at most its one boundary document and never undershoots while
    * documents remain; budget 0 drops the group, unlisted groups take
    * `defaultBudget`, NULL token counts weigh 0, NULL keys drop (the
    * rule everywhere in this file). Same-budget nesting does NOT hold
    * across budgets (the prefix ORDER is what's stable — raising a
    * budget extends the kept prefix, never reshuffles it).
    *
    * Scale shape: ONE window per group (shuffle on the group key +
    * in-partition sort for the running sum) — exactly the cumulative-sum
    * plan the SQL oracle runs; no driver loop, no collect, and group
    * skew is document-count skew, not token skew (the window is a
    * streaming frame, O(1) state per row). */
  def mixByTokenBudget(df: DataFrame, keyCol: String, groupCol: String,
      tokenCol: String, budgets: Map[String, Long],
      defaultBudget: Long = 0L): DataFrame = {
    require((budgets.values ++ Seq(defaultBudget)).forall(_ >= 0L),
      "budgets must be non-negative")
    require(!df.columns.contains("__cum"),
      "input must not contain reserved column __cum (it would be overwritten)")
    import org.apache.spark.sql.expressions.Window
    val budget = budgets.toSeq.sortBy(_._1).foldRight(
      lit(defaultBudget): Column) { case ((g, b), rest) =>
      when(col(groupCol) === g, lit(b)).otherwise(rest)
    }
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tok = coalesce(col(tokenCol).cast("long"), lit(0L))
    df.filter(col(keyCol).isNotNull)
      .withColumn("__cum", sum(tok).over(w))
      .filter(col("__cum") - tok < budget)
      .drop("__cum")
  }

  /** The same hash-mod function as DuckDB SQL (oracle parity). */
  def hashModSql(keyExpr: String, n: Long): String =
    s"(CAST(('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), 1, 8)) AS BIGINT) % $n)"

  /** The same bucket function as DuckDB SQL (oracle parity). */
  def hashBucketSql(keyExpr: String): String = hashModSql(keyExpr, BUCKETS.toLong)
}
