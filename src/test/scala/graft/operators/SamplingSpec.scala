package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Registry

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Registry.table(spark, sf0001, "documents")

  test("sample is deterministic and invariant under repartitioning") {
    val a = Sampling.sample(docs, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.sample(docs.repartition(17), "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
    assert(a.nonEmpty && a.size < docs.count())
  }

  test("samples at growing fractions nest (larger fraction ⊇ smaller)") {
    val s10 = Sampling.sample(docs, "doc_id", 0.10)
      .select("doc_id").as[Long].collect().toSet
    val s40 = Sampling.sample(docs, "doc_id", 0.40)
      .select("doc_id").as[Long].collect().toSet
    assert(s10.subsetOf(s40))
  }

  test("sample fraction is honored within hash-uniformity tolerance") {
    val n = docs.count().toDouble
    val k = Sampling.sample(docs, "doc_id", 0.25).count().toDouble
    assert(math.abs(k / n - 0.25) < 0.05, s"got ${k / n}")
    assert(Sampling.sample(docs, "doc_id", 0.0).count() === 0L)
    assert(Sampling.sample(docs, "doc_id", 1.0).count() === n.toLong)
  }

  test("property: buckets are uniform and key-type-stable across key domains") {
    // one Spark pass over three key shapes: dense longs, sparse longs,
    // strings — the bucket distribution must stay uniform for all of them
    // (a biased bucket function silently skews every sample and split)
    val n = 20000
    val keyed = spark.range(n).toDF("id")
      .withColumn("dense", col("id"))
      .withColumn("sparse", col("id") * 1000003L + 17L)
      .withColumn("str", concat(lit("doc-"), col("id")))
    Seq("dense", "sparse", "str").foreach { k =>
      val perBucket = keyed
        .withColumn("b", Sampling.hashBucket(col(k)) % 100) // 100 coarse cells
        .groupBy("b").count().as[(Long, Long)].collect().toMap
      assert(perBucket.size === 100, s"$k: empty cells")
      val (mn, mx) = (perBucket.values.min, perBucket.values.max)
      // expected 200/cell; binomial 5σ ≈ ±70
      assert(mn > 130 && mx < 270, s"$k: bucket skew [$mn, $mx]")
    }
  }

  test("NULL keys: excluded from every sample, NULL split label") {
    val withNulls = spark.range(100).toDF("id")
      .withColumn("key", when(col("id") % 10 === 0, lit(null)).otherwise(col("id")))
    // a NULL key has no bucket: never sampled at any fraction...
    assert(Sampling.sample(withNulls, "key", 1.0).count() === 90L)
    // ...and never lands in a split (especially not the held-out tail)
    val split = Sampling.withSplit(withNulls, "key")
    assert(split.filter(col("key").isNull && col("split").isNotNull).count() === 0L)
    assert(split.filter(col("key").isNotNull && col("split").isNull).count() === 0L)
  }

  test("withSplit is disjoint, exhaustive, and roughly proportioned") {
    val out = Sampling.withSplit(docs, "doc_id")
    assert(out.count() === docs.count())             // exhaustive
    assert(out.filter(col("split").isNull).count() === 0L)
    val byLabel = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byLabel.keySet === Set("train", "val", "test")) // disjoint labels only
    val n = docs.count().toDouble
    assert(math.abs(byLabel("train") / n - 0.9) < 0.05)
    // determinism: every doc keeps its split on a rerun
    val again = Sampling.withSplit(docs.repartition(13), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val first = out.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(first === again)
  }

  test("sampleByGroup: per-group rates, nested under rate raises, default rate") {
    import org.apache.spark.sql.functions.col
    val df = (1L to 2000L).map(i => (i, s"g${i % 4}")).toDF("id", "grp")
    val mix = Sampling.sampleByGroup(df, "id", "grp",
      Map("g0" -> 1.0, "g1" -> 0.3), defaultFraction = 0.0)
    val byGrp = mix.groupBy("grp").count()
      .as[(String, Long)].collect().toMap
    assert(byGrp("g0") === 500L)                   // full rate keeps all
    assert(byGrp("g1") > 75L && byGrp("g1") < 225L) // ~0.3 within tolerance
    assert(!byGrp.contains("g2") && !byGrp.contains("g3")) // default 0 drops
    // nested: raising g1's rate only ADDS g1 rows
    val more = Sampling.sampleByGroup(df, "id", "grp",
      Map("g0" -> 1.0, "g1" -> 0.6), defaultFraction = 0.0)
      .select("id").as[Long].collect().toSet
    val base = mix.select("id").as[Long].collect().toSet
    assert(base.subsetOf(more))
    // and the same row set arrives regardless of partitioning
    val repart = Sampling.sampleByGroup(df.repartition(13), "id", "grp",
      Map("g0" -> 1.0, "g1" -> 0.3), defaultFraction = 0.0)
      .select("id").as[Long].collect().toSet
    assert(repart === base)
  }

  test("upsampleByGroup: epoch copies, fractional remainder, nested rates") {
    import org.apache.spark.sql.functions.col
    val df = (1L to 1000L).map(i => (i, s"g${i % 2}")).toDF("id", "grp")
    val up = Sampling.upsampleByGroup(df, "id", "grp", Map("g0" -> 2.5, "g1" -> 0.0))
    val rows = up.select("id", "grp", "epoch").as[(Long, String, Long)].collect()
    // rate 0 drops the whole group
    assert(!rows.exists(_._2 == "g1"))
    // every g0 row appears at least twice (epochs 0 and 1)...
    val byId = rows.filter(_._2 == "g0").groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    assert(byId.size === 500)
    assert(byId.values.forall(e => e.startsWith(Seq(0L, 1L))))
    // ...and a stable ~half a third time, always as the NEXT epoch index
    val thirds = byId.values.count(_ == Seq(0L, 1L, 2L))
    assert(thirds > 150 && thirds < 350, s"fractional epoch count $thirds")
    assert(byId.values.forall(e => e == Seq(0L, 1L) || e == Seq(0L, 1L, 2L)))
    // deterministic under repartitioning
    val again = Sampling.upsampleByGroup(df.repartition(7), "id", "grp",
      Map("g0" -> 2.5, "g1" -> 0.0)).select("id", "epoch")
      .as[(Long, Long)].collect().toSet
    assert(again === rows.filter(_._2 == "g0").map(r => (r._1, r._3)).toSet)
    // NULL keys get ZERO epochs — the full copies obey the same drop rule
    // as every other keyed decision in Sampling
    val withNull = Seq((Option(1L), "g0"), (Option.empty[Long], "g0"))
      .toDF("id", "grp")
    val survivors = Sampling.upsampleByGroup(withNull, "id", "grp",
      Map("g0" -> 2.5)).select("id").as[Option[Long]].collect()
    assert(survivors.forall(_.contains(1L)))
  }

  test("deterministicShuffle: a partition-stable total-order permutation") {
    val df = (1L to 500L).toDF("id")
    val shuffled = Sampling.deterministicShuffle(df, "id", nShards = 8, seed = "a")
      .select("id", "shard", "pos").as[(Long, Int, Int)].collect()
    // bijection: every input row exactly once, positions contiguous 0..n-1
    // per shard
    assert(shuffled.map(_._1).sorted.toSeq === (1L to 500L))
    shuffled.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0 until rows.length))
    }
    // it IS a shuffle: the permutation differs from input order and from
    // another seed's permutation
    val order = shuffled.sortBy(r => (r._2, r._3)).map(_._1).toSeq
    assert(order !== (1L to 500L))
    val orderB = Sampling.deterministicShuffle(df, "id", 8, seed = "b")
      .select("id", "shard", "pos").as[(Long, Int, Int)].collect()
      .sortBy(r => (r._2, r._3)).map(_._1).toSeq
    assert(order !== orderB)
    // partition-stable: the same permutation from any input partitioning
    val order13 = Sampling
      .deterministicShuffle(df.repartition(13), "id", 8, seed = "a")
      .select("id", "shard", "pos").as[(Long, Int, Int)].collect()
      .sortBy(r => (r._2, r._3)).map(_._1).toSeq
    assert(order13 === order)
  }

  test("deterministicShuffle plan: one exchange, in-partition sort, no global sort") {
    val df = (1L to 500L).toDF("id")
    val plan = Sampling.deterministicShuffle(df, "id", 8)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllMatchIn(plan).size === 1, plan)
    // the sort is the window's partition-local sort, never a range-
    // partitioned global Sort (no rangepartitioning exchange)
    assert(!plan.contains("rangepartitioning"), plan)
  }

  test("sampleExactPerGroup: exact counts, md5-prefix nesting, partition-stable") {
    val df = (1L to 300L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val s30 = Sampling.sampleExactPerGroup(df, "id", "g", 30)
      .select("id", "g").as[(Long, String)].collect()
    assert(s30.groupBy(_._2).view.mapValues(_.length).toMap ===
      Map("g0" -> 30, "g1" -> 30, "g2" -> 30))
    // small groups: min(n, |group|), never an error
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "g")
    assert(Sampling.sampleExactPerGroup(tiny, "id", "g", 30).count() === 3L)
    // md5-order prefix property: n=10 ⊂ n=30, per group
    val s10 = Sampling.sampleExactPerGroup(df, "id", "g", 10)
      .select("id").as[Long].collect().toSet
    assert(s10.subsetOf(s30.map(_._1).toSet))
    // partitioning-independent pick
    val s30b = Sampling.sampleExactPerGroup(df.repartition(13), "id", "g", 30)
      .select("id").as[Long].collect().toSet
    assert(s30b === s30.map(_._1).toSet)
  }

  test("deterministicShuffle fails loudly on NULL keys and reserved columns") {
    // a NULL key has no reproducible position — the job must fail, not
    // emit a silently-nondeterministic row
    val withNull = Seq(Option(1L), Option.empty[Long]).toDF("id")
    val e = intercept[Exception] {
      Sampling.deterministicShuffle(withNull, "id", 4).collect()
    }
    assert(e.getMessage.contains("NULL id"))
    // pre-existing bookkeeping columns are an error, never a silent overwrite
    val clash = Seq((1L, 9)).toDF("id", "shard")
    val e2 = intercept[IllegalArgumentException] {
      Sampling.deterministicShuffle(clash, "id", 4)
    }
    assert(e2.getMessage.contains("shard"))
  }

  test("splitLeakage: doc-wise split leaks, canonical-id split does not") {
    import graft.queries.Registry
    val docs = Registry.table(spark, sf0001, "documents")
      .select("doc_id", "text")
    // doc-wise split: near-dup groups straddle arms — the detector fires
    val naive = Sampling.splitLeakage(docs, "text", "doc_id")
      .agg(org.apache.spark.sql.functions.sum("n_leaked")).as[Long].head()
    assert(naive > 0, "fixture produced no cross-arm candidates to detect")
    // the remedy: split whole dup groups by their CANONICAL id, then give
    // every doc its group's split — re-running the guard with the
    // canonical id as the split key must report ZERO leaked pairs
    import org.apache.spark.sql.functions._
    val pairs = Dedup.minhashCandidates(docs, "text", "doc_id")
    val canon = Dedup.collapseToCanonical(docs, pairs, "doc_id")
      .select(col("doc_id"), col("canonical_id"))
    val byCanon = docs.join(canon, "doc_id")
    val splits = Sampling.withSplit(byCanon, "canonical_id")
      .select(col("doc_id").as("d"), col("split"))
    val leaked = pairs
      .join(splits.select(col("d").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(splits.select(col("d").as("doc_b"), col("split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(leaked === 0L, s"$leaked pairs straddle arms under canonical split")
  }

  test("decontaminate: threshold boundary; bloom path answers identically") {
    import graft.queries.Registry
    import org.apache.spark.sql.functions._
    val docs = Registry.table(spark, sf0001, "documents")
    val bench = docs.filter(col("source") === "src0")
    val corpus = docs.filter(col("source") =!= "src0")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").as[Long].collect().toSet
    val exact = ids(Dedup.decontaminate(corpus, bench, "text", "doc_id", n = 3))
    val viaBloom = ids(Dedup.decontaminate(corpus, bench, "text", "doc_id",
      n = 3, bloom = true))
    assert(exact === viaBloom)
    // tolerant threshold keeps strictly more
    val tolerant = ids(Dedup.decontaminate(corpus, bench, "text", "doc_id",
      n = 3, maxHits = 5L))
    assert(exact.subsetOf(tolerant) && tolerant.size > exact.size)
    // dropped docs are exactly those with hits above the threshold
    val hits = Dedup.contaminated(corpus, bench, "text", "doc_id", n = 3)
      .filter(col("n_contaminated_ngrams") > 0)
    assert(ids(corpus).size - exact.size === hits.count().toInt)
  }

  test("mixByTokenBudget: md5-prefix until spent, overshoot ≤ 1 doc, budget edges") {
    // group g: 6 docs of 100 tokens each; group h: 3 docs; group z unlisted
    val df = ((1L to 6L).map(i => (i, "g", 100L)) ++
      (11L to 13L).map(i => (i, "h", 100L)) ++
      (21L to 23L).map(i => (i, "z", 100L)))
      .toDF("doc_id", "grp", "toks")
    def kept(budgets: Map[String, Long], default: Long = 0L): Map[String, Set[Long]] =
      Sampling.mixByTokenBudget(df, "doc_id", "grp", "toks", budgets, default)
        .select("grp", "doc_id").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // the md5 order the operator promises, independently derived
    val order = df.filter($"grp" === "g")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
      .select("doc_id").as[Long].collect()

    // 250 tokens buys the first 2 docs + the one overshooting boundary doc
    val k = kept(Map("g" -> 250L))
    assert(k("g") === order.take(3).toSet)
    assert(!k.contains("h") && !k.contains("z")) // default 0 drops
    // exact-multiple budget: NO overshoot doc (300 = exactly 3 docs)
    assert(kept(Map("g" -> 300L))("g") === order.take(3).toSet)
    // budget ≥ group mass keeps all; default budget applies to unlisted
    val all = kept(Map("g" -> 600L), default = 150L)
    assert(all("g").size === 6 && all("h").size === 2 && all("z").size === 2)
    // raising a budget EXTENDS the kept prefix (order stability)
    assert(kept(Map("g" -> 250L))("g").subsetOf(kept(Map("g" -> 450L))("g")))

    // NULL tokens weigh 0 (kept for free while budget unspent); NULL keys drop
    val nulls = Seq((1L, "g", Some(100L)), (2L, "g", None))
      .toDF("doc_id", "grp", "toks")
    assert(Sampling.mixByTokenBudget(nulls, "doc_id", "grp", "toks",
      Map("g" -> 150L)).count() === 2L)
    // partition-stability: same kept set at any parallelism
    assert(kept(Map("g" -> 250L)) ===
      Sampling.mixByTokenBudget(df.repartition(7), "doc_id", "grp", "toks",
          Map("g" -> 250L))
        .select("grp", "doc_id").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap)
  }
}
