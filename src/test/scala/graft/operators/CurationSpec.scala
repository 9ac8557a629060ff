package graft.operators

import graft.SparkSpec
import graft.queries.Registry

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("curation pipeline: dedups, collapses, filters, enriches end-to-end") {
    val base = Registry.table(spark, sf0001, "documents").limit(100)
    // plant an exact dup and a near dup of doc 0
    val d0 = base.filter($"doc_id" === 0).select($"text").as[String].collect().head
    val planted = Seq(
      (9001L, d0, "en", "srcX", d0.length.toLong),              // exact dup
      (9002L, d0 + " extra tail word", "en", "srcX", 0L))        // near dup
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val docs = base.unionByName(planted)

    val res = Curation.run(docs, minQuality = 0.2, jaccardThreshold = 0.5)
    val s = res.summary.collect().head
    assert(s.getAs[Long]("n_input") === 102L)
    assert(s.getAs[Long]("n_after_exact_dedup") === 101L)  // 9001 folded into 0
    assert(s.getAs[Long]("n_after_near_dedup") <= 100L)    // 9002 collapsed to 0
    assert(s.getAs[Long]("n_curated") <= s.getAs[Long]("n_after_near_dedup"))
    val ids = res.curated.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(9001L) && !ids.contains(9002L))
    assert(res.curated.columns.contains("lang_pred"))
    assert(res.curated.columns.contains("quality"))
  }

  test("maxRepetition floor drops boilerplate that survives quality scoring") {
    val base = Registry.table(spark, sf0001, "documents").limit(50)
    val spam = Seq((9100L,
      "click here buy now " * 30 + "limited offer!", "en", "srcY", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val docs = base.unionByName(spam)
    val lax = Curation.run(docs, minQuality = 0.1)
    val strict = Curation.run(docs, minQuality = 0.1, maxRepetition = 0.5)
    val laxIds = lax.curated.select("doc_id").as[Long].collect().toSet
    val strictIds = strict.curated.select("doc_id").as[Long].collect().toSet
    assert(laxIds.contains(9100L))     // repetition invisible to quality score
    assert(!strictIds.contains(9100L)) // the repetition ceiling catches it
    assert(strictIds.subsetOf(laxIds))
  }

  test("summary is computed in a single pass and releases its caches") {
    // Count input-scan tasks via an opaque mapPartitions barrier (Catalyst
    // can neither prune nor skip it), with a fixed partition count.
    val nPart = 4
    val acc = spark.sparkContext.longAccumulator("input-scans")
    val docs = spark.range(0, 120, 1, nPart)
      .mapPartitions { it => acc.add(1); it }
      .map(i => (i.toLong, s"document number $i with some shared words and tail $i"))
      .toDF("doc_id", "text")

    // "pinned" = persisted RDDs that are NOT materialized checkpoints:
    // locally-checkpointed blocks are lifecycle-managed (ContextCleaner
    // frees them when the referencing frame is dropped); a leaked persist
    // stays forever with no release path — that's what this test polices.
    def pinned = spark.sparkContext.getPersistentRDDs.values
      .count(r => !r.isCheckpointed)
    val cachedBefore = pinned
    val res = Curation.run(docs, minQuality = 0.0, jaccardThreshold = 0.9)
    res.summary.collect()

    // one scan for n_input + one to materialize the exact-dedup cache; the
    // near-dup, collapse, and curated counts must all read caches (the old
    // 4x-recompute shape scans the input ~5 times here)
    assert(acc.value === 2L * nPart,
      s"expected 2 input passes (${2 * nPart} tasks), saw ${acc.value} tasks")

    // and no cache stays pinned after run() returns
    val cachedAfter = pinned
    assert(cachedAfter <= cachedBefore,
      s"run() leaked persisted RDDs: $cachedBefore before, $cachedAfter after")
  }

  test("resultScope keeps the collapse hot for consuming curated") {
    val nPart = 4
    val acc = spark.sparkContext.longAccumulator("input-scans")
    val docs = spark.range(0, 120, 1, nPart)
      .mapPartitions { it => acc.add(1); it }
      .map(i => (i.toLong, s"document number $i with some shared words and tail $i"))
      .toDF("doc_id", "text")

    // same pinned-cache accounting as the single-pass test: materialized
    // checkpoints are lifecycle-managed, not leaks
    def pinned = spark.sparkContext.getPersistentRDDs.values
      .count(r => !r.isCheckpointed)
    val cachedBefore = pinned
    val scope = new CacheScope
    val res = Curation.run(docs, minQuality = 0.0, jaccardThreshold = 0.9,
      resultScope = Some(scope))
    val afterRun = acc.value // the summary's two passes
    res.curated.collect()    // map-side over the scope-cached collapse
    assert(acc.value === afterRun,
      s"consuming curated rescanned the input (${acc.value - afterRun} tasks)")
    // the caller-owned release drops every block the run pinned (a later
    // action on curated may still reuse session shuffle files — that's
    // Spark's normal lineage recompute, not a cache leak)
    scope.unpersistAll(blocking = true)
    assert(pinned <= cachedBefore)
    assert(res.curated.count() > 0) // still computable after release
  }
}
