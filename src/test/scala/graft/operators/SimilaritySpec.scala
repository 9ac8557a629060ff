package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.Registry

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Registry.table(spark, sf0001, "embeddings")
  private lazy val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))

  test("brute-force top-k: scores sorted, self excluded by caller filter") {
    val out = Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 0), query, 10)
      .as[(Long, Double)].collect()
    assert(out.length === 10)
    assert(out.map(_._2).toSeq === out.map(_._2).sortBy(-_).toSeq)
    assert(out.forall(p => p._2 <= 1.0 + 1e-12 && p._2 >= -1.0 - 1e-12))
  }

  test("identical vector has cosine 1 and ranks first") {
    val out = Similarity.bruteForceTopK(emb, query, 1).as[(Long, Double)].collect()
    assert(out.head._1 === 0L)
    assert(math.abs(out.head._2 - 1.0) < 1e-12)
  }

  test("LSH top-k: query's own bucket contains the query vector (recall@self)") {
    val out = Similarity.lshTopK(emb, query, 5).as[(Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.head._1 === 0L) // self lands in its own bucket with cos 1
  }

  test("LSH top-k recall@10 is measured and grows with probe radius") {
    val exact = Similarity.bruteForceTopK(emb, query, 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    def recallAt10(radius: Int): Double = {
      val got = Similarity.lshTopK(emb, query, 10, probeRadius = radius)
        .as[(Long, Double)].collect().map(_._1).toSet
      (exact intersect got).size / 10.0
    }
    val r1 = recallAt10(1)
    val r2 = recallAt10(2)
    info(f"recall@10: probeRadius=1 → $r1%.2f, probeRadius=2 → $r2%.2f")
    // radius-2 probes a superset of radius-1's buckets ⇒ recall can only grow
    assert(r2 >= r1, f"radius-2 recall $r2%.2f < radius-1 recall $r1%.2f")
    assert(r2 > 0.0) // and the widened probe actually finds true neighbors
  }

  test("IVF top-k: self-recall and high overlap with brute force") {
    val exact = Similarity.bruteForceTopK(emb, query, 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    val approx = Similarity.ivfTopK(emb, query, 10, nCells = 16, nProbe = 6)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(approx.contains(0L)) // query vector finds itself
    // approximate: require meaningful overlap with the exact answer
    assert((exact intersect approx).size >= 4,
      s"overlap too low: exact=$exact approx=$approx")
  }

  test("stored IVF index: probed cells prune partitions; results match in-memory") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/index"
    Similarity.ivfWriteIndex(emb, dir, nCells = 16)
    val fromIndex = Similarity.ivfTopKFromIndex(spark, dir, query, 10, nProbe = 4)
    // identical results to the in-memory path (same quantizer, same probes)
    val inMem = Similarity.ivfTopK(emb, query, 10, nCells = 16, nProbe = 4)
      .as[(Long, Double)].collect().toSeq
    assert(fromIndex.as[(Long, Double)].collect().toSeq === inMem)
    // and the index read touches only the nProbe cell partitions — the
    // pruning is metadata-only, decided before any data is read (unwrap
    // the AQE root: its leaves hide the scan)
    val plan = fromIndex.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = plan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("graft-ivf")) => f
    }
    assert(scans.nonEmpty, s"no index scan found in:\n$plan")
    assert(scans.head.selectedPartitions.partitionCount === 4,
      s"expected 4 probed-cell partitions, got ${scans.head.selectedPartitions.partitionCount}")
  }

  test("IVF quantizer: deterministic k-means, balanced cells, full coverage") {
    // bit-determinism across calls (the index/in-memory equivalence contract)
    val c1 = Similarity.ivfCentroids(emb, 8, "vec_id", "embedding")
      .collect().map(_.toString).sorted.toSeq
    val c2 = Similarity.ivfCentroids(emb, 8, "vec_id", "embedding")
      .collect().map(_.toString).sorted.toSeq
    assert(c1 === c2)
    // cell balance: the reason k-means replaced lowest-id centroids — no
    // cell may hog the corpus (the hot-partition failure at 100 TB)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-bal").toString + "/index"
    Similarity.ivfWriteIndex(emb, dir, nCells = 8)
    val sizes = spark.read.parquet(s"${Similarity.ivfIndexRoot(spark, dir)}/cells")
      .groupBy("cell_id").count().as[(Long, Long)].collect().map(_._2)
    val total = sizes.sum
    assert(total === emb.count(), "every vector assigned to exactly one cell")
    val mean = total.toDouble / 8
    assert(sizes.max <= 4 * mean,
      s"hot cell: max ${sizes.max} vs mean $mean (sizes ${sizes.sorted.toSeq})")
  }

  test("whole-corpus quantizer: deterministic, balanced, index round-trips") {
    // determinism across calls AND partitionings (exact decimal updates)
    val d1 = Similarity.ivfCentroidsDistributed(emb, 8, "vec_id", "embedding", iters = 5)
      .collect().map(_.toString).sorted.toSeq
    val d2 = Similarity.ivfCentroidsDistributed(emb.repartition(7), 8,
        "vec_id", "embedding", iters = 5)
      .collect().map(_.toString).sorted.toSeq
    assert(d1 === d2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-wc").toString + "/index"
    Similarity.ivfWriteIndex(emb, dir, nCells = 8, wholeCorpusQuantizer = true)
    val root = Similarity.ivfIndexRoot(spark, dir)
    val sizes = spark.read.parquet(s"$root/cells")
      .groupBy("cell_id").count().as[(Long, Long)].collect().map(_._2)
    assert(sizes.sum === emb.count(), "every vector assigned to exactly one cell")
    val mean = sizes.sum.toDouble / 8
    assert(sizes.max <= 4 * mean,
      s"hot cell: max ${sizes.max} vs mean $mean (sizes ${sizes.sorted.toSeq})")
    // and the stored index serves queries (self at rank 1, k results)
    val got = Similarity.ivfTopKFromIndex(spark, dir,
      emb.filter(col("vec_id") === 3).select(col("embedding").as("qvec")),
      10, nProbe = 4).as[(Long, Double)].collect()
    assert(got.length === 10)
    assert(got.head._1 === 3L, s"self not first: ${got.take(3).toSeq}")
  }

  test("IVF index append: batches join existing cells under the frozen quantizer") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-app").toString + "/index"
    val first = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    Similarity.ivfWriteIndex(first, dir, nCells = 8)
    val root = Similarity.ivfIndexRoot(spark, dir)
    val centsBefore = spark.read.parquet(s"$root/_centroids")
      .collect().map(_.toString).sorted.toSeq
    Similarity.ivfAppendToIndex(rest, dir)
    // the quantizer is immutable across appends
    val centsAfter = spark.read.parquet(s"$root/_centroids")
      .collect().map(_.toString).sorted.toSeq
    assert(centsAfter === centsBefore)
    // appended index == from-scratch assignment under the SAME centroids
    val cells = spark.read.parquet(s"$root/cells")
      .select("vec_id", "cell_id").as[(Long, Long)].collect().toSet
    val expected = Similarity.assignCells(
        emb, spark.read.parquet(s"$root/_centroids"), "vec_id", "embedding")
      .select(col("vec_id"), col("cell_id").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(cells === expected)
    // and a query for an APPENDED vector finds itself through the pruned read
    val q1 = emb.filter(col("vec_id") === 1).select(col("embedding").as("qvec"))
    val got = Similarity.ivfTopKFromIndex(spark, dir, q1, 5, nProbe = 3)
      .as[(Long, Double)].collect()
    assert(got.head._1 === 1L && math.abs(got.head._2 - 1.0) < 1e-9)
  }

  test("IVF health: append drift degrades cell balance; ivfShouldRequantize fires; rebuild heals") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-drift").toString + "/index"
    Similarity.ivfWriteIndex(emb, dir, nCells = 8)
    // fresh quantizer over the live distribution: balanced, no rebuild advised
    assert(!Similarity.ivfShouldRequantize(spark, dir),
      s"fresh index flagged for rebuild: ${Similarity.ivfCellBytes(spark, dir)}")
    // drifted ingest: three batches from a DIFFERENT distribution (tight
    // cluster far from the corpus — e.g. a new embedding model version);
    // the frozen quantizer funnels them all into whichever cell is nearest
    (1 to 3).foreach { b =>
      val drifted = emb
        .withColumn("vec_id", col("vec_id") + lit(b * 100000L))
        .withColumn("embedding",
          transform(col("embedding"), x => (x * 0.01f + 10.0f).cast("float")))
      Similarity.ivfAppendToIndex(drifted, dir)
    }
    val bytes = Similarity.ivfCellBytes(spark, dir)
    val mean = bytes.values.sum.toDouble / bytes.size
    info(f"post-drift hot cell: max ${bytes.values.max} bytes vs mean $mean%.0f (${bytes.values.max / mean}%.1fx)")
    assert(Similarity.ivfShouldRequantize(spark, dir),
      s"drifted index not flagged: $bytes")
    // measured recall on a drifted query sample — the diagnostic a
    // deployment runs when the predicate fires
    val qs = emb.filter(col("vec_id") < 400 && col("vec_id") % 40 === 0)
      .select((col("vec_id") + 100000L).as("qid"),
        transform(col("embedding"), x => (x * 0.01f + 10.0f).cast("float")).as("qvec"))
    val recallDrifted = Similarity.ivfRecallAt(spark, dir, qs, k = 10, nProbe = 2)
    // an in-flight reader pins the drifted generation at plan time; the
    // maintenance rebuild must not break it (one-cycle segment grace)
    val pinned = spark.read.parquet(
      s"${Similarity.ivfIndexRoot(spark, dir)}/cells")
    val nPinned = pinned.count()
    // ivfMaintain closes the loop: advisory fires → rebuild from the
    // index's own vectors at the live cell count → one-swap publish
    assert(Similarity.ivfMaintain(spark, dir),
      "maintain did not rebuild a flagged index")
    assert(!Similarity.ivfShouldRequantize(spark, dir),
      s"rebuilt index still flagged: ${Similarity.ivfCellBytes(spark, dir)}")
    // the rebuilt quantizer kept the configured cell count
    assert(spark.read.parquet(
      s"${Similarity.ivfIndexRoot(spark, dir)}/_centroids").count() === 8L)
    // quiet advisory ⇒ no-op (no phantom rebuild churn in the ingest loop)
    val genAfter = Similarity.ivfIndexRoot(spark, dir)
    assert(!Similarity.ivfMaintain(spark, dir))
    assert(Similarity.ivfIndexRoot(spark, dir) === genAfter)
    // the pre-rebuild reader survives the publish
    assert(pinned.count() === nPinned)
    val recallFresh = Similarity.ivfRecallAt(spark, dir, qs, k = 10, nProbe = 2)
    info(f"recall@10 (nProbe=2): drifted quantizer $recallDrifted%.2f, rebuilt $recallFresh%.2f")
    // recall alone cannot flag this failure: the drifted layout scores
    // PERFECT recall for in-cluster queries precisely because probing the
    // hot cell is a near-full scan (recall bought at unbounded cost) —
    // which is why the advisory keys on BALANCE, with recall as the floor
    // check that the rebuilt layout still answers at a bounded probe budget
    assert(recallDrifted >= 0.9,
      f"hot-cell recall should be trivially high, got $recallDrifted%.2f")
    assert(recallFresh >= 0.5, f"rebuilt recall implausibly low: $recallFresh%.2f")
  }

  test("batched top-k rejects non-integral id columns loudly (no silent NULL cast)") {
    val stringIds = emb.withColumn("vec_id", concat(lit("doc-"), col("vec_id")))
    val qs = emb.limit(2)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val e = intercept[IllegalArgumentException] {
      Similarity.batchBruteForceTopK(stringIds, qs, 5)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
    // the single-query path keeps the id type and still works
    val q1 = emb.filter(col("vec_id") === 3)
      .select(col("embedding").as("qvec"))
    val got = Similarity.bruteForceTopK(stringIds, q1, 1)
      .select("vec_id").as[String].collect()
    assert(got.toSeq === Seq("doc-3"))
  }

  test("IVF re-quantize publishes atomically through the generation manifest") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-gen").toString + "/index"
    val half = emb.filter(col("vec_id") % 2 === 0)
    Similarity.ivfWriteIndex(half, dir, nCells = 8)
    val root1 = Similarity.ivfIndexRoot(spark, dir)
    assert(root1.endsWith("gen-1"))
    // an in-flight reader pins generation 1 at plan time
    val q1 = emb.filter(col("vec_id") === 2).select(col("embedding").as("qvec"))
    val pinned = spark.read.parquet(s"$root1/cells")
    val n1 = pinned.count()
    // re-quantize over the FULL corpus: one manifest swap publishes gen-2
    Similarity.ivfWriteIndex(emb, dir, nCells = 8)
    val root2 = Similarity.ivfIndexRoot(spark, dir)
    assert(root2.endsWith("gen-2"))
    // new readers resolve gen-2 and see every vector
    val got = Similarity.ivfTopKFromIndex(spark, dir, q1, 5, nProbe = 3)
      .as[(Long, Double)].collect()
    assert(got.head._1 === 2L && math.abs(got.head._2 - 1.0) < 1e-9)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // gen-1 survives one cycle for in-flight readers (the pinned plan still works)...
    assert(pinned.count() === n1)
    // ...and a THIRD write collects it
    Similarity.ivfWriteIndex(emb, dir, nCells = 8)
    val gens = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("gen-")).toSet
    assert(gens === Set("gen-2", "gen-3"), s"stale generations: $gens")
  }

  // ---- batched multi-query ANN (one join + grouped heap, no driver loop) --

  private lazy val queryBatch = emb.filter(col("vec_id") % 53 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
  private lazy val queryIds =
    queryBatch.select("qid").as[Long].collect().sorted.toSeq

  private def oneQuery(qid: Long) =
    emb.filter(col("vec_id") === qid).select(col("embedding").as("qvec"))

  private def collectBatch(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Long, Double)]] =
    df.select("qid", "vec_id", "cos", "rank")
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1)
      .map { case (q, rows) =>
        q -> rows.sortBy(_._4).map(r => (r._2, r._3)).toSeq
      }

  test("batched brute-force top-k == per-query bruteForceTopK, every query") {
    val batched = collectBatch(Similarity.batchBruteForceTopK(emb, queryBatch, 10))
    assert(batched.keySet === queryIds.toSet)
    queryIds.foreach { qid =>
      val single = Similarity.bruteForceTopK(emb, oneQuery(qid), 10)
        .as[(Long, Double)].collect().toSeq
      assert(batched(qid) === single, s"qid=$qid diverges from per-query path")
    }
  }

  test("batched LSH top-k == per-query lshTopK, every query") {
    val batched = collectBatch(
      Similarity.lshBatchTopK(emb, queryBatch, 10, probeRadius = 1))
    queryIds.foreach { qid =>
      val single = Similarity.lshTopK(emb, oneQuery(qid), 10, probeRadius = 1)
        .as[(Long, Double)].collect().toSeq
      assert(batched.getOrElse(qid, Nil) === single,
        s"qid=$qid diverges from per-query path")
    }
  }

  test("batched IVF top-k == per-query ivfTopK, every query") {
    val batched = collectBatch(
      Similarity.ivfBatchTopK(emb, queryBatch, 10, nCells = 8, nProbe = 3))
    queryIds.foreach { qid =>
      val single = Similarity.ivfTopK(emb, oneQuery(qid), 10, nCells = 8, nProbe = 3)
        .as[(Long, Double)].collect().toSeq
      assert(batched.getOrElse(qid, Nil) === single,
        s"qid=$qid diverges from per-query path")
    }
  }

  test("batched IVF from stored index == in-memory batched IVF (same quantizer)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-batch").toString + "/index"
    Similarity.ivfWriteIndex(emb, dir, nCells = 8)
    val fromIndex = collectBatch(
      Similarity.ivfBatchTopKFromIndex(spark, dir, queryBatch, 10, nProbe = 3))
    // the deterministic quantizer makes the in-memory recompute identical
    // to the stored centroids, so the two paths must agree exactly
    val inMem = collectBatch(
      Similarity.ivfBatchTopK(emb, queryBatch, 10, nCells = 8, nProbe = 3))
    assert(fromIndex === inMem)
  }

  test("batched LSH recall@10 vs batched brute force: measured, self found") {
    val exact = collectBatch(Similarity.batchBruteForceTopK(emb, queryBatch, 10))
    val approx = collectBatch(
      Similarity.lshBatchTopK(emb, queryBatch, 10, probeRadius = 2))
    val recalls = queryIds.map { qid =>
      val e = exact(qid).map(_._1).toSet
      val a = approx.getOrElse(qid, Nil).map(_._1).toSet
      // every query finds itself: cos(q,q)=1 tops its own bucket
      assert(a.contains(qid), s"qid=$qid missing self")
      (e intersect a).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    info(f"batched LSH mean recall@10 (radius 2) over ${recalls.size} queries: $mean%.2f")
    assert(mean > 0.2, f"mean recall $mean%.2f implausibly low")
  }

  test("near-dup pairs: bucketed by label, all above threshold, a<b") {
    val pairs = Similarity.nearDupPairs(emb, "label", 0.2)
      .as[(Long, Long, Double)].collect()
    assert(pairs.forall(p => p._3 > 0.2))
    assert(pairs.forall(p => p._1 < p._2))
  }

  test("IVF-PQ: shortlist scan never reads the float column") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString + "/index"
    Similarity.ivfpqWriteIndex(emb, dir, nCells = 8, m = 4, kSub = 8)
    val q = emb.filter(col("vec_id") === 3).select(col("embedding"))
      .collect().head.getSeq[Float](0).toArray.map(_.toDouble)
    val short = Similarity.ivfpqShortlist(spark, dir, q, shortlist = 50, nProbe = 4)
    val scans = short.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      val read = s.requiredSchema.fieldNames.toSet
      assert(!read.contains("embedding"),
        s"ADC scan reads the float column: ${s.requiredSchema.treeString}")
      assert(read.contains("pq_code") && read.contains("vec_id"))
    }
    // and the probe prunes partitions: the scan SELECTS only probed cells
    // (inputFiles reflects the unfiltered relation, so ask the scan node)
    val selected = scans.head.selectedPartitions.partitionCount
    assert(selected <= 4, s"probed-cell prune leaked: $selected partitions")
    assert(scans.head.partitionFilters.nonEmpty, "no partition filter pushed")
  }

  test("IVF-PQ: full-width shortlist == plain IVF cosine ranking; self first") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq2").toString + "/index"
    Similarity.ivfpqWriteIndex(emb, dir, nCells = 8, m = 4, kSub = 8)
    val query = emb.filter(col("vec_id") === 3).select(col("embedding").as("qvec"))
    // shortlist >= probed population: the exact re-rank sees every probed
    // candidate, so the result must EQUAL the non-PQ index search (the PQ
    // approximation fully repaired)
    val n = emb.count().toInt
    val pq = Similarity.ivfpqTopKFromIndex(spark, dir, query, 10,
      nProbe = 4, shortlist = n).as[(Long, Double)].collect()
    val plain = Similarity.ivfTopKFromIndex(spark, dir, query, 10, nProbe = 4)
      .as[(Long, Double)].collect()
    assert(pq.map(_._1).toSeq === plain.map(_._1).toSeq)
    assert(pq.head._1 === 3L, s"self not first: ${pq.take(3).toSeq}")
    // and a narrow shortlist still surfaces the exact-match row
    val narrow = Similarity.ivfpqTopKFromIndex(spark, dir, query, 5,
      nProbe = 4, shortlist = 16).as[(Long, Double)].collect()
    assert(narrow.head._1 === 3L)
  }

  test("IVF-PQ append: batches encode under the frozen quantizer+codebooks") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq3").toString + "/index"
    val first = emb.filter(col("vec_id") % 2 === 0)
    Similarity.ivfpqWriteIndex(first, dir, nCells = 8, m = 4, kSub = 8)
    Similarity.ivfpqAppendToIndex(emb.filter(col("vec_id") % 2 =!= 0), dir)
    val root = Similarity.ivfIndexRoot(spark, dir)
    val cells = spark.read.parquet(s"$root/cells")
    assert(cells.count() === emb.filter(col("embedding").isNotNull).count())
    // appended rows carry codes from the INDEX's codebooks: re-encoding
    // the whole corpus under the stored model must agree row for row
    val model = Similarity.ivfpqReadModel(spark, root)
    val again = graft.operators.ProductQuantization.encode(
      emb.filter(col("embedding").isNotNull), "embedding", model, "re_code")
      .select(col("vec_id"), col("re_code"))
    assert(cells.join(again, "vec_id")
      .filter(col("pq_code") =!= col("re_code")).count() === 0)
    // and an appended (odd-id) vector is findable
    val q7 = emb.filter(col("vec_id") === 7).select(col("embedding").as("qvec"))
    val got = Similarity.ivfpqTopKFromIndex(spark, dir, q7, 5,
      nProbe = 4, shortlist = 64).as[(Long, Double)].collect()
    assert(got.head._1 === 7L)
  }

  test("batch IVF-PQ: one dataflow == the per-query path, query for query") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq4").toString + "/index"
    Similarity.ivfpqWriteIndex(emb, dir, nCells = 8, m = 4, kSub = 8)
    val qids = Seq(1L, 5L, 9L)
    val queries = emb.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val batch = Similarity.ivfpqBatchTopKFromIndex(spark, dir, queries, 5,
      nProbe = 4, shortlist = 32)
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)))
      .toMap
    qids.foreach { q =>
      val single = Similarity.ivfpqTopKFromIndex(spark, dir,
        emb.filter(col("vec_id") === q).select(col("embedding").as("qvec")),
        5, nProbe = 4, shortlist = 32).as[(Long, Double)].collect()
      assert(batch(q).map(_._1).toSeq === single.map(_._1).toSeq,
        s"qid $q: batch ${batch(q).toSeq} vs single ${single.toSeq}")
      // self first, exact scores agree to double precision
      assert(batch(q).head._1 === q)
      batch(q).map(_._2).zip(single.map(_._2)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-12) }
    }
    // the ADC kernel from the raw query == the precomputed-table kernel
    val model = Similarity.ivfpqReadModel(spark, Similarity.ivfIndexRoot(spark, dir))
    val q1 = emb.filter(col("vec_id") === 1L).select(col("embedding"))
      .collect().head.getSeq[Float](0).toArray.map(_.toDouble)
    val enc = graft.operators.ProductQuantization.encode(
      emb.filter(col("embedding").isNotNull), "embedding", model)
    val viaTable = enc.select(col("vec_id"),
      graft.functions.Vectors.pqAdc(col("pq_code"), model.adcTable(q1)).as("d"))
    val viaQuery = enc.select(col("vec_id"),
      graft.functions.Vectors.pqAdcQuery(col("pq_code"),
        lit(q1).cast("array<double>"), model.codebooks).as("d2"))
    assert(viaTable.join(viaQuery, "vec_id")
      .filter(abs(col("d") - col("d2")) > 1e-9).count() === 0)
  }
}
