package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Vectors._

/** Similarity search over embedding columns (north star).
  *
  * Scale design: brute-force top-k is the exactness baseline — a single
  * embarrassingly-parallel scan ending in TakeOrderedAndProject (per-task
  * heap of k, driver merges k×tasks rows — no global sort, no shuffle of
  * the corpus). The LSH path buckets by deterministic random-hyperplane
  * signatures so candidate generation is an equi-join on the signature —
  * the 100 TB shape where scanning everything per query is off the table.
  *
  * LSH tuning (planes × probeRadius): `planes` bits give 2^planes buckets,
  * so one probe scans ~1/2^planes of the corpus; multi-probe at hamming
  * radius r scans sum(C(planes, 0..r)) buckets. Raising planes cuts
  * per-probe cost 2× per bit but loses recall (near neighbors disagree on
  * more bits); raising probeRadius buys that recall back at linear probe
  * cost. At 100 TB the operating point is high planes (16-24 ⇒ each bucket
  * is ~1e-5..1e-7 of the corpus, written bucket-partitioned at ingest) with
  * radius 1-2; the defaults here (8, 1) match the small reference corpora.
  */
object Similarity {

  /** Exact cosine top-k against one query vector (given as a 1-row DF with
    * column `qvec`). */
  def bruteForceTopK(embeddings: DataFrame, query: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    embeddings.crossJoin(broadcast(query))
      .withColumn("cos", cosine(col(vecCol), col("qvec")))
      .orderBy(col("cos").desc, col(idCol).asc)
      .select(col(idCol), col("cos"))
      .limit(k)

  /** Batched EXACT cosine top-k: every row of `queries` (`qidCol`, `qvec`)
    * gets its own top-k over the corpus in one join + one grouped
    * bounded-heap aggregation — the multi-query generalization of
    * [[bruteForceTopK]]. No per-query scan, no driver loop: the query
    * table broadcasts onto the corpus scan (every corpus row scores
    * against every query map-side) and [[TopKByScore]] ships ≤ k pairs
    * per (task, query) into the shuffle. Exactness baseline: cost is
    * |corpus|·|queries| score evaluations, so it is the right tool for
    * query batches small enough to broadcast; [[lshBatchTopK]] /
    * [[ivfBatchTopK]] are the 100 TB shapes where it is not. */
  def batchBruteForceTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid"): DataFrame =
    groupedTopK(
      embeddings.crossJoin(broadcast(queries))
        .select(col(qidCol), col(idCol),
          cosine(col(vecCol), col("qvec")).as("cos")),
      k, qidCol, idCol)

  /** Batched approximate top-k over the hyperplane-LSH buckets: each query
    * explodes into its multi-probe bucket set (1 + sum C(planes, 1..r)
    * rows), candidates come from ONE equi-join on the signature, and the
    * per-query heads come from the same grouped bounded-heap aggregation
    * as [[batchBruteForceTopK]] — so a table of millions of queries is one
    * bucket-keyed join (shuffle-hash on `sig` when the probe table
    * outgrows broadcast; AQE decides), never a per-query broadcast or a
    * driver loop. Work per query is its probed buckets' occupancy, not the
    * corpus. */
  def lshBatchTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
      planes: Int = 8, dims: Int = 64, probeRadius: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid"): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= planes,
      s"probeRadius must be in 0..$planes, got $probeRadius")
    val sigged = withLshSignature(embeddings, planes, dims, vecCol)
    val masks: Seq[Long] = (0 to probeRadius).flatMap(r =>
      (0 until planes).combinations(r).map(_.map(p => 1L << p).sum))
    // distinct masks ⇒ distinct probed sigs per query ⇒ no duplicate
    // (query, candidate) pairs ever reach the heap
    val probes = queries
      .withColumn("sig", hyperplaneSig(col("qvec"), planes, dims))
      .select(col(qidCol), col("qvec"),
        explode(array(masks.map(m => col("sig").bitwiseXOR(lit(m))): _*)).as("sig"))
    groupedTopK(
      sigged.join(probes, Seq("sig"))
        .select(col(qidCol), col(idCol),
          cosine(col(vecCol), col("qvec")).as("cos")),
      k, qidCol, idCol)
  }

  /** Batched approximate top-k over the IVF cells: every query picks its
    * `nProbe` nearest cells MAP-SIDE (the broadcast centroid-array argmin
    * of [[assignCells]], sorted and sliced — no shuffle of the query
    * table), candidates come from one equi-join on `cell_id`, heads from
    * the grouped bounded heap. Against a stored index the `assigned` side
    * is the materialized cell partitions — the join reads only cells some
    * query probes. */
  def ivfBatchTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid"): DataFrame = {
    val centroids = ivfCentroids(embeddings, nCells, idCol, vecCol)
    val assigned = assignCells(embeddings, centroids, idCol, vecCol)
    val centArr = centroids
      .agg(sort_array(collect_list(struct(col("cell_id"), col("centroid"))))
        .as("__cents"))
    val probes = queries.crossJoin(broadcast(centArr))
      .withColumn("__probe", explode(slice(array_sort(
        transform(col("__cents"), c =>
          struct(l2sq(col("qvec"), c.getField("centroid")).as("d2"),
            c.getField("cell_id").as("cell_id")))), 1, nProbe)))
      .select(col(qidCol), col("qvec"), col("__probe.cell_id").as("cell_id"))
    groupedTopK(
      assigned.join(probes, Seq("cell_id"))
        .select(col(qidCol), col(idCol),
          cosine(col(vecCol), col("qvec")).as("cos")),
      k, qidCol, idCol)
  }

  /** Per-query bounded-heap top-k: ≤ k (id, cos) pairs per (task, query)
    * enter the shuffle regardless of candidate count — the scale property
    * that makes the batched paths one aggregation instead of a per-query
    * TakeOrderedAndProject. Output: (qid, idCol, cos, rank), rank 1-based
    * by (cos desc, id asc) — bit-deterministic because cos is the same
    * IEEE expression everywhere and ties fall to the id. */
  private def groupedTopK(scored: DataFrame, k: Int,
      qidCol: String, idCol: String): DataFrame = {
    // the heap state is (Long, Double); a silent long cast of a string or
    // decimal id would NULL every result, so non-integral ids are rejected
    // loudly — map them to a surrogate long (xxhash64/monotonic id) before
    // batching, or use the single-query paths, which preserve the id type
    Seq(qidCol, idCol).foreach { c =>
      import org.apache.spark.sql.types._
      val dt = scored.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"batched top-k requires an integral $c column, got ${dt.simpleString}")
    }
    val spark = scored.sparkSession
    import spark.implicits._
    scored
      .select(col(qidCol).cast("long"), col(idCol).cast("long"),
        col("cos").cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => ScoredId(t._2, t._3))
      .agg(new TopKByScore(k).toColumn.name("topk"))
      .toDF(qidCol, "topk")
      .select(col(qidCol), posexplode(col("topk")).as(Seq("__pos", "__s")))
      .select(col(qidCol), col("__s.id").as(idCol),
        col("__s.score").as("cos"), (col("__pos") + 1).cast("long").as("rank"))
  }

  /** Attach the `planes`-bit hyperplane signature used for LSH bucketing. */
  def withLshSignature(embeddings: DataFrame, planes: Int = 8, dims: Int = 64,
      vecCol: String = "embedding"): DataFrame =
    embeddings.withColumn("sig", hyperplaneSig(col(vecCol), planes, dims))

  /** Approximate top-k: only candidates in the query's LSH bucket (plus all
    * neighbor buckets within hamming distance `probeRadius`, for recall) are
    * scored. The query-side signature must use the same planes/dims. */
  def lshTopK(embeddings: DataFrame, query: DataFrame, k: Int,
      planes: Int = 8, dims: Int = 64, probeRadius: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= planes,
      s"probeRadius must be in 0..$planes, got $probeRadius")
    val sigged = withLshSignature(embeddings, planes, dims, vecCol)
    val qsig = withLshSignature(query.withColumnRenamed("qvec", vecCol), planes, dims, vecCol)
      .withColumnRenamed(vecCol, "qvec")
    // all masks with <= probeRadius bits set: query bucket (0), then every
    // hamming-1, hamming-2, ... neighbor bucket
    val masks: Seq[Long] = (0 to probeRadius).flatMap(r =>
      (0 until planes).combinations(r).map(_.map(p => 1L << p).sum))
    val neighborSigs = qsig.select(col("qvec"),
      explode(array(masks.map(m => col("sig").bitwiseXOR(lit(m))): _*)).as("sig"))
    sigged.join(broadcast(neighborSigs), Seq("sig"))
      .withColumn("cos", cosine(col(vecCol), col("qvec")))
      .orderBy(col("cos").desc, col(idCol).asc)
      .select(col(idCol), col("cos"))
      .limit(k)
  }

  /** IVF-style approximate top-k: a deterministic sampled-k-means coarse
    * quantizer partitions the corpus into cells by nearest centroid; a
    * query scores only the `nProbe` cells whose centroids are closest to
    * it. The 100 TB shape: cell assignment is a broadcast argmin at ingest
    * (write-once, partition-by-cell), and each query reads nProbe/nCells
    * of the data.
    *
    * RECALL is governed by the nProbe/nCells ratio, and the defaults here
    * (4 of 16 = 25%) are the MEASURED floor for ~0.8 recall@10 on weakly
    * clustered embeddings — on the driver corpus (BENCH_NOTES r15,
    * `tools/AnnRecall`): nProbe 2/32 ⇒ 0.345, 4/32 ⇒ 0.505, 8/32 ⇒
    * 0.67, 16/32 ⇒ 0.84. Strongly clustered real-world embeddings do
    * better at the same ratio; uniform random vectors do worse. Rule of
    * thumb: probe ≥ 25% of cells ([[recommendedNProbe]]) unless you have
    * measured your corpus with [[ivfRecallAt]]; raising nCells without
    * raising nProbe silently TRADES RECALL FOR SPEED. The same knob and
    * numbers apply to every IVF entry point (`ivfBatchTopK`,
    * `ivfTopKFromIndex`, `ivfBatchTopKFromIndex`, `ivfpqTopKFromIndex` —
    * the PQ variants add shortlist re-ranking on top, equal to plain IVF
    * at shortlist ≥ 256). */
  def ivfTopK(embeddings: DataFrame, query: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = ivfCentroids(embeddings, nCells, idCol, vecCol)
    val assigned = assignCells(embeddings, centroids, idCol, vecCol)
    // the query probes its nProbe nearest cells
    val probed = query.crossJoin(broadcast(centroids))
      .withColumn("d2", l2sq(col("qvec"), col("centroid")))
      .orderBy(col("d2").asc, col("cell_id").asc)
      .limit(nProbe)
      .select(col("qvec"), col("cell_id"))
    assigned.join(broadcast(probed), Seq("cell_id"))
      .withColumn("cos", cosine(col(vecCol), col("qvec")))
      .orderBy(col("cos").desc, col(idCol).asc)
      .select(col(idCol), col("cos"))
      .limit(k)
  }

  /** The nProbe targeting ~0.8 recall@10 on weakly clustered data: 25% of
    * the cells (measured — see the recall table on [[ivfTopK]]). Use as
    * the safe default when the corpus has not been measured with
    * [[ivfRecallAt]]; halve it only after the measurement says so. */
  def recommendedNProbe(nCells: Int): Int =
    math.max(1, math.ceil(nCells / 4.0).toInt)

  /** Deterministic coarse quantizer: Lloyd k-means over a HASH-ORDERED
    * sample, run on the driver. Why not the nCells lowest-id vectors (the
    * old quantizer): arbitrary-id centroids are ingestion-order-biased and
    * on clustered real embeddings give wildly unbalanced cells — the
    * hot-partition failure the IVF index exists to avoid. Why a driver
    * k-means is the right scale shape: the sample is capped at `sampleCap`
    * rows (md5-of-id order — engine-portable hash randomness, same family
    * as [[Sampling]]; TakeOrderedAndProject, never a global sort), so the
    * collect is bounded by CONFIG, not data scale (4096×64 floats ≈ 1 MB),
    * and sequential driver arithmetic makes the quantizer bit-deterministic
    * across reruns/partitionings — which the index/in-memory equivalence
    * contract needs. Ties break to the lowest cell id; an emptied cell
    * keeps its previous centroid (never a NaN, never a lost cell id). */
  private[operators] def ivfCentroids(embeddings: DataFrame, nCells: Int,
      idCol: String, vecCol: String,
      sampleCap: Int = 4096, iters: Int = 10): DataFrame = {
    val spark = embeddings.sparkSession
    import org.apache.spark.sql.types._
    val centSchema = StructType(Seq(
      StructField("cell_id", LongType, nullable = false),
      StructField("centroid", ArrayType(FloatType))))
    val sample: Array[Array[Double]] = embeddings
      .filter(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(sampleCap)
      .collect()
      .map(_.getSeq[Float](1).toArray.map(_.toDouble))
    val init = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    sample.foreach { v =>
      if (init.length < nCells && !init.exists(_.sameElements(v))) init += v
    }
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    if (init.nonEmpty) {
      val dims = init.head.length
      var cents = init.toArray
      var it = 0
      while (it < iters) {
        val sums = Array.fill(cents.length)(new Array[Double](dims))
        val counts = new Array[Long](cents.length)
        sample.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cents.length) {
            var d = 0.0; var i = 0
            while (i < dims) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c } // strict < ⇒ lowest cell wins ties
            c += 1
          }
          var i = 0
          while (i < dims) { sums(best)(i) += v(i); i += 1 }
          counts(best) += 1
        }
        cents = cents.indices.map { c =>
          if (counts(c) == 0) cents(c)
          else sums(c).map(_ / counts(c))
        }.toArray
        it += 1
      }
      cents.zipWithIndex.foreach { case (v, c) =>
        rows.add(org.apache.spark.sql.Row(c.toLong, v.map(_.toFloat).toSeq))
      }
    }
    spark.createDataFrame(rows, centSchema)
  }

  /** Incrementally ingest NEW vectors into a stored IVF index: assign them
    * to the index's OWN centroids (read from `<path>/_centroids` — the
    * quantizer is immutable once written; re-clustering here would silently
    * re-map existing cells, the drift class the stored-centroid design
    * exists to prevent) and APPEND the assignments to the cell partitions.
    * The 100 TB ANN ingest shape: each batch is a map-side broadcast argmin
    * plus an append of only the new rows — the existing index is never
    * read, shuffled, or rewritten. Re-quantize (a fresh [[ivfWriteIndex]])
    * only when accumulated drift degrades cell balance or recall. */
  def ivfAppendToIndex(newVectors: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = newVectors.sparkSession
    val root = ivfIndexRoot(spark, path)
    val centroids = spark.read.parquet(s"$root/_centroids")
    assignCells(newVectors, centroids, idCol, vecCol)
      .write
      .partitionBy("cell_id")
      .mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$root/cells")
  }

  /** Resolve the index's live generation root: `<path>/_commit` names the
    * committed generation dir (written atomically by [[ivfWriteIndex]]);
    * an index from before the manifest scheme is its own root. Reads that
    * resolve through this see exactly one committed generation — a
    * re-quantize in progress is invisible until its one manifest swap. */
  def ivfIndexRoot(spark: SparkSession, path: String): String = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(hconf)
    readCommit(fs, live).map(g => s"$path/$g").getOrElse(path)
  }

  private def readCommit(fs: org.apache.hadoop.fs.FileSystem,
      table: org.apache.hadoop.fs.Path): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(table, "_commit")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .next().trim)
      finally in.close()
    }
  }

  /** The one atomic publish step: `_commit.tmp` written, then a POSIX
    * rename-with-overwrite onto `_commit` — a reader resolves the old
    * generation or the new one, never a partial manifest. */
  private def swapCommit(hconf: org.apache.hadoop.conf.Configuration,
      table: org.apache.hadoop.fs.Path, gen: String): Unit = {
    val fs = table.getFileSystem(hconf)
    val tmp = new org.apache.hadoop.fs.Path(table, "_commit.tmp")
    val out = fs.create(tmp, true)
    try out.write((gen + "\n").getBytes("UTF-8"))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(table.toUri, hconf)
    fc.rename(tmp, new org.apache.hadoop.fs.Path(table, "_commit"),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Assign every vector to its nearest centroid MAP-SIDE: the centroid
    * table collapses to a single array row, broadcast onto every vector,
    * and the argmin is an array_min over (d2, cell_id) structs — struct
    * ordering gives the d2-then-lowest-cell_id tie-break. No exchange
    * touches the corpus before assignment (a Window.partitionBy(vec_id)
    * argmin here would shuffle the whole corpus for a per-row decision). */
  private[operators] def assignCells(embeddings: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val centArr = centroids
      .agg(sort_array(collect_list(struct(col("cell_id"), col("centroid"))))
        .as("__cents"))
    embeddings.crossJoin(broadcast(centArr))
      .withColumn("cell_id",
        array_min(transform(col("__cents"), c =>
          struct(l2sq(col(vecCol), c.getField("centroid")).as("d2"),
            c.getField("cell_id").as("cell_id")))).getField("cell_id"))
      .select(col(idCol), col(vecCol), col("cell_id"))
  }

  /** Write the IVF index to disk: every vector assigned to its nearest
    * centroid (broadcast argmin, no corpus shuffle beyond the partition
    * write), stored as parquet PARTITIONED BY cell, alongside the centroid
    * table itself (`<path>/_centroids`) — the quantizer is part of the
    * index, never re-derived from a live table that may have changed since
    * the write (silent wrong-cell probing) and never re-scanned at query
    * time. Queries against the stored index read only their probed cells
    * via partition pruning (metadata-only cell selection). */
  /** Whole-corpus quantizer: [[Clustering.fit]] folds EVERY vector into
    * every Lloyd update (exact-decimal accumulators — deterministic under
    * any partitioning) instead of the 4096-row sample the driver quantizer
    * caps at. Same output contract as [[ivfCentroids]]: (cell_id, centroid
    * float array), an emptied cell keeps its seed. Reach for it when the
    * corpus is so clustered that a 4096-row sample misrepresents cell
    * balance; the cost is `iters` distributed passes instead of a bounded
    * driver loop. */
  private[operators] def ivfCentroidsDistributed(embeddings: DataFrame,
      nCells: Int, idCol: String, vecCol: String,
      iters: Int = 10): DataFrame = {
    val spark = embeddings.sparkSession
    import org.apache.spark.sql.types._
    val seeds = Clustering.seedsByHashSample(embeddings, idCol, vecCol, nCells)
    val scope = new CacheScope
    val model =
      try Clustering.fit(embeddings, vecCol, seeds, maxIter = iters,
        tol = 1e-9, scope = scope)
      finally scope.unpersistAll()
    val centSchema = StructType(Seq(
      StructField("cell_id", LongType, nullable = false),
      StructField("centroid", ArrayType(FloatType))))
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    model.centroids.zipWithIndex.foreach { case (v, c) =>
      rows.add(org.apache.spark.sql.Row(c.toLong, v.map(_.toFloat).toSeq))
    }
    spark.createDataFrame(rows, centSchema)
  }

  def ivfWriteIndex(embeddings: DataFrame, path: String,
      nCells: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding",
      wholeCorpusQuantizer: Boolean = false): Unit = {
    // both halves of the index are written under a NEW generation dir and
    // published with ONE atomic manifest swap: independent overwrites of a
    // live path could expose new cells paired with old centroids to a
    // failure or a concurrent reader — exactly the quantizer-drift class
    // storing the centroids in the index exists to prevent. Unlike the
    // earlier demote/promote rename pair, the manifest swap has NO window
    // where the index is absent: a reader resolves the old generation or
    // the new one, and a crash anywhere before the swap leaves the old
    // index untouched (the half-written generation is garbage, collected
    // by the next write). The superseded generation survives until the
    // NEXT write's collection, so an in-flight reader of the old manifest
    // keeps working through one re-quantize.
    val spark = embeddings.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(hconf)
    fs.mkdirs(live)
    val cur = readCommit(fs, live)
    val curN = cur.flatMap(g =>
      scala.util.Try(g.stripPrefix("gen-").toLong).toOption).getOrElse(0L)
    // GC superseded + crashed-orphan generations (everything but the live
    // one) BEFORE staging, so this generation's name is free even after a
    // crashed attempt of the same number
    fs.listStatus(live).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("gen-") && !cur.contains(n))
        fs.delete(st.getPath, true)
    }
    val genName = s"gen-${curN + 1}"
    val genDir = new org.apache.hadoop.fs.Path(live, genName)
    val centroids =
      if (wholeCorpusQuantizer)
        ivfCentroidsDistributed(embeddings, nCells, idCol, vecCol)
      else ivfCentroids(embeddings, nCells, idCol, vecCol)
    assignCells(embeddings, centroids, idCol, vecCol)
      .write
      .partitionBy("cell_id")
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$genDir/cells")
    centroids.coalesce(1).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$genDir/_centroids")
    swapCommit(hconf, live, genName)
    // one-time migration: a legacy (pre-manifest) layout at the root is
    // superseded the moment the manifest exists — drop it
    if (cur.isEmpty) {
      fs.delete(new org.apache.hadoop.fs.Path(live, "cells"), true)
      fs.delete(new org.apache.hadoop.fs.Path(live, "_centroids"), true)
    }
  }

  /** Approximate top-k against a stored IVF index: the query's nProbe
    * nearest cells become a LITERAL partition filter on the index read, so
    * the scan touches nProbe/nCells of the data and the pruning is decided
    * from partition metadata alone — no data file is opened for an
    * unprobed cell. Centroids come from the index itself (written by
    * [[ivfWriteIndex]]); the probed ids are resolved on the driver: a
    * collect of ≤ nProbe values bounded by the QUANTIZER size (never by
    * data scale), the same class of driver-side decision as a broadcast
    * threshold — and what turns a runtime join into static pruning. */
  def ivfTopKFromIndex(spark: SparkSession, path: String,
      query: DataFrame, k: Int, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // resolve the generation ONCE: centroids and cells must come from the
    // SAME committed snapshot even if a re-quantize publishes mid-query
    val root = ivfIndexRoot(spark, path)
    val centroids = spark.read.parquet(s"$root/_centroids")
    val probedCells: Array[Long] = query.crossJoin(broadcast(centroids))
      .withColumn("d2", l2sq(col("qvec"), col("centroid")))
      .orderBy(col("d2").asc, col("cell_id").asc)
      .limit(nProbe)
      .select(col("cell_id").cast("long"))
      .collect().map(_.getLong(0))
    if (probedCells.isEmpty) {
      // empty index (or empty quantizer): no cells to probe — and an
      // empty PARTITIONED write leaves no schema files to read
      import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField(idCol, centroids.schema("cell_id").dataType),
          StructField("cos", DoubleType))))
    }
    spark.read.parquet(s"$root/cells")
      .filter(col("cell_id").isin(probedCells.toIndexedSeq: _*))
      .crossJoin(broadcast(query))
      .withColumn("cos", cosine(col(vecCol), col("qvec")))
      .orderBy(col("cos").desc, col(idCol).asc)
      .select(col(idCol), col("cos"))
      .limit(k)
  }

  /** Batched approximate top-k against a STORED index: every query picks
    * its nProbe cells from the index's own centroids (map-side broadcast
    * argmin), candidates come from one equi-join on `cell_id` against the
    * cell partitions, heads from the grouped bounded heap. The partition-
    * pruned scan of [[ivfTopKFromIndex]] generalizes here to "cells some
    * query probes": the pushed `cell_id` equi-join key prunes at the
    * row-group level, and a deployment can pre-filter the read to the
    * union of probed cells when the query batch is driver-bounded. */
  def ivfBatchTopKFromIndex(spark: SparkSession, path: String,
      queries: DataFrame, k: Int, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid"): DataFrame = {
    val root = ivfIndexRoot(spark, path)
    val centroids = spark.read.parquet(s"$root/_centroids")
    if (centroids.isEmpty) {
      // empty index/quantizer: nothing to probe, and an empty partitioned
      // write left no cell files to read
      import org.apache.spark.sql.types._
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField(qidCol, LongType), StructField(idCol, LongType),
          StructField("cos", DoubleType), StructField("rank", LongType))))
    }
    val centArr = centroids
      .agg(sort_array(collect_list(struct(col("cell_id"), col("centroid"))))
        .as("__cents"))
    val probes = queries.crossJoin(broadcast(centArr))
      .withColumn("__probe", explode(slice(array_sort(
        transform(col("__cents"), c =>
          struct(l2sq(col("qvec"), c.getField("centroid")).as("d2"),
            c.getField("cell_id").as("cell_id")))), 1, nProbe)))
      .select(col(qidCol), col("qvec"), col("__probe.cell_id").as("cell_id"))
    groupedTopK(
      spark.read.parquet(s"$root/cells").join(probes, Seq("cell_id"))
        .select(col(qidCol), col(idCol),
          cosine(col(vecCol), col("qvec")).as("cos")),
      k, qidCol, idCol)
  }

  /** Per-cell stored byte sizes of an IVF index — pure FILESYSTEM METADATA
    * (directory listing; zero data files opened, so it is safe to run
    * after every ingest batch even at 100 TB). Returns cell_id → bytes
    * for every cell partition present on disk. */
  def ivfCellBytes(spark: SparkSession, path: String): Map[Long, Long] = {
    val root = new org.apache.hadoop.fs.Path(ivfIndexRoot(spark, path), "cells")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Map.empty
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell_id="))
      .map { st =>
        val id = st.getPath.getName.stripPrefix("cell_id=").toLong
        val bytes = fs.listStatus(st.getPath)
          .filter(_.getPath.getName.endsWith(".parquet"))
          .map(_.getLen).sum
        id -> bytes
      }.toMap
  }

  /** Re-quantize advisor: true when accumulated [[ivfAppendToIndex]] drift
    * has degraded the cell layout enough that a fresh [[ivfWriteIndex]]
    * pays for itself. Trigger: the hottest cell holds more than
    * `maxImbalance`× the mean cell size (default 4 — the same bound
    * SimilaritySpec holds a FRESH quantizer to, so the predicate fires
    * exactly when the layout is worse than a rebuild would produce).
    * A hot cell is the IVF failure mode: probe cost is cell occupancy, so
    * one runaway cell makes every query probing it pay a near-full-scan,
    * and at 100 TB it is also the straggler partition. Metadata-only
    * (directory sizes) — run it after every append batch; measure actual
    * recall decay with [[ivfRecallAt]] on a sampled query set when the
    * predicate fires. */
  def ivfShouldRequantize(spark: SparkSession, path: String,
      maxImbalance: Double = 4.0): Boolean = {
    val sizes = ivfCellBytes(spark, path).values
    if (sizes.isEmpty) return false
    val mean = sizes.sum.toDouble / sizes.size
    mean > 0 && sizes.max > maxImbalance * mean
  }

  /** Close the advisory loop: when [[ivfShouldRequantize]] fires, rebuild
    * the quantizer FROM THE INDEX'S OWN vectors (read of the live
    * generation's cells — the only data pass, and only when firing) and
    * publish through the same one-swap generation scheme as
    * [[ivfWriteIndex]]: an in-flight reader of the superseded generation
    * keeps the documented one-cycle grace, a crash mid-rebuild leaves the
    * live index untouched. A quiet advisory is a metadata-only no-op
    * (directory listing, zero data files opened), so this is safe to call
    * after every ingest batch — the maintenance loop a 100 TB deployment
    * wires after [[ivfAppendToIndex]] instead of watching a dashboard.
    * `nCells` defaults to the live quantizer's cell count. Returns true
    * iff a rebuild was published. */
  def ivfMaintain(spark: SparkSession, path: String,
      maxImbalance: Double = 4.0, nCells: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): Boolean = {
    if (!ivfShouldRequantize(spark, path, maxImbalance)) return false
    val root = ivfIndexRoot(spark, path)
    val cells =
      if (nCells > 0) nCells
      else spark.read.parquet(s"$root/_centroids").count().toInt
    val vectors = spark.read.parquet(s"$root/cells")
      .select(col(idCol), col(vecCol))
    ivfWriteIndex(vectors, path, cells, idCol, vecCol)
    true
  }

  /** Measured recall@k of the stored index for a query batch: the mean
    * fraction of each query's true (brute-force) top-k over the index's
    * own vectors that the probed search returns. A DIAGNOSTIC — it reads
    * the full index once for the brute-force baseline, so run it on a
    * sampled query set when [[ivfShouldRequantize]] fires, not per batch. */
  def ivfRecallAt(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid"): Double = {
    val root = ivfIndexRoot(spark, path)
    val corpus = spark.read.parquet(s"$root/cells")
    val exact = batchBruteForceTopK(corpus, queries, k, idCol, vecCol, qidCol)
      .select(col(qidCol), col(idCol))
    val got = ivfBatchTopKFromIndex(spark, path, queries, k, nProbe,
      idCol, vecCol, qidCol)
      .select(col(qidCol), col(idCol))
    val n = queries.count()
    if (n == 0) return 1.0
    val totalHits = exact.intersect(got)
      .agg(coalesce(count(lit(1)), lit(0L))).collect().head.getLong(0)
    totalHits.toDouble / (n * k)
  }

  /** SemDeDup-style semantic near-dup pairs (Abbas et al., "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication",
    * 2023 — published method): the deterministic sampled-k-means coarse
    * quantizer buckets the corpus into cells; cosine pairs are scored
    * WITHIN each cell only. The 100 TB shape: candidate generation is the
    * cell equi-join (per-cell quadratic, never globally quadratic), the
    * assignment is the same map-side broadcast argmin the IVF index uses —
    * a deployment with a stored index reuses its materialized `cell_id`
    * partitions and pays only the pairing. Scored pairs are EXACT cosine,
    * so precision is 1.0 by construction; the approximation is recall — a
    * pair split across two cells is never scored (the same recall-vs-cost
    * dial as LSH: more cells ⇒ cheaper buckets, more boundary misses). */
  def semanticNearDups(embeddings: DataFrame, nCells: Int, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = ivfCentroids(embeddings, nCells, idCol, vecCol)
    val assigned = assignCells(embeddings, centroids, idCol, vecCol)
    nearDupPairs(assigned, "cell_id", threshold, idCol, vecCol)
  }

  /** Full semantic dedup: keep ONE representative per connected component
    * of the semantic near-dup graph — the pairs feed the pointer-doubling
    * CC collapse ([[Dedup.canonicalLabels]]), canonical = lowest id
    * (deterministic; which member a deployment keeps is policy, the
    * collapse is the shape). Returns the surviving rows of `embeddings`. */
  def semanticDedup(embeddings: DataFrame, nCells: Int, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val pairs = semanticNearDups(embeddings, nCells, threshold, idCol, vecCol)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    Dedup.collapseToCanonical(embeddings, pairs, idCol)
      .filter(col("canonical_id") === col(idCol))
      .drop("canonical_id")
  }

  /** All near-duplicate pairs above a cosine threshold, bucketed by an
    * equi-join key (label / LSH signature) to avoid the global cross join. */
  def nearDupPairs(embeddings: DataFrame, bucketCol: String, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = embeddings.select(col(idCol), col(bucketCol), col(vecCol))
    val a = e.as("a"); val b = e.as("b")
    a.join(b, col(s"a.$bucketCol") === col(s"b.$bucketCol") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("cos", cosine(col(s"a.$vecCol"), col(s"b.$vecCol")))
      .filter(col("cos") > threshold)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"), col("cos"))
  }

  // ------------------------------------------------------------------
  // IVF-PQ: the billion-scale composition (Jégou et al., "Product
  // Quantization for Nearest Neighbor Search", TPAMI 2011; the FAISS
  // IVFPQ layout) — coarse IVF cells for partition pruning, PQ codes for
  // candidate ranking WITHOUT reading the float column. At 100 TB the
  // query path reads: centroids (k rows), the probed cells' (id, code)
  // columns (m ints/vector — the embedding column is pruned OUT of the
  // scan), and full vectors for the shortlist rows only.
  // ------------------------------------------------------------------

  /** Write an IVF index whose cell rows ALSO carry PQ codes, plus the
    * codebooks (`_pq`: one row per (sub, code) with the centroid as
    * array<double>), all under one generation dir published by the same
    * single manifest swap as [[ivfWriteIndex]] — cells, centroids and
    * codebooks are always one consistent snapshot. Training: joint
    * one-pass-per-iteration Lloyd ([[ProductQuantization.fit]]) from
    * hash-sampled seeds; encoding rides the same pass that assigns IVF
    * cells (one map-side projection, no extra scan). */
  def ivfpqWriteIndex(embeddings: DataFrame, path: String,
      nCells: Int = 16, m: Int = 4, kSub: Int = 16, pqIters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      wholeCorpusQuantizer: Boolean = false): Unit = {
    val spark = embeddings.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(hconf)
    val cur = readCommit(fs, live)
    val curN = cur.map(_.stripPrefix("gen-").toInt).getOrElse(0)
    cur.foreach { _ =>
      // prune superseded generations except the live one (readers of the
      // prior snapshot get the same one-cycle grace as ivfWriteIndex)
      fs.listStatus(live).filter { st =>
        st.isDirectory && st.getPath.getName.startsWith("gen-") &&
          st.getPath.getName != cur.get &&
          st.getPath.getName.stripPrefix("gen-").toInt < curN
      }.foreach(st => fs.delete(st.getPath, true))
    }
    val genName = s"gen-${curN + 1}"
    val genDir = new org.apache.hadoop.fs.Path(live, genName)
    val centroids =
      if (wholeCorpusQuantizer)
        ivfCentroidsDistributed(embeddings, nCells, idCol, vecCol)
      else ivfCentroids(embeddings, nCells, idCol, vecCol)
    val scope = new CacheScope
    val model =
      try {
        val seeds = ProductQuantization.seedsByHashSample(
          embeddings, idCol, vecCol, m, kSub)
        ProductQuantization.fit(embeddings, vecCol, seeds,
          maxIter = pqIters, tol = 1e-9, scope = scope)
      } finally scope.unpersistAll()
    ProductQuantization.encode(
        assignCells(embeddings, centroids, idCol, vecCol), vecCol, model)
      .write
      .partitionBy("cell_id")
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$genDir/cells")
    centroids.coalesce(1).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$genDir/_centroids")
    // codebooks flattened to rows — rebuilt driver-side at query time
    // (m×k×dsub doubles, config-bounded)
    import org.apache.spark.sql.types._
    val bookSchema = StructType(Seq(
      StructField("sub", IntegerType, nullable = false),
      StructField("code", IntegerType, nullable = false),
      StructField("centroid", ArrayType(DoubleType), nullable = false)))
    val bookRows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    for (s <- 0 until model.m; c <- 0 until model.k)
      bookRows.add(org.apache.spark.sql.Row(s, c,
        model.codebooks(s)(c).toSeq))
    spark.createDataFrame(bookRows, bookSchema).coalesce(1).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$genDir/_pq")
    swapCommit(hconf, live, genName)
  }

  /** The index's PQ codebooks, rebuilt from the committed `_pq` rows —
    * the quantizer is part of the snapshot, never re-derived. */
  def ivfpqReadModel(spark: SparkSession, root: String)
      : ProductQuantization.PQModel = {
    val rows = spark.read.parquet(s"$root/_pq")
      .orderBy(col("sub"), col("code")).collect()
    require(rows.nonEmpty, s"no PQ codebooks at $root/_pq")
    val m = rows.map(_.getInt(0)).max + 1
    val k = rows.map(_.getInt(1)).max + 1
    val books = Array.ofDim[Array[Double]](m, k)
    rows.foreach { r =>
      books(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
    }
    ProductQuantization.PQModel(books.map(_.toArray),
      books.map(_.map(_ => 0L)), 0, converged = true)
  }

  /** Incremental ingest into an IVF-PQ index: the batch is assigned and
    * ENCODED under the index's own frozen quantizer AND codebooks (both
    * read from the live snapshot — never re-trained), then appended to
    * the cell partitions. Same drift contract as [[ivfAppendToIndex]]:
    * codes stay mutually comparable because the codebooks never move;
    * accumulated imbalance is the [[ivfShouldRequantize]] advisory's job,
    * and a rebuild is one [[ivfpqWriteIndex]] publish. */
  def ivfpqAppendToIndex(newVectors: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = newVectors.sparkSession
    val root = ivfIndexRoot(spark, path)
    val centroids = spark.read.parquet(s"$root/_centroids")
    val model = ivfpqReadModel(spark, root)
    ProductQuantization.encode(
        assignCells(newVectors, centroids, idCol, vecCol), vecCol, model)
      .write
      .partitionBy("cell_id")
      .mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$root/cells")
  }

  /** The ADC candidate scan: probed cells only (LITERAL partition filter —
    * unprobed cells are pruned from metadata), and the scan's ReadSchema
    * is (id, code, cell) — THE FLOAT COLUMN IS NEVER READ. Returns the
    * `shortlist` best ids by ADC distance (TakeOrderedAndProject, no
    * global sort). Exposed separately so the plan is testable and a
    * deployment can feed its own re-rank. */
  def ivfpqShortlist(spark: SparkSession, path: String, q: Array[Double],
      shortlist: Int, nProbe: Int = 4,
      idCol: String = "vec_id"): DataFrame = {
    val root = ivfIndexRoot(spark, path)
    val model = ivfpqReadModel(spark, root)
    val centroids = spark.read.parquet(s"$root/_centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    val probed = centroids.map { case (cell, cent) =>
        var d = 0.0; var i = 0
        val n = math.min(q.length, cent.length)
        while (i < n) { val t = q(i) - cent(i); d += t * t; i += 1 }
        (d, cell)
      }.sorted.take(nProbe).map(_._2)
    val table = model.adcTable(q)
    spark.read.parquet(s"$root/cells")
      .filter(col("cell_id").isin(probed.toIndexedSeq: _*))
      .select(col(idCol),
        graft.functions.Vectors.pqAdc(col("pq_code"), table).as("adc_d2"))
      .orderBy(col("adc_d2").asc, col(idCol).asc)
      .limit(shortlist)
  }

  /** Batched IVF-PQ top-k — every row of `queries` (`qidCol`, `qvec`)
    * ranked in ONE dataflow, no per-query driver loop: each query probes
    * its nProbe cells against the broadcast centroid array, the probe set
    * equi-joins the cells scan ON `cell_id` reading (cell, id, code) ONLY
    * — the corpus float column never enters the ADC stage — and
    * [[graft.functions.Vectors.pqAdcQuery]] folds the reconstruction
    * distance per (row, query) pair map-side (d multiply-adds, codegen'd,
    * codebooks ride as a reference object since the query varies per row
    * and a per-query table would be a driver loop). A bounded heap keeps
    * `shortlist` candidates per query; the exact cosine re-rank then
    * reads vectors for shortlist rows only (equi-join on id). Same
    * output contract as [[ivfBatchTopKFromIndex]]: (qid, id, cos, rank).
    * Integral qid/id required (the [[TopKByScore]] heap contract). */
  def ivfpqBatchTopKFromIndex(spark: SparkSession, path: String,
      queries: DataFrame, k: Int, nProbe: Int = 4, shortlist: Int = 256,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid"): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val root = ivfIndexRoot(spark, path)
    val centroids = spark.read.parquet(s"$root/_centroids")
    if (centroids.isEmpty) {
      import org.apache.spark.sql.types._
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField(qidCol, LongType), StructField(idCol, LongType),
          StructField("cos", DoubleType), StructField("rank", LongType))))
    }
    val model = ivfpqReadModel(spark, root)
    val centArr = centroids
      .agg(sort_array(collect_list(struct(col("cell_id"), col("centroid"))))
        .as("__cents"))
    val probes = queries.crossJoin(broadcast(centArr))
      .withColumn("__probe", explode(slice(array_sort(
        transform(col("__cents"), c =>
          struct(l2sq(col("qvec"), c.getField("centroid")).as("d2"),
            c.getField("cell_id").as("cell_id")))), 1, nProbe)))
      .select(col(qidCol), col("qvec"), col("__probe.cell_id").as("cell_id"))
    val cells = spark.read.parquet(s"$root/cells")
    // ADC stage: smaller distance = better; the heap keeps LARGEST score,
    // so the shortlist ranks by negated distance (discarded afterwards)
    val scored = cells.select(col("cell_id"), col(idCol), col("pq_code"))
      .join(probes, Seq("cell_id"))
      .select(col(qidCol), col(idCol),
        negate(graft.functions.Vectors.pqAdcQuery(col("pq_code"),
          col("qvec").cast("array<double>"), model.codebooks)).as("cos"))
    val cand = groupedTopK(scored, shortlist, qidCol, idCol)
      .select(col(qidCol), col(idCol))
    val reranked = cells.select(col(idCol), col(vecCol))
      .join(cand, Seq(idCol))
      .join(broadcast(queries.select(col(qidCol), col("qvec"))), Seq(qidCol))
      .select(col(qidCol), col(idCol),
        cosine(col(vecCol), col("qvec")).as("cos"))
    groupedTopK(reranked, k, qidCol, idCol)
  }

  /** IVF-PQ top-k: ADC shortlist over codes, then an EXACT cosine re-rank
    * that reads full vectors for the shortlist rows only (semi-join into
    * the probed cells — the only touch of the float column). Same output
    * contract as [[ivfTopKFromIndex]]: (id, cos) by cosine desc, ties to
    * the lowest id. */
  def ivfpqTopKFromIndex(spark: SparkSession, path: String,
      query: DataFrame, k: Int, nProbe: Int = 4, shortlist: Int = 256,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val q = query.select(col("qvec")).collect().head
      .getSeq[Float](0).toArray.map(_.toDouble)
    val cand = ivfpqShortlist(spark, path, q, shortlist, nProbe, idCol)
      .select(col(idCol))
    val root = ivfIndexRoot(spark, path)
    spark.read.parquet(s"$root/cells")
      .join(broadcast(cand), Seq(idCol), "left_semi")
      .crossJoin(broadcast(query.select(col("qvec"))))
      .withColumn("cos", cosine(col(vecCol), col("qvec")))
      .orderBy(col("cos").desc, col(idCol).asc)
      .select(col(idCol), col("cos"))
      .limit(k)
  }
}
