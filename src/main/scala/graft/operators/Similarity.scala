package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** Attach the `planes`-bit hyperplane signature used for LSH bucketing. */
  def withLshSignature(embeddings: DataFrame, planes: Int = 8, dims: Int = 64,
      vecCol: String = "embedding"): DataFrame =
    embeddings.withColumn("sig", hyperplaneSig(col(vecCol), planes, dims))

  /** Approximate top-k: only candidates in the query's LSH bucket (plus
    * hamming-1 neighbor buckets for recall) are scored. `querySig` must be
    * computed with the same planes/dims. */
  def lshTopK(embeddings: DataFrame, query: DataFrame, k: Int,
      planes: Int = 8, dims: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sigged = withLshSignature(embeddings, planes, dims, vecCol)
    val qsig = withLshSignature(query.withColumnRenamed("qvec", vecCol), planes, dims, vecCol)
      .withColumnRenamed(vecCol, "qvec")
    // query bucket + all hamming-1 buckets (flip each bit)
    val neighborSigs = qsig.select(col("qvec"),
      explode(array((col("sig") +:
        (0 until planes).map(p => col("sig").bitwiseXOR(lit(1L << p)))): _*)).as("sig"))
    sigged.join(broadcast(neighborSigs), Seq("sig"))
      .withColumn("cos", cosine(col(vecCol), col("qvec")))
      .orderBy(col("cos").desc, col(idCol).asc)
      .select(col(idCol), col("cos"))
      .limit(k)
  }

  /** IVF-style approximate top-k: a deterministic coarse quantizer (the
    * `nCells` lowest-id vectors act as centroids) partitions the corpus into
    * cells by nearest centroid; a query scores only the `nProbe` cells whose
    * centroids are closest to it. The 100 TB shape: cell assignment is a
    * broadcast argmin at ingest (write-once, partition-by-cell), and each
    * query reads nProbe/nCells of the data. */
  def ivfTopK(embeddings: DataFrame, query: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = embeddings.orderBy(col(idCol).asc).limit(nCells)
      .select(col(idCol).as("cell_id"), col(vecCol).as("centroid"))
    // assign every vector to its nearest centroid (broadcast argmin)
    val byVec = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("d2").asc, col("cell_id").asc)
    val assigned = embeddings.crossJoin(broadcast(centroids))
      .withColumn("d2", l2sq(col(vecCol), col("centroid")))
      .withColumn("rk", row_number().over(byVec))
      .filter(col("rk") === 1)
      .select(col(idCol), col(vecCol), col("cell_id"))
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
}
