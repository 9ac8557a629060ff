package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Vectors.nearestCentroid

/** Distributed Lloyd k-means over an `array<float>` embedding column — the
  * whole-corpus companion to the sample-capped driver quantizer in
  * [[Similarity.ivfCentroids]]: that one bounds its input by CONFIG (a
  * 4096-row hash-ordered sample) so tiny-driver determinism is easy; this
  * one folds EVERY vector into every update and keeps determinism anyway.
  *
  * Scale shape (the part that must survive 100 TB): each iteration is ONE
  * distributed pass — a map-side codegen'd argmin against the broadcast
  * centroid matrix ([[graft.functions.NearestCentroidF]] rides the plan as
  * a reference object, so there is no join, no shuffle of vectors), then
  * `posexplode` + partial hash aggregation on (cell, dim) — the shuffle
  * carries at most k×d×partitions pre-combined rows, never data-sized —
  * and a k×d collect (8×64 doubles here) that is bounded by config, not by
  * data. Driver state is the centroid matrix only.
  *
  * Determinism contract (what lets an oracle engine replay the loop
  * bit-for-bit, and reruns/repartitionings agree): distances accumulate
  * float→double in index order (same doubles as the SQL
  * `list_sum(list_transform(…))` formulation); ties break to the lowest
  * cell; and the per-dimension accumulator is an EXACT DECIMAL — each
  * element is rounded to 6 decimals (Spark's shortest-repr HALF_UP,
  * reproduced on the oracle side by `Registry.sroundSql`) and summed as
  * DECIMAL(18,6), so the fold order Spark chooses at runtime cannot change
  * the sum. New centroid = decimal sum cast to double, divided by the
  * cluster count — two deterministic IEEE ops. An emptied cluster keeps its
  * previous centroid (never NaN, never a lost cell id) — same rule as the
  * IVF quantizer.
  */
object Clustering {

  /** Fitted state: `centroids(c)(d)`; `sizes(c)` = cluster populations at
    * the LAST executed assignment (0 for an emptied cluster); `iterations`
    * actually run; `converged` = the final update moved no centroid
    * coordinate by more than `tol`. */
  final case class KMeansModel(
      centroids: Array[Array[Double]],
      sizes: Array[Long],
      iterations: Int,
      converged: Boolean)

  /** Deterministic, oracle-expressible seeding: the k lowest-id vectors,
    * widened float→double. Ingestion-order-biased by construction (two
    * identical low-id vectors seed twice and one cell starves) — fine for
    * a verifiable fixture or a well-shuffled corpus; prefer
    * [[seedsByHashSample]] for clustered real data. */
  def seedsByIdAsc(df: DataFrame, idCol: String, vecCol: String,
      k: Int): Array[Array[Double]] =
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol))
      .orderBy(col(idCol))
      .limit(k)
      .collect()
      .map(_.getSeq[Float](1).toArray.map(_.toDouble))

  /** Hash-ordered distinct seeding (the [[Similarity.ivfCentroids]] sample
    * discipline): md5-of-id order is engine-portable randomness, the limit
    * makes the collect config-bounded, duplicates are skipped so k seeds
    * are k distinct starting points. */
  def seedsByHashSample(df: DataFrame, idCol: String, vecCol: String,
      k: Int, sampleCap: Int = 4096): Array[Array[Double]] = {
    val sample = df.filter(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(sampleCap)
      .collect()
      .map(_.getSeq[Float](1).toArray.map(_.toDouble))
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    sample.foreach { v =>
      if (out.length < k && !out.exists(_.sameElements(v))) out += v
    }
    out.toArray
  }

  private def decimalDimSum(x: Column): Column =
    sum(round(x.cast("double"), 6).cast(DecimalType(18, 6)))

  /** Run Lloyd from `seeds` until convergence (`tol` on the max coordinate
    * move) or `maxIter`. The vector projection is persisted under `scope`
    * for the iteration loop (one scan per iteration, not one per seed). */
  def fit(df: DataFrame, vecCol: String, seeds: Array[Array[Double]],
      maxIter: Int = 20, tol: Double = 1e-9,
      scope: CacheScope = CacheScope.unmanaged): KMeansModel = {
    require(seeds.nonEmpty, "k-means needs at least one seed centroid")
    val data = scope.persist(
      df.filter(col(vecCol).isNotNull).select(col(vecCol).as("v")))
    var cents = seeds.map(_.clone())
    var sizes = new Array[Long](cents.length)
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val rows = data
        .select(nearestCentroid(col("v"), cents).as("cell"),
          posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg(decimalDimSum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      sizes = new Array[Long](cents.length)
      rows.foreach { r =>
        val cell = r.getInt(0); val dim = r.getInt(1)
        val s = r.getDecimal(2); val n = r.getLong(3)
        next(cell)(dim) = s.doubleValue / n
        sizes(cell) = n
      }
      var shift = 0.0
      var c = 0
      while (c < cents.length) {
        var d = 0
        while (d < cents(c).length) {
          val m = math.abs(next(c)(d) - cents(c)(d))
          if (m > shift) shift = m
          d += 1
        }
        c += 1
      }
      cents = next
      it += 1
      converged = shift <= tol
    }
    KMeansModel(cents, sizes, it, converged)
  }

  /** Attach the nearest-cell id (map-side, codegen, no join). */
  def assign(df: DataFrame, vecCol: String, centroids: Array[Array[Double]],
      outCol: String = "cell"): DataFrame =
    df.withColumn(outCol, nearestCentroid(col(vecCol), centroids))
}
