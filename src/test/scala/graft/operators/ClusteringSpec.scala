package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {

  private def vecDf(vecs: Seq[(Long, Array[Float])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = true)))
    val rows = new java.util.ArrayList[Row]()
    vecs.foreach { case (id, v) =>
      rows.add(Row(id, if (v == null) null else v.toSeq))
    }
    spark.createDataFrame(rows, schema)
  }

  /** Two tight blobs far apart + one outlier; seeds from the two blob
    * anchors (ids 0 and 10). */
  private def blobs: DataFrame = vecDf(
    (0L to 4L).map(i => i -> Array(0.0f + i * 0.01f, 0.0f)) ++
      (10L to 14L).map(i => i -> Array(5.0f + (i - 10) * 0.01f, 5.0f)) ++
      Seq(20L -> Array(2.5f, 2.6f)))

  /** Driver replica of fit()'s exact arithmetic (index-order double
    * distances, strict-< ties, 6-decimal HALF_UP decimal means, empty cell
    * keeps its centroid) — the sequential ground truth the distributed
    * loop must match bit-for-bit. */
  private def driverLloyd(vecs: Seq[Array[Float]], seeds: Array[Array[Double]],
      iters: Int): Array[Array[Double]] = {
    var cents = seeds.map(_.clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(cents.length, cents.head.length)(java.math.BigDecimal.ZERO)
      val counts = new Array[Long](cents.length)
      vecs.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        for (c <- cents.indices) {
          var d = 0.0
          for (i <- v.indices) { val t = v(i).toDouble - cents(c)(i); d += t * t }
          if (d < bestD) { bestD = d; best = c }
        }
        for (i <- v.indices) {
          val r = java.math.BigDecimal.valueOf(v(i).toDouble)
            .setScale(6, java.math.RoundingMode.HALF_UP)
          sums(best)(i) = sums(best)(i).add(r)
        }
        counts(best) += 1
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_.doubleValue / counts(c))
      }.toArray
    }
    cents
  }

  test("fit separates two blobs and converges before maxIter") {
    val seeds = Clustering.seedsByIdAsc(blobs, "vec_id", "embedding", 2)
    val m = Clustering.fit(blobs, "embedding", seeds, maxIter = 20, tol = 1e-12)
    assert(m.converged)
    assert(m.iterations < 20)
    // blob means (0.02, 0) and (5.02, 5); the outlier joins the far blob's
    // side deterministically
    assert(math.abs(m.centroids(0)(0) - 0.02) < 0.5)
    assert(math.abs(m.centroids(1)(1) - 5.0) < 1.0)
    assert(m.sizes.sum === 11L)
    val assigned = Clustering.assign(blobs, "embedding", m.centroids)
      .groupBy("cell").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(assigned.keySet === Set(0, 1))
  }

  test("distributed fit is bit-identical to the sequential driver replica") {
    val vecs = (0L until 40L).map { i =>
      i -> Array.tabulate(8)(d =>
        (math.sin(i * 0.7 + d) * 3.0 + (i % 4) * 2.0).toFloat)
    }
    val df = vecDf(vecs)
    val seeds = Clustering.seedsByIdAsc(df, "vec_id", "embedding", 4)
    val m = Clustering.fit(df, "embedding", seeds, maxIter = 3, tol = 0.0)
    val ref = driverLloyd(vecs.map(_._2), seeds, 3)
    for (c <- ref.indices; d <- ref(c).indices)
      assert(m.centroids(c)(d) === ref(c)(d),
        s"centroid ($c,$d) diverged from the sequential replica")
  }

  test("result is independent of partitioning (exact decimal accumulators)") {
    val vecs = (0L until 60L).map { i =>
      i -> Array.tabulate(6)(d => (math.cos(i * 1.3 + d * 0.9) * 5.0).toFloat)
    }
    val df1 = vecDf(vecs).repartition(1)
    val df2 = vecDf(vecs).repartition(13)
    val seeds = Clustering.seedsByIdAsc(df1, "vec_id", "embedding", 3)
    val m1 = Clustering.fit(df1, "embedding", seeds, maxIter = 4, tol = 0.0)
    val m2 = Clustering.fit(df2, "embedding", seeds, maxIter = 4, tol = 0.0)
    for (c <- m1.centroids.indices; d <- m1.centroids(c).indices)
      assert(m1.centroids(c)(d) === m2.centroids(c)(d),
        s"centroid ($c,$d) depends on partitioning")
    assert(m1.sizes.toSeq === m2.sizes.toSeq)
  }

  test("emptied cluster keeps its previous centroid; sizes report 0") {
    // two identical seeds: cell 1 can never win a strict-< tie, so it
    // empties immediately and must keep its seed coordinates
    val df = vecDf(Seq(
      0L -> Array(1.0f, 1.0f), 1L -> Array(1.0f, 1.0f),
      2L -> Array(1.1f, 0.9f), 3L -> Array(0.9f, 1.1f)))
    val seeds = Clustering.seedsByIdAsc(df, "vec_id", "embedding", 2)
    val m = Clustering.fit(df, "embedding", seeds, maxIter = 2, tol = 0.0)
    assert(m.sizes(1) === 0L)
    assert(m.centroids(1).toSeq === Seq(1.0, 1.0))
    assert(m.sizes(0) === 4L)
  }

  test("null vectors are excluded from fit and seeds") {
    val df = vecDf(Seq(
      0L -> Array(0.0f, 0.0f), 1L -> null,
      2L -> Array(4.0f, 4.0f), 3L -> Array(4.2f, 4.2f)))
    val seeds = Clustering.seedsByIdAsc(df, "vec_id", "embedding", 2)
    assert(seeds.length === 2)
    assert(seeds(1).toSeq === Seq(4.0, 4.0)) // id 1 skipped
    val m = Clustering.fit(df, "embedding", seeds, maxIter = 3, tol = 0.0)
    assert(m.sizes.sum === 3L)
  }

  test("seedsByHashSample yields k distinct seeds under duplicates") {
    val df = vecDf((0L until 20L).map(i => i -> Array((i % 3).toFloat, 1.0f)))
    val seeds = Clustering.seedsByHashSample(df, "vec_id", "embedding", 3)
    assert(seeds.length === 3)
    assert(seeds.map(_.toSeq).distinct.length === 3)
  }

  test("cache scope releases the iteration cache") {
    val df = vecDf((0L until 10L).map(i => i -> Array(i.toFloat, 0.0f)))
    val scope = new CacheScope
    val seeds = Clustering.seedsByIdAsc(df, "vec_id", "embedding", 2)
    val before = spark.sparkContext.getPersistentRDDs.size
    val m = Clustering.fit(df, "embedding", seeds, maxIter = 2, tol = 0.0,
      scope = scope)
    assert(m.sizes.sum === 10L)
    scope.unpersistAll(blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.size <= before)
  }
}
