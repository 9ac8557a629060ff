package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Registry

class ProductQuantizationSpec extends SparkSpec {

  import ProductQuantization._

  private lazy val emb = Registry.table(spark, sf0001, "embeddings")
  private val M = 4
  private val K = 4

  private def slicedView(s: Int, dsub: Int) =
    emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), slice(col("embedding"), s * dsub + 1, dsub)
        .as("embedding"))

  test("joint fit == m independent whole-vector fits over sliced views") {
    // the one-pass-per-iteration joint loop must land on EXACTLY the
    // codebooks m separate Clustering.fit runs produce — same seeds, same
    // decimal arithmetic, subspace independence is real, not approximate
    val seeds = seedsByIdAsc(emb, "vec_id", "embedding", M, K)
    val dsub = seeds(0)(0).length
    val joint = fit(emb, "embedding", seeds, maxIter = 3, tol = 0.0)
    assert(joint.iterations === 3)
    for (s <- 0 until M) {
      val solo = Clustering.fit(slicedView(s, dsub), "embedding", seeds(s),
        maxIter = 3, tol = 0.0)
      for (c <- 0 until K)
        assert(joint.codebooks(s)(c).toSeq === solo.centroids(c).toSeq,
          s"subspace $s entry $c diverged from the independent fit")
      assert(joint.sizes(s).toSeq === solo.sizes.toSeq,
        s"subspace $s sizes diverged")
    }
  }

  test("fit is deterministic under repartitioning") {
    val seeds = seedsByIdAsc(emb, "vec_id", "embedding", M, K)
    val a = fit(emb, "embedding", seeds, maxIter = 2, tol = 0.0)
    val b = fit(emb.repartition(7), "embedding", seeds, maxIter = 2, tol = 0.0)
    assert(a.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
      b.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("encode == per-subspace argmin over sliced views; null stays null") {
    val seeds = seedsByIdAsc(emb, "vec_id", "embedding", M, K)
    val dsub = seeds(0)(0).length
    val model = fit(emb, "embedding", seeds, maxIter = 2, tol = 0.0)
    val got = encode(emb, "embedding", model)
      .select(col("vec_id"), col("pq_code"))
    // composed reference: m separate NearestCentroidF over slices
    val ref = emb.select(col("vec_id"),
      array((0 until M).map(s =>
        graft.functions.Vectors.nearestCentroid(
          slice(col("embedding"), s * dsub + 1, dsub),
          model.codebooks(s))): _*).as("ref_code"))
    val joined = got.join(ref, "vec_id")
    assert(joined.filter(col("pq_code").isNull =!= col("ref_code").isNull)
      .count() === 0)
    assert(joined.filter(col("pq_code").isNotNull &&
      col("pq_code") =!= col("ref_code")).count() === 0)
    val nullIn = emb.filter(col("embedding").isNull).count()
    assert(got.filter(col("pq_code").isNull).count() === nullIn)
  }

  test("ADC distance == exact L2 to the row's reconstruction") {
    val seeds = seedsByIdAsc(emb, "vec_id", "embedding", M, K)
    val model = fit(emb, "embedding", seeds, maxIter = 2, tol = 0.0)
    val q = emb.filter(col("vec_id") === 3).select(col("embedding"))
      .collect().head.getSeq[Float](0).toArray.map(_.toDouble)
    val table = model.adcTable(q)
    val rows = encode(emb.filter(col("embedding").isNotNull), "embedding", model)
      .select(col("vec_id"), col("pq_code"),
        graft.functions.Vectors.pqAdc(col("pq_code"), table).as("adc"))
      .collect()
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      // driver reconstruction: concat of codebook entries, then the SAME
      // index-order accumulation
      val recon = codes.zipWithIndex.flatMap { case (c, s) =>
        model.codebooks(s)(c)
      }.toArray
      var d = 0.0
      var i = 0
      while (i < recon.length) { val t = q(i) - recon(i); d += t * t; i += 1 }
      // adc sums per-subspace partials in order — identical grouping, so
      // the doubles must match bit-for-bit
      val subTotals = codes.zipWithIndex.map { case (c, s) => table(s)(c) }
      assert(r.getDouble(2) === subTotals.sum)
      assert(math.abs(r.getDouble(2) - d) < 1e-9)
    }
  }

  test("adcTopKExact with a full-corpus shortlist == brute force top-k") {
    val seeds = seedsByIdAsc(emb, "vec_id", "embedding", M, K)
    val model = fit(emb, "embedding", seeds, maxIter = 2, tol = 0.0)
    val q = emb.filter(col("vec_id") === 3).select(col("embedding"))
      .collect().head.getSeq[Float](0).toArray.map(_.toDouble)
    val enc = encode(emb.filter(col("embedding").isNotNull), "embedding", model)
    val n = enc.count().toInt
    val got = adcTopKExact(enc, model, q, k = 10, shortlist = n)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    // brute force on exact L2, same tie rule
    val brute = enc
      .select(col("vec_id"),
        graft.functions.Vectors.l2sq(col("embedding").cast("array<double>"),
          lit(q).cast("array<double>")).as("d2"))
      .orderBy(col("d2").asc, col("vec_id").asc).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got === brute)
    assert(got.head === 3L, "self not first")
  }

  test("ADC shortlist recall: top-1 is found with a modest shortlist") {
    val seeds = seedsByIdAsc(emb, "vec_id", "embedding", M, K)
    val model = fit(emb, "embedding", seeds, maxIter = 3, tol = 0.0)
    val enc = encode(emb.filter(col("embedding").isNotNull), "embedding", model)
    val q = emb.filter(col("vec_id") === 7).select(col("embedding"))
      .collect().head.getSeq[Float](0).toArray.map(_.toDouble)
    val got = adcTopKExact(enc, model, q, k = 1, shortlist = 20)
      .select("vec_id").collect().map(_.getLong(0))
    assert(got.head === 7L,
      "the query's own row must survive a 20-wide ADC shortlist")
  }

  test("a code from a different model fails loudly") {
    import spark.implicits._
    val bad = Seq((1L, Seq(9, 0, 0, 0))).toDF("vec_id", "pq_code")
    val table = Array(Array(0.0, 1.0), Array(0.0), Array(0.0), Array(0.0))
    val e = intercept[Exception] {
      bad.select(graft.functions.Vectors.pqAdc(col("pq_code"), table))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("out of range")), msgs(e).mkString(" | "))
  }
}
