package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.Registry

/** The codegen'd vector kernels must produce BIT-IDENTICAL doubles to the
  * higher-order-function formulations (which in turn mirror the oracle SQL).
  */
class VectorExprsSpec extends SparkSpec {

  private lazy val emb = Registry.table(spark, sf0001, "embeddings")

  test("DotProductF == zip_with/aggregate formulation, bitwise") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val n = emb.crossJoin(q)
      .select(Vectors.dot(col("embedding"), col("qvec")).as("fast"),
        Vectors.dotHof(col("embedding"), col("qvec")).as("ref"))
      .filter(col("fast") =!= col("ref")) // NaN-safe: no NaNs in this data
      .count()
    assert(n === 0)
  }

  test("NormL2F == transform/aggregate formulation, bitwise") {
    val n = emb
      .select(Vectors.norm(col("embedding")).as("fast"),
        Vectors.normHof(col("embedding")).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(n === 0)
  }

  test("SimHash32 kernel == composed-expression formulation") {
    val d = Registry.table(spark, sf0001, "documents")
    val n = d.select(graft.operators.Dedup.simhash32(col("text")).as("fast"),
        graft.operators.Dedup.simhash32Ref(col("text")).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(n === 0)
  }

  test("MinHashHex kernel == composed array_min(md5) formulation") {
    import org.apache.spark.sql.functions.array_distinct
    val d = Registry.table(spark, sf0001, "documents")
      .withColumn("__toks", Text.tokens(col("text")))
      .withColumn("__sh", array_distinct(Text.shinglesOfTokens(col("__toks"), 3)))
    val n = d.select(
        TextKernels.minhashHex(col("__toks"), 3, 2).as("fast"),
        Text.minhash(col("__sh"), 2).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(n === 0)
  }

  test("ShingleHashes kernel == composed sort(distinct(hash)) formulation") {
    import graft.functions.ArrayOps._
    val d = Registry.table(spark, sf0001, "documents")
      .withColumn("__toks", Text.tokens(col("text")))
    val n = d.select(
        sortedShingleHashesOfTokens(col("__toks"), 2).as("fast"),
        sortedShingleHashesOfTokensRef(col("__toks"), 2).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(n === 0)
  }

  test("HyperplaneSig kernel == composed 512-term expression tree") {
    val n = emb.select(
        Vectors.hyperplaneSig(col("embedding"), 8, 64).as("fast"),
        Vectors.hyperplaneSigRef(col("embedding"), 8, 64).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(n === 0)
  }

  test("SortedIntersectCount matches array_intersect size on hashed shingles") {
    import graft.functions.ArrayOps._
    val d = Registry.table(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"), sortedShingleHashes(col("text"), 2).as("sh"))
    val a = d.as("a"); val b = d.as("b")
    val n = a.join(b, col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .select(sortedIntersectCount(col("a.sh"), col("b.sh")).as("fast"),
        size(array_intersect(col("a.sh"), col("b.sh"))).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(n === 0)
  }

  test("int8 quantization: bounded error, exact round-trip structure") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),     // zero vector → all-zero codes
      (3L, Array(127.0f, -127.0f, 63.5f, 1.0f)))
      .toDF("id", "vec")
      .withColumn("scale", Vectors.maxAbsScale(col("vec")))
      .withColumn("q", Vectors.quantizeInt8(col("vec"), col("scale")))
      .withColumn("dq", Vectors.dequantizeInt8(col("q"), col("scale")))
    val rows = vecs.collect().map(r => r.getAs[Long]("id") -> r).toMap
    // max element always maps to ±127; zero vector stays zero
    assert(rows(1L).getAs[scala.collection.Seq[Byte]]("q").head === 127.toByte)
    assert(rows(2L).getAs[scala.collection.Seq[Byte]]("q").forall(_ === 0.toByte))
    assert(rows(3L).getAs[scala.collection.Seq[Byte]]("q").take(2).toSeq === Seq(127.toByte, -127.toByte))
    // reconstruction error bounded by half a quantization step everywhere
    rows.values.foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("vec"); val dq = r.getAs[scala.collection.Seq[Double]]("dq")
      val s = r.getAs[Double]("scale")
      v.zip(dq).foreach { case (x, y) =>
        assert(math.abs(x.toDouble - y) <= s * 0.5000001, s"$x vs $y (scale $s)")
      }
    }
  }

  /** Naive winnowing reference: every k-gram hashed FROM SCRATCH (no
    * rolling), plain per-window minima, distinct, sorted — the same
    * derivation the q95 DuckDB oracle uses. */
  private def winnowRef(s: String, k: Int, w: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    if (cps.length < k) return Seq.empty
    val M = 1000000007L
    val hs = (0 to cps.length - k).map { i =>
      (i until i + k).foldLeft(0L)((acc, j) => (acc * 257 + cps(j)) % M)
    }
    val nWin = math.max(hs.length - w + 1, 1)
    (0 until nWin).map(i => hs.slice(i, math.min(i + w, hs.length)).min)
      .distinct.sorted
  }

  test("WinnowFingerprints kernel == from-scratch reference on the corpus") {
    val docs = Registry.table(spark, sf0001, "documents")
      .select(col("doc_id"),
        Text.normalize(col("text")).as("t"),
        TextKernels.winnowFingerprints(Text.normalize(col("text")), 8, 4).as("fps"))
      .collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      val got = r.getAs[scala.collection.Seq[Long]]("fps").toSeq
      assert(got === winnowRef(r.getAs[String]("t"), 8, 4),
        s"doc ${r.getLong(0)}")
    }
  }

  test("WinnowFingerprints edge cases: short text, clamp window, code points") {
    import spark.implicits._
    val rows = Seq(
      "",                    // empty → no fingerprints
      "abcdefg",             // 7 chars < k=8 → no fingerprints
      "abcdefgh",            // exactly k → 1 hash, clamped single window
      "abcdefghij",          // k < n < k+w-1 → clamped single window
      "a😀bcdefghi" // supplementary char counts as ONE symbol
    ).toDF("t").select(col("t"),
      TextKernels.winnowFingerprints(col("t"), 8, 4).as("fps"))
      .collect().map(r => r.getAs[String]("t") -> r.getAs[scala.collection.Seq[Long]]("fps").toSeq)
      .toMap
    assert(rows("") === Seq.empty)
    assert(rows("abcdefg") === Seq.empty)
    assert(rows("abcdefgh") === winnowRef("abcdefgh", 8, 4))
    assert(rows("abcdefgh").length === 1)
    assert(rows("abcdefghij") === winnowRef("abcdefghij", 8, 4))
    assert(rows("abcdefghij").length === 1) // 3 hashes < w → one clamped window
    assert(rows("a😀bcdefghi") === winnowRef("a😀bcdefghi", 8, 4))
  }

  test("winnowing guarantee: substring overlap >= k+w-1 shares a fingerprint") {
    import spark.implicits._
    // the paper's detection threshold t = k + w - 1 = 11: a shared run of
    // 11+ chars must produce at least one common fingerprint
    val shared = "the quick brown fox jumps"
    val a = s"prefix text before $shared and after it goes on"
    val b = s"$shared entirely different continuation here zzz"
    val out = Seq(a, b).toDF("t")
      .select(TextKernels.winnowFingerprints(col("t"), 8, 4).as("fps"))
      .collect().map(_.getAs[scala.collection.Seq[Long]]("fps").toSet)
    assert(out(0).intersect(out(1)).nonEmpty)
    // and two disjoint-alphabet strings share nothing
    val dis = Seq("aaaaaaaaaaaaaaaaaa", "bbbbbbbbbbbbbbbbbb").toDF("t")
      .select(TextKernels.winnowFingerprints(col("t"), 8, 4).as("fps"))
      .collect().map(_.getAs[scala.collection.Seq[Long]]("fps").toSet)
    assert(dis(0).intersect(dis(1)).isEmpty)
  }

  test("winnow_fingerprints is callable from SQL") {
    graft.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT winnow_fingerprints('abcdefghijklmnop', 8, 4) AS fps")
      .collect().head.getAs[scala.collection.Seq[Long]]("fps").toSeq
    assert(got === winnowRef("abcdefghijklmnop", 8, 4))
  }

  test("NearestCentroidF == composed argmin over broadcast rows, bitwise") {
    // reference formulation: explicit per-centroid l2sq columns + a
    // least-with-tie-to-lowest fold, all index-order double arithmetic
    val cents: Array[Array[Double]] = Array(
      Array.tabulate(64)(d => math.sin(d * 0.31) * 2.0),
      Array.tabulate(64)(d => math.cos(d * 0.17) * 3.0),
      Array.tabulate(64)(d => (d % 5) - 2.0))
    def d2(c: Array[Double]) = {
      val lits = c.map(lit)
      (0 until 64).map { i =>
        val t = col("embedding").getItem(i).cast("double") - lits(i)
        t * t
      }.reduce(_ + _)
    }
    val withD = emb.select(col("vec_id"), col("embedding"),
      Vectors.nearestCentroid(col("embedding"), cents).as("fast"),
      d2(cents(0)).as("d0"), d2(cents(1)).as("d1"), d2(cents(2)).as("d2"))
    val bad = withD.withColumn("ref",
        when(col("d0") <= col("d1") && col("d0") <= col("d2"), 0)
          .when(col("d1") <= col("d2"), 1).otherwise(2))
      .filter(col("fast") =!= col("ref")).count()
    assert(bad === 0)
  }

  test("NearestCentroidF ties break to the lowest index; null vec is null") {
    import spark.implicits._
    val cents = Array(Array(1.0, 1.0), Array(1.0, 1.0), Array(0.0, 0.0))
    val df = Seq(Tuple1(Seq(1.0f, 1.0f)), Tuple1(null.asInstanceOf[Seq[Float]]))
      .toDF("v")
      .select(Vectors.nearestCentroid(col("v"), cents).as("cell"))
    val rows = df.collect()
    assert(rows(0).getInt(0) === 0)
    assert(rows(1).isNullAt(0))
  }
}
