package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns (north star:
  * similarity search, embedding near-dup). All pure native expressions:
  * `zip_with` + `aggregate` compile to codegen'd loops — no UDF, no
  * ser/de, distributable to any number of executors.
  *
  * Precision contract: elements are cast to double BEFORE any arithmetic and
  * accumulation runs in array-index order, so the result is bit-deterministic
  * and reproducible by the oracle engine.
  */
object Vectors {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  private def sumArr(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two equal-length float vectors (double accumulation in
    * index order — codegen'd kernel; see VectorExprs for why not zip_with). */
  def dot(a: Column, b: Column): Column =
    column(DotProductF(expression(a), expression(b)))

  /** Reference formulation via higher-order functions (same doubles as
    * `dot`; kept for cross-checking the kernel in tests). */
  def dotHof(a: Column, b: Column): Column =
    sumArr(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** L2 norm (codegen'd kernel). */
  def norm(a: Column): Column = column(NormL2F(expression(a)))

  /** Reference formulation of norm via higher-order functions. */
  def normHof(a: Column): Column =
    sqrt(sumArr(transform(a, x => x.cast("double") * x.cast("double"))))

  /** Cosine similarity; NULL when either vector has zero norm (÷0→NULL under
    * non-ANSI semantics — deliberate, mirrors the engine-wide convention). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Index of the nearest centroid (squared L2, ties → lowest index) in a
    * fixed matrix — the map-side argmin of Lloyd iterations and IVF
    * routing; see [[NearestCentroidF]] for the cross-engine contract. */
  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    column(NearestCentroidF(expression(vec), centroids))

  /** All m product-quantization codes in one pass over the vector
    * (`array<int>`); see [[PqEncodeF]] for the cross-engine contract. */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    column(PqEncodeF(expression(vec), codebooks))

  /** Asymmetric PQ distance: m lookups into the query's per-subspace
    * distance table, summed in subspace order; see [[PqAdcF]]. */
  def pqAdc(codes: Column, table: Array[Array[Double]]): Column =
    column(PqAdcF(expression(codes), table))

  /** Asymmetric PQ distance from the RAW query vector (array<double>) —
    * the multi-query/batch form where the query varies per row; see
    * [[PqAdcQueryF]] for the contract (== [[pqAdc]] over `adcTable(q)`). */
  def pqAdcQuery(codes: Column, qvec: Column,
      codebooks: Array[Array[Array[Double]]]): Column =
    column(PqAdcQueryF(expression(codes), expression(qvec), codebooks))

  /** Squared euclidean distance. */
  def l2sq(a: Column, b: Column): Column =
    sumArr(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    }))

  /** Max-abs scale for int8 quantization: the per-vector factor mapping
    * [-maxabs, maxabs] onto [-127, 127]. Zero vectors get scale 0 (their
    * quantized form is all zeros). */
  def maxAbsScale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / lit(127.0)

  /** Int8 scalar quantization against a pre-staged scale COLUMN (stage it
    * with withColumn — an outer expression inside the lambda would be
    * re-evaluated per element): 4× smaller embedding storage with bounded
    * error |x − dequant(x)| ≤ scale/2. HALF_UP rounding, reproducible by
    * the oracle's decimal round. */
  def quantizeInt8(vec: Column, scaleCol: Column): Column =
    transform(vec, x =>
      when(scaleCol === 0.0, lit(0))
        .otherwise(round(x.cast("double") / scaleCol)).cast("byte"))

  /** Reconstruction from int8 codes + scale. */
  def dequantizeInt8(q: Column, scaleCol: Column): Column =
    transform(q, b => b.cast("double") * scaleCol)

  /** Random-hyperplane LSH signature: `planes` sign bits packed into a long.
    * Plane weights are derived deterministically from md5(plane:dim) — no
    * RNG, identical across engines/runs. Used to bucket ANN candidates so
    * the pairwise search is per-bucket, not all-pairs (the 100 TB path). */
  def hyperplaneSig(vec: Column, planes: Int, dims: Int): Column =
    TextKernels.hyperplaneSig(vec, planes, dims)

  /** Composed-expression reference form: a 512-term tree (slow to codegen,
    * kept for bitwise cross-checks of the kernel). */
  def hyperplaneSigRef(vec: Column, planes: Int, dims: Int): Column = {
    val bits = (0 until planes).map { p =>
      val s = (0 until dims).map { d =>
        element_at(vec, d + 1).cast("double") * lit(planeWeight(p, d).toDouble)
      }.reduce(_ + _)
      when(s >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** weight(p,d): first 6 hex digits of md5("p:d") minus 2^23 (zero-mean
    * deterministic pseudo-randoms) — the same value md5-capable SQL
    * reproduces, so LSH bucketing stays oracle-checkable. */
  def planeWeight(p: Int, d: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$d".getBytes("UTF-8"))
      .take(3).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) - (1L << 23)
  }
}
