package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Vectors.{pqAdc, pqEncode}

/** Product quantization over `array<float>` embeddings — the compression
  * half of billion-scale ANN (IVF-PQ): the vector space is split into `m`
  * contiguous subspaces, each quantized by its own small codebook, and a
  * vector becomes `m` one-byte-class codes. At 100 TB this is the
  * difference between scanning raw float columns (4·d bytes/vector) and
  * scanning `m` ints with the float column never read — candidate ranking
  * happens entirely on codes via a per-query lookup table (ADC), and only
  * a re-rank of the top candidates ever touches a real vector.
  *
  * Training is JOINT Lloyd across all subspaces: each iteration is still
  * ONE distributed pass — a single [[graft.functions.PqEncodeF]] projection
  * assigns every subspace's cell (codebooks ride the expression, no join,
  * no slice arrays materialized), then `posexplode` + partial aggregation
  * on (subspace, cell, dim) — the shuffle carries at most k×d×partitions
  * pre-combined rows (the SAME bound as whole-vector k-means: m books of
  * k×dsub sums = k×d), and the driver collect is k×d decimals. m never
  * multiplies the number of jobs.
  *
  * Determinism contract (what lets an oracle replay training, encoding and
  * ADC ranking bit-for-bit): identical to [[Clustering]] per subspace —
  * index-order float→double distances, strict `<` ties to the lowest code,
  * exact-decimal centroid updates (round to 6 decimals, sum as
  * DECIMAL(18,6)), emptied entries keep their previous value — plus ADC
  * totals accumulated in subspace order, which equals the index-order L2
  * between the query and the row's reconstruction.
  */
object ProductQuantization {

  /** `codebooks(s)(code)(d)` — m subspaces × k entries × dsub dims.
    * `sizes(s)(code)` = entry populations at the last assignment. */
  final case class PQModel(
      codebooks: Array[Array[Array[Double]]],
      sizes: Array[Array[Long]],
      iterations: Int,
      converged: Boolean) {
    def m: Int = codebooks.length
    def k: Int = codebooks(0).length
    def dims: Int = codebooks.map(_(0).length).sum

    /** The query's per-(subspace, code) exact index-order squared L2 —
      * computed once per query on the driver (k×d doubles), the table
      * [[graft.functions.PqAdcF]] sums per row. */
    def adcTable(q: Array[Double]): Array[Array[Double]] = {
      var off = 0
      codebooks.map { book =>
        val dsub = book(0).length
        val t = book.map { cent =>
          var d = 0.0
          var i = 0
          val n = math.min(dsub, q.length - off)
          while (i < n) {
            val x = q(off + i) - cent(i)
            d += x * x
            i += 1
          }
          d
        }
        off += dsub
        t
      }
    }
  }

  /** Deterministic, oracle-expressible seeding: the k lowest-id vectors,
    * sliced per subspace (the SAME rows seed every subspace, so an oracle
    * can slice one ordered prefix). */
  def seedsByIdAsc(df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int): Array[Array[Array[Double]]] = {
    val rows = df.filter(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol))
      .orderBy(col(idCol))
      .limit(k)
      .collect()
      .map(_.getSeq[Float](1).toArray.map(_.toDouble))
    require(rows.nonEmpty, "PQ seeding: no non-null vectors")
    val dims = rows.map(_.length).min
    require(dims % m == 0,
      s"PQ: $dims dims not divisible into $m subspaces")
    val dsub = dims / m
    Array.tabulate(m)(s => rows.map(_.slice(s * dsub, (s + 1) * dsub)))
  }

  /** Hash-ordered distinct seeding (the [[Clustering.seedsByHashSample]]
    * discipline, sliced per subspace): md5-of-id order is engine-portable
    * randomness, the cap bounds the collect by config; duplicate FULL
    * vectors are skipped so each subspace gets k distinct-by-construction
    * starting rows (per-subspace windows of distinct rows may still
    * coincide — harmless: Lloyd merges them). */
  def seedsByHashSample(df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, sampleCap: Int = 4096): Array[Array[Array[Double]]] = {
    val rows = Clustering.seedsByHashSample(df, idCol, vecCol, k, sampleCap)
    require(rows.nonEmpty, "PQ seeding: no non-null vectors")
    val dims = rows.map(_.length).min
    require(dims % m == 0,
      s"PQ: $dims dims not divisible into $m subspaces")
    val dsub = dims / m
    Array.tabulate(m)(s => rows.map(_.slice(s * dsub, (s + 1) * dsub)))
  }

  private def decimalDimSum(x: Column): Column =
    sum(round(x.cast("double"), 6).cast(DecimalType(18, 6)))

  /** Joint Lloyd from `seeds` until every subspace converges (`tol` on the
    * max coordinate move across ALL books) or `maxIter`. One distributed
    * pass per iteration regardless of m. */
  def fit(df: DataFrame, vecCol: String,
      seeds: Array[Array[Array[Double]]],
      maxIter: Int = 20, tol: Double = 1e-9,
      scope: CacheScope = CacheScope.unmanaged): PQModel = {
    require(seeds.nonEmpty && seeds.forall(_.nonEmpty),
      "PQ fit: every subspace needs at least one seed")
    val dsubs = seeds.map(_(0).length)
    val data = scope.persist(
      df.filter(col(vecCol).isNotNull).select(col(vecCol).as("v")))
    // dim → subspace resolved with a tiny literal lookup (dsubs may vary
    // only at the tail; contiguous offsets are the contract)
    val offsets = dsubs.scanLeft(0)(_ + _) // length m+1
    val subOf: Column = {
      val dim = col("dim")
      (1 until seeds.length).foldLeft(lit(0)) { (acc, s) =>
        when(dim >= offsets(s), lit(s)).otherwise(acc)
      }
    }
    var books = seeds.map(_.map(_.clone()))
    var sizes = books.map(b => new Array[Long](b.length))
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val rows = data
        .select(pqEncode(col("v"), books).as("codes"),
          posexplode(col("v")).as(Seq("dim", "x")))
        .select(subOf.as("sub"), col("dim"), col("x"), col("codes"))
        .select(col("sub"),
          element_at(col("codes"), col("sub") + 1).as("cell"),
          col("dim"), col("x"))
        .groupBy(col("sub"), col("cell"), col("dim"))
        .agg(decimalDimSum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = books.map(_.map(_.clone()))
      sizes = books.map(b => new Array[Long](b.length))
      rows.foreach { r =>
        val sub = r.getInt(0); val cell = r.getInt(1)
        val dim = r.getInt(2) - offsets(sub)
        val s = r.getDecimal(3); val n = r.getLong(4)
        if (dim < next(sub)(cell).length) {
          next(sub)(cell)(dim) = s.doubleValue / n
          sizes(sub)(cell) = n
        }
      }
      var shift = 0.0
      for (sub <- books.indices; c <- books(sub).indices;
           d <- books(sub)(c).indices) {
        val mv = math.abs(next(sub)(c)(d) - books(sub)(c)(d))
        if (mv > shift) shift = mv
      }
      books = next
      it += 1
      converged = shift <= tol
    }
    PQModel(books, sizes, it, converged)
  }

  /** Attach the `array<int>` code column (map-side, codegen, no join). */
  def encode(df: DataFrame, vecCol: String, model: PQModel,
      outCol: String = "pq_code"): DataFrame =
    df.withColumn(outCol, pqEncode(col(vecCol), model.codebooks))

  /** Approximate top-k of a single query over an ENCODED table: ranking
    * reads only (id, code) — never the vector column — and the plan is a
    * TakeOrderedAndProject (per-task heap + driver k-merge), no global
    * sort. Ties break to the lowest id in both engines. Output:
    * (rank, id, adc_d2). */
  def adcTopK(encoded: DataFrame, model: PQModel, q: Array[Double], k: Int,
      idCol: String = "vec_id", codeCol: String = "pq_code"): DataFrame = {
    val table = model.adcTable(q)
    val ranked = encoded
      .select(col(idCol), pqAdc(col(codeCol), table).as("adc_d2"))
      .orderBy(col("adc_d2").asc, col(idCol).asc)
      .limit(k)
    // rank materializes the order (integer-only verification downstream);
    // the window runs over the k collected rows, not the corpus
    ranked.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("adc_d2").asc, col(idCol).asc)))
      .select(col("rank"), col(idCol), col("adc_d2"))
  }

  /** ADC shortlist + EXACT re-rank: the corpus-wide scan ranks codes only,
    * then the true distance is computed for the `shortlist` survivors
    * alone — the standard PQ recall repair, with the vector column read
    * for shortlist rows only (a semi-join on id, never a full-column
    * scan). Output: (rank, id, d2) by exact distance. */
  def adcTopKExact(encoded: DataFrame, model: PQModel, q: Array[Double],
      k: Int, shortlist: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      codeCol: String = "pq_code"): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val qArr = q.map(_.toFloat)
    val cand = adcTopK(encoded, model, q, shortlist, idCol, codeCol)
      .select(col(idCol))
    val qCol = lit(qArr)
    val exact = encoded.join(broadcast(cand), Seq(idCol), "left_semi")
      .select(col(idCol),
        graft.functions.Vectors.l2sq(
          col(vecCol).cast("array<double>"), qCol.cast("array<double>"))
          .as("d2"))
      .orderBy(col("d2").asc, col(idCol).asc)
      .limit(k)
    exact.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("d2").asc, col(idCol).asc)))
      .select(col("rank"), col(idCol), col("d2"))
  }
}
