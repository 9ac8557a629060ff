package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{CacheScope, ProductQuantization}
import graft.queries.Registry.table

/** Product quantization gated end-to-end: the oracle replays the JOINT
  * Lloyd training per subspace as unrolled CTEs (seed slices → per-subspace
  * assign → exact-decimal update → final assign), so a pass proves the
  * one-pass-per-iteration training, the [[graft.functions.PqEncodeF]]
  * window arithmetic, and (q152) the ADC ranking — per-subspace lookup
  * distances summed in subspace order equal the reconstruction L2, and the
  * top-k order matches an engine that computed those distances from
  * scratch. Output stays integer-only (codes, ranks): the float pipeline is
  * verified through comparisons, never hash-compared.
  */
object PqQueries {

  private val DIMS = 64
  private val M = 4
  private val DSUB = DIMS / M
  private val K = 4
  private val ITERS = 1
  private val TOPK = 20
  private val QID = 3 // query = this row's embedding

  /** In-order double squared-L2 between a vector's subspace-`s` window and
    * a dsub-length centroid list. */
  private def d2Sub(vec: String, cvec: String, s: Int): String =
    s"""list_sum(list_transform(generate_series(1, $DSUB), i ->
        (CAST($vec[${s * DSUB} + i] AS DOUBLE) - $cvec[i]) *
        (CAST($vec[${s * DSUB} + i] AS DOUBLE) - $cvec[i])))"""

  /** Seed CTE for subspace s: the K lowest-id vectors' windows. */
  private def seedCte(s: Int): String =
    s"""cents${s}_0 AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
          list_transform(generate_series(1, $DSUB), i ->
            CAST(embedding[${s * DSUB} + i] AS DOUBLE)) AS cvec
        FROM (SELECT vec_id, embedding FROM emb ORDER BY vec_id LIMIT $K))"""

  /** Assignment CTE a{s}_{n} vs cents{s}_{m}: ties to the lowest cell. */
  private def assignCte(s: Int, n: Int, m: Int): String =
    s"""a${s}_$n AS (
        SELECT vec_id, cell FROM (
          SELECT e.vec_id, c.cell,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY ${d2Sub("e.embedding", "c.cvec", s)} ASC, c.cell ASC)
              AS rn
          FROM emb e CROSS JOIN cents${s}_$m c) WHERE rn = 1)"""

  /** Update CTEs u{s}_{n} + cents{s}_{n}: exact-decimal per-(cell, dim)
    * means over the subspace window; an emptied cell keeps its centroid. */
  private def updateCte(s: Int, n: Int): String =
    s"""u${s}_$n AS (
        SELECT a.cell, g.i AS dim1,
          CAST(SUM(CAST(${Registry.sroundSql(
            s"CAST(e.embedding[${s * DSUB} + g.i] AS DOUBLE)", 6)}
            AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS cd
        FROM a${s}_$n a JOIN emb e ON a.vec_id = e.vec_id
        CROSS JOIN (SELECT unnest(generate_series(1, $DSUB)) AS i) g
        GROUP BY a.cell, g.i),
      cents${s}_$n AS (
        SELECT c0.cell, COALESCE(u.cvec, c0.cvec) AS cvec
        FROM cents${s}_${n - 1} c0 LEFT JOIN
          (SELECT cell, list(cd ORDER BY dim1) AS cvec FROM u${s}_$n
           GROUP BY cell) u
        ON c0.cell = u.cell)"""

  /** The full per-subspace chains: seeds, ITERS × (assign, update), and the
    * final assignment a{s}_{ITERS+1} under the trained book. */
  private def trainingCtes: String = {
    val perSub = (0 until M).map { s =>
      val iters = (1 to ITERS).map(n =>
        s"${assignCte(s, n, n - 1)},\n${updateCte(s, n)}")
      s"${seedCte(s)},\n${iters.mkString(",\n")},\n${assignCte(s, ITERS + 1, ITERS)}"
    }
    perSub.mkString(",\n")
  }

  private lazy val encodeOracle: String =
    s"""WITH emb AS (
          SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL),
        $trainingCtes
        SELECT a0.vec_id, a0.cell AS c0, a1.cell AS c1,
               a2.cell AS c2, a3.cell AS c3
        FROM a0_${ITERS + 1} a0
        JOIN a1_${ITERS + 1} a1 ON a0.vec_id = a1.vec_id
        JOIN a2_${ITERS + 1} a2 ON a0.vec_id = a2.vec_id
        JOIN a3_${ITERS + 1} a3 ON a0.vec_id = a3.vec_id"""

  private lazy val adcOracle: String = {
    // per-row ADC distance = Σ_s d2(query window s, trained entry for the
    // row's code) accumulated in subspace order — the reconstruction L2
    // joined with bare `+`: SQL parses left-associatively, matching
    // PqAdcF's subspace-order accumulation bit for bit. Each trained book
    // is a plain JOIN on the row's code (no correlated subquery — DuckDB
    // cannot correlate into a list lambda).
    val subDist = (0 until M).map { s =>
      d2Sub("q.embedding", s"c$s.cvec", s)
    }.mkString(" + ")
    val bookJoins = (0 until M).map { s =>
      s"JOIN cents${s}_$ITERS c$s ON c$s.cell = a$s.cell"
    }.mkString("\n          ")
    s"""WITH emb AS (
          SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL),
        $trainingCtes,
        q AS (SELECT embedding FROM emb WHERE vec_id = $QID),
        dists AS (
          SELECT a0.vec_id, $subDist AS d
          FROM a0_${ITERS + 1} a0
          JOIN a1_${ITERS + 1} a1 ON a0.vec_id = a1.vec_id
          JOIN a2_${ITERS + 1} a2 ON a0.vec_id = a2.vec_id
          JOIN a3_${ITERS + 1} a3 ON a0.vec_id = a3.vec_id
          $bookJoins
          CROSS JOIN q)
        SELECT CAST(rank AS INT) AS rank, vec_id FROM (
          SELECT vec_id, row_number() OVER (ORDER BY d ASC, vec_id ASC)
            AS rank
          FROM dists) WHERE rank <= $TOPK"""
  }

  private def trained(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val e = table(s, dir, "embeddings")
    val seeds = ProductQuantization.seedsByIdAsc(e, "vec_id", "embedding", M, K)
    val scope = new CacheScope
    val model =
      try ProductQuantization.fit(e, "embedding", seeds, maxIter = ITERS,
        tol = 0.0, scope = scope)
      finally scope.unpersistAll()
    (e, model)
  }

  val queries: Seq[Q] = Seq(

    // ---- PQ training + encoding: the whole joint loop ---------------------
    // Scale: each training iteration is ONE pass (PqEncodeF projection +
    // bounded (sub, cell, dim) partial agg — shuffle ≤ k×d×partitions);
    // encoding is a pure map-side projection. The oracle re-trains every
    // subspace independently and must land on identical codes.
    Q("q151_pq_encode", (s, dir) => {
      val (e, model) = trained(s, dir)
      ProductQuantization.encode(
          e.filter(col("embedding").isNotNull), "embedding", model)
        .select(col("vec_id"),
          element_at(col("pq_code"), 1).as("c0"),
          element_at(col("pq_code"), 2).as("c1"),
          element_at(col("pq_code"), 3).as("c2"),
          element_at(col("pq_code"), 4).as("c3"))
    }, Some(encodeOracle)),

    // ---- ADC top-k over codes only ---------------------------------------
    // Scale: the ranking scan reads (vec_id, pq_code) — the float column
    // is never touched — and the plan is a TakeOrderedAndProject, no
    // global sort. The oracle computes every row's reconstruction
    // distance from its own re-trained codebooks; identical (rank,
    // vec_id) order proves the ADC table lookups ARE those distances.
    Q("q152_pq_adc_topk", (s, dir) => {
      val (e, model) = trained(s, dir)
      val nn = e.filter(col("embedding").isNotNull)
      val q = nn.filter(col("vec_id") === QID).select(col("embedding"))
        .collect().head.getSeq[Float](0).toArray.map(_.toDouble)
      ProductQuantization.adcTopK(
          ProductQuantization.encode(nn, "embedding", model)
            .select(col("vec_id"), col("pq_code")),
          model, q, TOPK)
        .select(col("rank"), col("vec_id"))
    }, Some(adcOracle)))
}
