package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{CacheScope, Clustering}
import graft.queries.Registry.table

/** Distributed k-means over `embeddings`, gated end-to-end: the oracle
  * UNROLLS the Lloyd loop (seed → assign → decimal update → assign → …) as
  * chained CTEs, so a pass proves not one step but the whole iterated
  * computation — seeding order, bit-identical index-order distances,
  * lowest-cell tie-breaks, the exact-decimal centroid update, and the
  * empty-cell carry-over — lands on identical per-vector assignments in
  * both engines. Output is integer-only (vec_id, cell): the float
  * arithmetic is VERIFIED (assignments depend on exact distance
  * comparisons) without ever hash-comparing a float.
  */
object ClusterQueries {

  private val DIMS = 64
  private val K = 8
  private val ITERS = 2

  /** In-order double squared-L2 between the row vector and a centroid list
    * (both referenced by alias) — the SQL twin of NearestCentroidF's loop:
    * difference squared by multiplication, accumulated in index order. */
  private def d2Sql(vec: String, cvec: String): String =
    s"""list_sum(list_transform(generate_series(1, $DIMS), i ->
        (CAST($vec[i] AS DOUBLE) - $cvec[i]) * (CAST($vec[i] AS DOUBLE) - $cvec[i])))"""

  /** Assignment CTE `a$n`: nearest cell per vector against `cents$m`,
    * ties to the lowest cell. */
  private def assignCte(n: Int, m: Int): String =
    s"""a$n AS (
        SELECT vec_id, embedding, cell FROM (
          SELECT e.vec_id, e.embedding, c.cell,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY ${d2Sql("e.embedding", "c.cvec")} ASC, c.cell ASC) AS rn
          FROM emb e CROSS JOIN cents$m c) WHERE rn = 1)"""

  /** Update CTEs `u$n` + `cents$n`: per-(cell, dim) exact-decimal mean
    * (Registry.sroundSql reproduces Spark's shortest-repr HALF_UP round,
    * DECIMAL(18,6) makes the sum fold-order-free), then the new centroid
    * lists with an emptied cell keeping its previous centroid. */
  private def updateCte(n: Int): String =
    s"""u$n AS (
        SELECT cell, g.i AS dim1,
          CAST(SUM(CAST(${Registry.sroundSql(s"CAST(embedding[g.i] AS DOUBLE)", 6)}
            AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS cd
        FROM a$n CROSS JOIN (SELECT unnest(generate_series(1, $DIMS)) AS i) g
        GROUP BY cell, g.i),
      cents$n AS (
        SELECT c0.cell, COALESCE(u.cvec, c0.cvec) AS cvec
        FROM cents${n - 1} c0 LEFT JOIN
          (SELECT cell, list(cd ORDER BY dim1) AS cvec FROM u$n GROUP BY cell) u
        ON c0.cell = u.cell)"""

  private lazy val kmeansOracle: String = {
    val iterCtes = (1 to ITERS).map(n => s"${assignCte(n, n - 1)}, ${updateCte(n)}")
    s"""WITH emb AS (
          SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL),
        cents0 AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
          FROM (SELECT vec_id, embedding FROM emb ORDER BY vec_id LIMIT $K)),
        ${iterCtes.mkString(",\n")},
        ${assignCte(ITERS + 1, ITERS)}
        SELECT vec_id, cell FROM a${ITERS + 1}"""
  }

  val queries: Seq[Q] = Seq(

    // ---- Distributed Lloyd k-means: the full iterated loop ---------------
    // Scale: per iteration one map-side codegen argmin (centroids ride the
    // expression, no join) + posexplode partial agg (shuffle ≤ k×d×P
    // pre-combined rows) + a k×d collect; the final answer is one more
    // map-side assign. The oracle replays the identical loop as unrolled
    // CTEs — see ClusteringSpec for determinism under repartitioning.
    Q("q149_kmeans", (s, dir) => {
      val e = table(s, dir, "embeddings")
      val seeds = Clustering.seedsByIdAsc(e, "vec_id", "embedding", K)
      val scope = new CacheScope
      val model =
        try Clustering.fit(e, "embedding", seeds, maxIter = ITERS, tol = 0.0,
          scope = scope)
        finally scope.unpersistAll()
      Clustering.assign(e.filter(col("embedding").isNotNull),
          "embedding", model.centroids)
        .select(col("vec_id"), col("cell"))
    }, Some(kmeansOracle)))
}
