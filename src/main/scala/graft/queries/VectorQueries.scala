package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.Vectors._
import graft.queries.Registry.table

/** North-star similarity search over `embeddings` (array<float>, 64-dim).
  *
  * Precision contract shared with the oracle: every element is cast to
  * double BEFORE arithmetic and accumulated in index order — the dot
  * products are bit-identical across engines, so thresholds and top-k
  * boundaries agree exactly.
  */
object VectorQueries {

  private val DIMS = 64

  /** SQL: in-order double dot product of two list<float> columns. */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, $DIMS), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
  private def normSql(a: String): String =
    s"sqrt(list_sum(list_transform(generate_series(1, $DIMS), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))"
  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}))"

  /** SQL: the 8-plane hyperplane LSH signature (shared by q32 and q68 so
    * the gated signature definition cannot drift between them). */
  private lazy val hyperplaneSigSql: String =
    (0 until 8).map { p =>
      val weights = (0 until DIMS)
        .map(d => s"CAST(embedding[${d + 1}] AS DOUBLE) * ${planeWeight(p, d).toDouble}")
        .mkString(" + ")
      s"CASE WHEN ($weights) >= 0 THEN CAST(${1L << p} AS BIGINT) ELSE 0 END"
    }.mkString(" + ")

  val queries: Seq[Q] = Seq(

    // ---- Brute-force cosine top-k (the correctness baseline) --------------
    // Scale: the query vector broadcasts (1 row); the scan is embarrassingly
    // parallel; top-k is TakeOrderedAndProject (per-partition heap + driver
    // merge of k), never a global sort.
    Q("q30_ann_bruteforce", (s, dir) => {
      val e = table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= 0)
        .withColumn("cos", cosine(col("embedding"), col("qvec")))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .select(col("vec_id"), col("cos"))
        .limit(20)
    }, Some(s"""
      SELECT vec_id, ${cosSql("embedding", "qvec")} AS cos
      FROM embeddings, (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
      WHERE vec_id <> 0
      ORDER BY cos DESC, vec_id ASC LIMIT 20"""), headline = true),

    // ---- Embedding-cosine near-dup pairs ----------------------------------
    // Scale: pairs constrained to an equi-join on `label` (stand-in for an
    // LSH/IVF bucket key) — per-bucket quadratic, not global quadratic.
    // Norms are computed once per VECTOR before the join (not once per
    // pair); cos = dot/(norm_a*norm_b) — the identical expression values,
    // one third of the arithmetic. The same restructure appears in the SQL.
    Q("q31_embed_neardup", (s, dir) => {
      val e = table(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding"),
          norm(col("embedding")).as("nrm"))
      val a = e.as("a"); val b = e.as("b")
      a.join(b, col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .withColumn("cos",
          dot(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")))
        .filter(col("cos") > 0.25)
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cos"))
    }, Some(s"""
      SELECT vec_a, vec_b, cos FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
          ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
        FROM (SELECT vec_id, label, embedding, ${normSql("embedding")} AS nrm FROM embeddings) a
        JOIN (SELECT vec_id, label, embedding, ${normSql("embedding")} AS nrm FROM embeddings) b
          ON a.label = b.label AND a.vec_id < b.vec_id)
      WHERE cos > 0.25"""), headline = true),

    // ---- LSH signatures (the ANN scale path's bucket key) -----------------
    // 8 deterministic md5-derived hyperplanes → 8-bit signature; candidate
    // generation joins on the signature instead of scanning everything.
    Q("q32_ann_lsh_sig", (s, dir) => {
      table(s, dir, "embeddings")
        .select(col("vec_id"),
          hyperplaneSig(col("embedding"), planes = 8, dims = DIMS).as("sig"))
    }, Some(s"SELECT vec_id, $hyperplaneSigSql AS sig FROM embeddings")),

    // ---- Embedding near-dup pairs over the REAL bucket key ----------------
    // q31's shape with the label stand-in replaced by the hyperplane LSH
    // signature (q32) — the actual 100 TB bucketing: candidate pairs only
    // within the 2^planes signature buckets, cosine-verified. The oracle
    // composes the q32 signature SQL with the q31 pair SQL.
    Q("q68_embed_neardup_lsh", (s, dir) => {
      val e = table(s, dir, "embeddings")
        .select(col("vec_id"),
          hyperplaneSig(col("embedding"), planes = 8, dims = DIMS).as("sig"),
          col("embedding"), norm(col("embedding")).as("nrm"))
      val a = e.as("a"); val b = e.as("b")
      a.join(b, col("a.sig") === col("b.sig") && col("a.vec_id") < col("b.vec_id"))
        .withColumn("cos",
          dot(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")))
        .filter(col("cos") > 0.25)
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cos"))
    }, Some {
      val sigRel =
        s"""(SELECT vec_id, $hyperplaneSigSql AS sig, embedding,
              ${normSql("embedding")} AS nrm FROM embeddings)"""
      s"""
      SELECT vec_a, vec_b, cos FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
          ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
        FROM $sigRel a JOIN $sigRel b
          ON a.sig = b.sig AND a.vec_id < b.vec_id)
      WHERE cos > 0.25"""
    }),

    // ---- Batched multi-query ANN: LSH buckets + grouped bounded heap ------
    // The multi-query generalization of q58's single-query LSH top-k (the
    // r10 verdict's #1 ask): a TABLE of queries (vec_id % 53) explodes into
    // its 9 multi-probe buckets (radius 1 over 8 planes), candidates come
    // from ONE equi-join on the signature, and per-query top-5 comes from
    // one grouped bounded-heap aggregation (TopKByScore: ≤ k pairs per
    // task per query enter the shuffle) — no per-query broadcast, no
    // driver loop. The oracle replicates the ALGORITHM (sig + probe set +
    // rank window), the same parity discipline as q68; recall vs brute
    // force is SimilaritySpec's assertion, not a hash gate.
    Q("q115_ann_batch_topk", (s, dir) => {
      val e = table(s, dir, "embeddings")
      val qs = e.filter(col("vec_id") % 53 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      graft.operators.Similarity.lshBatchTopK(e, qs, k = 5)
    }, Some {
      val masks = Seq(0, 1, 2, 4, 8, 16, 32, 64, 128)
        .map(m => s"($m)").mkString(",")
      s"""
      WITH sigs AS (
        SELECT vec_id, $hyperplaneSigSql AS sig, embedding FROM embeddings),
      q AS (
        SELECT vec_id AS qid, sig, embedding AS qvec
        FROM sigs WHERE vec_id % 53 = 0),
      probes AS (
        SELECT qid, qvec, xor(sig, CAST(m.mask AS BIGINT)) AS sig
        FROM q CROSS JOIN (VALUES $masks) m(mask)),
      cand AS (
        SELECT p.qid, s.vec_id, ${cosSql("s.embedding", "p.qvec")} AS cos
        FROM sigs s JOIN probes p ON s.sig = p.sig),
      ranked AS (
        SELECT qid, vec_id, cos,
          row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
        FROM cand)
      SELECT qid, vec_id, cos, CAST(rank AS BIGINT) AS rank
      FROM ranked WHERE rank <= 5"""
    }, headline = true),

    // ---- Batched multi-query top-k, exact (the correctness baseline) ------
    // Same grouped-heap head as q115 but over the full corpus×queries score
    // matrix — the exactness baseline the approximate paths are measured
    // against (and the right tool when the query batch broadcasts). The
    // oracle is genuine per-query brute force: every (query, vector) cosine,
    // ranked per query.
    Q("q118_ann_batch_bruteforce", (s, dir) => {
      val e = table(s, dir, "embeddings")
      val qs = e.filter(col("vec_id") % 101 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      graft.operators.Similarity.batchBruteForceTopK(e, qs, k = 5)
    }, Some(s"""
      WITH q AS (
        SELECT vec_id AS qid, embedding AS qvec FROM embeddings
        WHERE vec_id % 101 = 0),
      ranked AS (
        SELECT q.qid, e.vec_id, ${cosSql("e.embedding", "q.qvec")} AS cos,
          row_number() OVER (PARTITION BY q.qid
            ORDER BY ${cosSql("e.embedding", "q.qvec")} DESC, e.vec_id) AS rank
        FROM embeddings e CROSS JOIN q)
      SELECT qid, vec_id, cos, CAST(rank AS BIGINT) AS rank
      FROM ranked WHERE rank <= 5""")),

    // ---- Int8 scalar quantization (4× embedding storage) ------------------
    // Max-abs per-vector scale, HALF_UP codes, bounded reconstruction error
    // |x − q·s| ≤ s/2. The gate is exact where exactness exists (integer
    // code checksums) and a contract flag where FP noise lives (violation
    // count of the half-step bound, expected 0 — same pattern as q14/q72).
    Q("q78_int8_quantization", (s, dir) => {
      val e = table(s, dir, "embeddings")
        .withColumn("__scale", maxAbsScale(col("embedding")))
        .withColumn("__q", quantizeInt8(col("embedding"), col("__scale")))
        .withColumn("__dq", dequantizeInt8(col("__q"), col("__scale")))
        .withColumn("__checksum",
          aggregate(col("__q"), lit(0L), (acc, b) => acc + b.cast("long")))
        .withColumn("__maxerr", array_max(zip_with(col("embedding"), col("__dq"),
          (a, b) => abs(a.cast("double") - b))))
      e.groupBy(col("label"))
        .agg(count(lit(1)).as("n_vectors"),
          sum(col("__checksum")).as("code_checksum"),
          sum(when(col("__maxerr") <= col("__scale") * 0.5000001, 0L)
            .otherwise(1L)).as("n_violations"))
    }, Some {
      val x = "CAST(embedding[i] AS DOUBLE)"
      val qi = s"CASE WHEN scale = 0 THEN 0 ELSE CAST(${Registry.sroundSql(s"$x / scale", 0)} AS INT) END"
      s"""
      SELECT label, COUNT(*) AS n_vectors,
        CAST(SUM(checksum) AS BIGINT) AS code_checksum,
        CAST(SUM(CASE WHEN maxerr <= scale * 0.5000001 THEN 0 ELSE 1 END) AS BIGINT) AS n_violations
      FROM (
        SELECT label, scale,
          CAST(list_sum(q) AS BIGINT) AS checksum,
          list_max(list_transform(generate_series(1, $DIMS),
            i -> abs(CAST(embedding[i] AS DOUBLE) - q[i] * scale))) AS maxerr
        FROM (
          SELECT label, embedding, scale,
            list_transform(generate_series(1, $DIMS), i -> $qi) AS q
          FROM (SELECT label, embedding,
                  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
                FROM embeddings)))
      GROUP BY label"""
    }),

    // ---- Centroid-style aggregation over vectors --------------------------
    // Per-label mean vector norm: exercises array aggregation semantics.
    // Sums are per-dimension in index order; the outer SUM over rows uses a
    // decimal cast of the rounded per-row norm to stay order-independent.
    Q("q33_vector_stats", (s, dir) => {
      val e = table(s, dir, "embeddings")
      e.withColumn("nrm", round(norm(col("embedding")), 6))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          sum(col("nrm").cast("decimal(18,6)")).cast("double").as("sum_norm"))
    }, Some(s"""
      SELECT label, COUNT(*) AS n,
        CAST(SUM(CAST(${Registry.sroundSql(normSql("embedding"), 6)} AS DECIMAL(18,6))) AS DOUBLE) AS sum_norm
      FROM embeddings GROUP BY label"""))
  )
}
