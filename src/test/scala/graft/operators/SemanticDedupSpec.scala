package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SemDeDup-style semantic dedup: cell-bucketed exact-cosine pairs + CC
  * collapse. Precision is 1.0 by construction (every scored pair is true);
  * the approximation is recall at cell boundaries — proven full on a
  * corpus with real cluster structure, and measured (subset + determinism)
  * on the synthetic embeddings whose low-threshold "near dups" deliberately
  * straddle cells. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  /** 3 tight, well-separated clusters along distinct axes: within-cluster
    * cosine ≈ 1, cross-cluster ≈ 0. Deterministic construction. */
  private def clustered = {
    val rows = for {
      c <- 0 until 3
      j <- 0 until 30
    } yield {
      val v = Array.fill(8)(0.001f * ((c * 31 + j) % 7)) // tiny common floor
      v(c) = 1.0f
      v((c + 3) % 8) = 0.01f * (j + 1) // small within-cluster spread
      ((c * 100 + j).toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("full recall on clustered data: cell buckets recover every true pair") {
    val e = clustered
    val brute = Similarity.nearDupPairs(e.withColumn("b0", lit(0)), "b0", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // sanity: the structure is what the fixture intends — all 3·C(30,2)
    // within-cluster pairs, nothing across
    assert(brute.size === 3 * 30 * 29 / 2)
    assert(brute.forall { case (a, b) => a / 100 === b / 100 })
    val sem = Similarity.semanticNearDups(e, nCells = 3, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sem === brute, "cell bucketing lost a within-cluster pair")
  }

  test("corpus: precision 1.0 (subset of brute force) and partition-determinism") {
    val e = graft.queries.Registry.table(spark, sf0001, "embeddings")
    val brute = Similarity.nearDupPairs(e.withColumn("b0", lit(0)), "b0", 0.25)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sem = Similarity.semanticNearDups(e, nCells = 8, threshold = 0.25)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sem.nonEmpty && sem.subsetOf(brute))
    // deterministic across input partitionings (md5-ordered sample + driver
    // Lloyd + map-side argmin are all partitioning-independent)
    val sem13 = Similarity
      .semanticNearDups(e.repartition(13), nCells = 8, threshold = 0.25)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sem13 === sem)
  }

  test("semanticDedup keeps exactly the lowest id of each connected component") {
    val e = clustered
    val pairs = Similarity.semanticNearDups(e, nCells = 3, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    // independent union-find over the scored pairs
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val all = e.select("vec_id").as[Long].collect().toSet
    val expected = all.filter(id => !parent.contains(id) || find(id) == id)
    val kept = Similarity.semanticDedup(e, nCells = 3, threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === expected) // one survivor per component: its min id
  }
}
