package graft.operators

import graft.SparkSpec
import graft.queries.Registry

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("curation pipeline: dedups, collapses, filters, enriches end-to-end") {
    val base = Registry.table(spark, sf0001, "documents").limit(100)
    // plant an exact dup and a near dup of doc 0
    val d0 = base.filter($"doc_id" === 0).select($"text").as[String].collect().head
    val planted = Seq(
      (9001L, d0, "en", "srcX", d0.length.toLong),              // exact dup
      (9002L, d0 + " extra tail word", "en", "srcX", 0L))        // near dup
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val docs = base.unionByName(planted)

    val res = Curation.run(docs, minQuality = 0.2, jaccardThreshold = 0.5)
    val s = res.summary.collect().head
    assert(s.getAs[Long]("n_input") === 102L)
    assert(s.getAs[Long]("n_after_exact_dedup") === 101L)  // 9001 folded into 0
    assert(s.getAs[Long]("n_after_near_dedup") <= 100L)    // 9002 collapsed to 0
    assert(s.getAs[Long]("n_curated") <= s.getAs[Long]("n_after_near_dedup"))
    val ids = res.curated.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(9001L) && !ids.contains(9002L))
    assert(res.curated.columns.contains("lang_pred"))
    assert(res.curated.columns.contains("quality"))
  }
}
