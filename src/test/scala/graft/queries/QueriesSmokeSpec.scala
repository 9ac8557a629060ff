package graft.queries

import graft.SparkSpec

/** t1-style smoke: every registry query runs at sf0.001; queries expected to
  * produce rows do. Oracle-value correctness is the driver's t2 (replicated
  * locally by scripts/oracle_check.py) — this spec guards executability. */
class QueriesSmokeSpec extends SparkSpec {

  private val mayBeEmpty = Set("q31_embed_neardup", "q25_ngram_jaccard")

  Registry.all.foreach { q =>
    test(s"${q.name} executes" + (if (q.oracle.isDefined) " (oracle-paired)" else "")) {
      val n = q.run(spark, sf0001).count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("entry returns rows (driver t1 contract)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query (driver compare contract)") {
    val qnames = graft.SparkEntry.queries.keySet
    assert(graft.SparkEntry.oracleSql.keySet.subsetOf(qnames))
  }
}
