package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Registry

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Registry.table(spark, sf0001, "documents")
    .select("doc_id", "text")

  test("bins respect the streaming-fill invariants per shard") {
    val maxTokens = 200L
    val out = Packing.assignBins(docs, "text", "doc_id", maxTokens, nShards = 4)
      .select("shard", "bin", "doc_id", "n_tokens")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (shard, rows) =>
      val ordered = rows.sortBy(_._3)
      // bins are nondecreasing in doc order and start at 0
      assert(ordered.head._2 === 0L)
      assert(ordered.sliding(2).forall {
        case Array(a, b) => b._2 >= a._2; case _ => true })
      // a bin's tokens EXCLUDING its last (straddling) doc fit maxTokens
      ordered.groupBy(_._2).foreach { case (bin, binRows) =>
        val sorted = binRows.sortBy(_._3)
        val withoutLast = sorted.dropRight(1).map(_._4).sum
        assert(withoutLast < maxTokens,
          s"shard=$shard bin=$bin pre-straddle sum $withoutLast >= $maxTokens")
      }
    }
  }

  test("assignment is deterministic under repartitioning") {
    val a = Packing.assignBins(docs, "text", "doc_id", 300L)
      .select("doc_id", "shard", "bin").as[(Long, Long, Long)].collect().toSet
    val b = Packing.assignBins(docs.repartition(17), "text", "doc_id", 300L)
      .select("doc_id", "shard", "bin").as[(Long, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("binStats accounts for every document exactly once") {
    val assigned = Packing.assignBins(docs, "text", "doc_id", 250L)
    val stats = Packing.binStats(assigned)
    assert(stats.agg(sum("n_docs")).as[Long].collect().head === docs.count())
    val totalTokens = assigned.agg(sum("n_tokens")).as[Long].collect().head
    assert(stats.agg(sum("sum_tokens")).as[Long].collect().head === totalTokens)
  }
}
