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

  test("chunk: overlap windows, boundary omission, empty and NULL docs") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, (1 to 25).map(i => s"w$i").mkString(" ")), // 25 toks -> 2 chunks
      (2L, (1 to 20).map(i => s"w$i").mkString(" ")), // exactly max -> 1 chunk
      (3L, "Short DOC, verbatim!"),                   // under overlap -> 1 chunk
      (4L, ""),                                       // empty -> chunk 0, empty
      (5L, null.asInstanceOf[String]))                // NULL -> NULL chunk row
      .toDF("doc_id", "text")
    val out = Packing.chunk(docs, "text", "doc_id", maxTokens = 20, overlap = 5)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        Option(r.getAs[Integer]("chunk_no")).map(_.toInt),
        Option(r.getAs[String]("chunk_text")),
        r.getAs[Long]("n_chunk_tokens")))
    val byDoc = out.groupBy(_._1)
    // doc 1: chunk 0 = tokens 1..20, chunk 1 = tokens 16..25 (5 overlap)
    val d1 = byDoc(1L).sortBy(_._2)
    assert(d1.map(_._2) === Seq(Some(0), Some(1)))
    assert(d1(0)._3.get === (1 to 20).map(i => s"w$i").mkString(" "))
    assert(d1(1)._3.get === (16 to 25).map(i => s"w$i").mkString(" "))
    assert(d1.map(_._4) === Seq(20L, 10L))
    // doc 2: one chunk exactly (the would-be second window adds no new token)
    assert(byDoc(2L).map(_._2).toSeq === Seq(Some(0)))
    // doc 3: single chunk, ORIGINAL casing/punctuation verbatim (chunks
    // are training text, not fingerprints — never normalized)
    assert(byDoc(3L).head._3.get === "Short DOC, verbatim!")
    // doc 4: row kept, empty chunk, zero tokens
    assert(byDoc(4L).head._3.get === "" && byDoc(4L).head._4 === 0L)
    // doc 5: row kept with NULL chunk (posexplode_outer)
    assert(byDoc(5L).head._3 === None && byDoc(5L).head._4 === 0L)
    // every token of doc 1 appears in some chunk (no token lost)
    val covered = d1.flatMap(_._3.get.split(" ")).toSet
    assert(covered === (1 to 25).map(i => s"w$i").toSet)
  }
}
