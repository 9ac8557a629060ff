package graft.streaming

import graft.SparkSpec

class DocStreamSpec extends SparkSpec {

  test("streaming curation: enrich matches batch; dup fingerprints dropped across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = DocStream.curate(docs).writeStream
      .format("memory").queryName("doc_curate").outputMode("append").start()
    try {
      input.addData((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "completely different content about columnar formats"))
      q.processAllAvailable()
      // the same text redelivered in a LATER batch (same fingerprint after
      // normalization despite case/whitespace differences) must be dropped
      input.addData((3L, "THE QUICK  brown fox jumps over the lazy dog"),
        (4L, "a genuinely new document body"))
      q.processAllAvailable()

      val out = spark.table("doc_curate")
      val ids = out.select("doc_id").as[Long].collect().toSet
      assert(ids === Set(1L, 2L, 4L)) // 3 deduped against 1 across batches
      // enrichment identical to the batch operator on the same rows
      val streamed = out.filter($"doc_id" === 1L)
        .select("lang_pred", "quality", "n_tokens", "fingerprint").collect().head
      val batch = graft.operators.TextAnalysis.enrich(
          Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text"))
        .select("lang_pred", "quality", "n_tokens", "fingerprint").collect().head
      assert(streamed === batch)
    } finally q.stop()
  }
}
