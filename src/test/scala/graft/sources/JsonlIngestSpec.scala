package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

class JsonlIngestSpec extends SparkSpec {
  import spark.implicits._

  test("round trip preserves hostile strings byte for byte") {
    val docs = Seq(
      (1L, "plain text"),
      (2L, "with \"quotes\" and \\ backslashes"),
      (3L, "line one\nline two\ttabbed"),
      (4L, "unicode: 宜蘭縣 ñ é 🙂"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-jsonl").toString + "/docs"
    JsonlIngest.write(docs, dir)
    val back = JsonlIngest.parsed(JsonlIngest.read(spark, dir, docs.schema))
    val m = back.collect()
      .map(r => r.getAs[Long]("doc_id") -> Option(r.getAs[String]("text"))).toMap
    assert(m === Map(
      1L -> Some("plain text"),
      2L -> Some("with \"quotes\" and \\ backslashes"),
      3L -> Some("line one\nline two\ttabbed"),   // embedded newline survives
      4L -> Some("unicode: 宜蘭縣 ñ é 🙂"),
      5L -> None))                                 // NULL stays NULL
  }

  test("streaming read: files become micro-batches, quarantine intact") {
    val dir = Files.createTempDirectory("graft-jsonl-stream").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val q = JsonlIngest.readStream(spark, dir, schema)
      .writeStream.format("memory").queryName("jsonl_stream")
      .outputMode("append").start()
    try {
      Files.write(java.nio.file.Paths.get(dir, "drop1.jsonl"),
        "{\"doc_id\": 1, \"text\": \"first\"}\nbroken line\n".getBytes("UTF-8"))
      q.processAllAvailable()
      Files.write(java.nio.file.Paths.get(dir, "drop2.jsonl"),
        "{\"doc_id\": 2, \"text\": \"second\"}\n".getBytes("UTF-8"))
      q.processAllAvailable()
      val out = spark.table("jsonl_stream")
      assert(JsonlIngest.parsed(out).count() === 2L)
      assert(JsonlIngest.corrupt(out).as[String].collect().toSeq ===
        Seq("broken line"))
    } finally q.stop()
  }

  test("JSONL stream feeds curation end to end (parse → quarantine → curate)") {
    val dir = Files.createTempDirectory("graft-jsonl-curate").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = JsonlIngest.readStream(spark, dir, schema)
    val q = graft.streaming.DocStream.curate(JsonlIngest.parsed(stream))
      .writeStream.format("memory").queryName("jsonl_curated")
      .outputMode("append").start()
    try {
      Files.write(java.nio.file.Paths.get(dir, "drop.jsonl"),
        ("{\"doc_id\": 1, \"text\": \"the quick brown fox jumps over the dog\"}\n" +
          "totally broken\n" +
          "{\"doc_id\": 2, \"text\": \"the QUICK  brown fox jumps over the dog\"}\n")
          .getBytes("UTF-8"))
      q.processAllAvailable()
      val out = spark.table("jsonl_curated")
      // doc 2 is an exact dup after normalization → deduped in-stream;
      // the broken line never reaches curation (quarantined at parse)
      assert(out.select("doc_id").as[Long].collect().toSeq === Seq(1L))
      assert(out.columns.contains("lang_pred") && out.columns.contains("quality"))
    } finally q.stop()
  }

  test("a bare JSON `null` line quarantines instead of parsing all-NULL") {
    val dir = Files.createTempDirectory("graft-jsonl-null").toString
    Files.write(java.nio.file.Paths.get(dir, "part-0.json"),
      ("{\"doc_id\": 1, \"text\": \"good\"}\n" +
        "null\n" +                  // valid JSON, but not a record
        "  null \n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val all = JsonlIngest.read(spark, dir, schema)
    // without the NULL-struct guard these surface as phantom all-NULL
    // "parsed" documents (from_json returns a NULL struct, not a corrupt row)
    assert(JsonlIngest.parsed(all).count() === 1L)
    assert(JsonlIngest.corrupt(all).as[String].collect().toSeq ===
      Seq("null", "  null "))
  }

  test("a caller schema containing the corrupt column fails loudly") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField(JsonlIngest.CORRUPT_COL, StringType)))
    val e = intercept[IllegalArgumentException] {
      JsonlIngest.read(spark, "/nonexistent", schema)
    }
    assert(e.getMessage.contains(JsonlIngest.CORRUPT_COL))
  }

  test("malformed lines quarantine instead of killing the read") {
    val dir = Files.createTempDirectory("graft-jsonl-bad").toString
    Files.write(java.nio.file.Paths.get(dir, "part-0.json"),
      ("{\"doc_id\": 1, \"text\": \"good\"}\n" +
        "\n" +                      // blank line: format noise, not a record
        "not json at all\n" +
        "   \n" +                   // whitespace-only: same
        "{\"doc_id\": 2, \"text\": \"also good\"}\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val all = JsonlIngest.read(spark, dir, schema)
    assert(JsonlIngest.parsed(all).count() === 2L)
    assert(JsonlIngest.corrupt(all).as[String].collect().toSeq ===
      Seq("not json at all"))
  }
}
