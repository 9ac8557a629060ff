package graft.operators

import graft.SparkSpec
import graft.queries.Registry

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.fromText(
    Registry.table(spark, sf0001, "documents").limit(50), "doc_id", "text")

  test("binary payload plumbing: schema contract holds") {
    assert(media.schema.fieldNames.toSeq === Multimodal.metadataSchema.fieldNames.toSeq)
    assert(media.schema("payload").dataType.typeName === "binary")
  }

  test("stub feature extraction: deterministic, byte counts match text length") {
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 50)
    feats.foreach { r =>
      assert(r.getAs[Long]("n_bytes") > 0)
      assert(r.getAs[Seq[Float]]("feature").length === 8)
    }
    // determinism: second run identical
    val again = Multimodal.extractFeatures(media).collect()
    assert(feats.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }

  test("withFeatures joins features back onto metadata without row loss") {
    val out = Multimodal.withFeatures(media)
    assert(out.count() === 50)
    assert(out.columns.contains("feature") && out.columns.contains("payload"))
  }

  test("resize stub: schema contract intact, dimensions set, payload bounded") {
    val out = Multimodal.resize(media, 64, 64)
    assert(out.schema.fieldNames.toSeq === Multimodal.metadataSchema.fieldNames.toSeq)
    val rows = out.collect()
    assert(rows.forall(_.getAs[Int]("width") === 64))
    assert(rows.forall(r => r.getAs[Array[Byte]]("payload").length <= 64))
  }

  test("frame sampling stub: explode shape with stride") {
    val frames = Multimodal.sampleFrames(media, everyNth = 2, chunk = 64)
    assert(frames.columns.toSeq === Seq("media_id", "frame_no", "frame"))
    assert(frames.count() >= 50) // at least one frame per document
    val strides = frames.select("frame_no").distinct()
      .collect().map(_.getInt(0))
    assert(strides.forall(_ % 2 === 0))
  }
}
