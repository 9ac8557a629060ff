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
}
