package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Vectors
import graft.queries.Registry

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("typed top-k Aggregator: per-group k best, deterministic ties") {
    val emb = Registry.table(spark, sf0001, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val scored = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 0)
      .select(col("label"),
        col("vec_id").as("id"),
        Vectors.cosine(col("embedding"), col("qvec")).as("score"))

    val topkAgg = new TopKByScore(3).toColumn
    val perLabel = scored.as[(Int, Long, Double)]
      .groupByKey(_._1)
      .mapValues { case (_, id, score) => ScoredId(id, score) }
      .agg(topkAgg)
      .collect()
      .toMap

    assert(perLabel.size === 10) // labels 0..9
    perLabel.foreach { case (_, topk) =>
      assert(topk.size === 3)
      assert(topk.map(_.score).toSeq === topk.map(_.score).sortBy(-_).toSeq)
    }
    // cross-check one group against a plain sort
    val expected0 = scored.filter(col("label") === 0)
      .orderBy(col("score").desc, col("id").asc).limit(3)
      .select("id").as[Long].collect().toSeq
    assert(perLabel(0).map(_.id) === expected0)
  }
}
