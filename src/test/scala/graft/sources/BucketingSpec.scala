package graft.sources



import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.Registry

/** Bucketing: the co-located join path. Two tables bucketed by the join
  * key join WITHOUT a shuffle — at 100 TB this removes the dominant cost
  * of repeated fact-to-fact joins (pre-shuffled once at write time). */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join with zero exchanges") {
    // spark.sql.warehouse.dir is static — tables land in ./spark-warehouse
    // (gitignored) and are dropped in the finally block
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      val o = Registry.table(spark, sf0001, "orders")
      val li = Registry.table(spark, sf0001, "lineitem")
      o.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_b")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("lineitem_b")

      val joined = spark.table("orders_b").join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      // and the result is correct
      val expected = o.join(li, col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
