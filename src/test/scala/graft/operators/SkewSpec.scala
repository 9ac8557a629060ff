package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin produces exactly the plain-join result on skewed data") {
    // heavy tail: key 1 dominates
    val left = (Seq.fill(5000)(1) ++ (2 to 500)).toDF("k")
      .withColumn("v", col("k") * 10)
    val right = (1 to 500).map(k => (k, s"dim_$k")).toDF("k", "name")

    val plain = left.join(right, "k")
    val salted = Skew.saltedJoin(left, right, "k", buckets = 8)

    assert(salted.count() === plain.count())
    val diff = salted.groupBy("k").count().as("a")
      .join(plain.groupBy("k").count().as("b"), "k")
      .filter(col("a.count") =!= col("b.count")).count()
    assert(diff === 0)
  }

  test("saltedJoin preserves left-family join types; rejects right/full outer") {
    val left = Seq((1, "l1"), (2, "l2"), (3, "l3")).toDF("k", "lv")
    val right = Seq((1, "r1"), (9, "r9")).toDF("k", "rv")
    // left outer: unmatched LEFT rows appear exactly once
    val lo = Skew.saltedJoin(left, right, "k", buckets = 4, joinType = "left")
    assert(lo.count() === 3L)
    assert(lo.filter(col("rv").isNull).count() === 2L)
    // anti: rows with no match, once each
    val anti = Skew.saltedJoin(left, right, "k", buckets = 4, joinType = "left_anti")
    assert(anti.select("k").as[Int].collect().toSet === Set(2, 3))
    // right/full outer would duplicate unmatched right rows per salt replica
    for (jt <- Seq("right", "right_outer", "full", "full_outer", "outer")) {
      val e = intercept[IllegalArgumentException] {
        Skew.saltedJoin(left, right, "k", buckets = 4, joinType = jt)
      }
      assert(e.getMessage.contains("salt replica"))
    }
  }

  test("keyHistogram surfaces the hot key") {
    val df = (Seq.fill(100)("hot") ++ Seq("a", "b", "c")).toDF("k")
    val top = Skew.keyHistogram(df, col("k"), 2).collect()
    assert(top.head.getAs[String]("key") === "hot")
    assert(top.head.getAs[Long]("n") === 100L)
  }
}
