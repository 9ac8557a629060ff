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

  test("keyHistogram surfaces the hot key") {
    val df = (Seq.fill(100)("hot") ++ Seq("a", "b", "c")).toDF("k")
    val top = Skew.keyHistogram(df, col("k"), 2).collect()
    assert(top.head.getAs[String]("key") === "hot")
    assert(top.head.getAs[Long]("n") === 100L)
  }
}
