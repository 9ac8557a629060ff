package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Misra-Gries heavy hitters: the superset guarantee (every item with true
  * count > n/k is present in the sketch) must hold under ANY partitioning
  * and merge tree — that is the property the q101 gate leans on. Estimates
  * are allowed to vary with partitioning; presence is not. */
class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: heavy items h1..h3 dominate; a long unique tail forces
  // constant decrement pressure on the buffer
  private def skewed = (Seq.fill(400)("h1") ++ Seq.fill(250)("h2") ++
    Seq.fill(120)("h3") ++ (1 to 1000).map(i => s"tail_$i")).toDF("item")

  test("superset guarantee holds across partitionings and merge trees") {
    val k = 10
    val df = skewed
    val n = df.count()
    val exact = df.groupBy("item").count()
      .filter(col("count") * k > n)
      .select("item").as[String].collect().toSet
    assert(exact === Set("h1", "h2")) // h3: 120*10=1200 < 1770
    for (parts <- Seq(1, 3, 8, 32)) {
      val sk = FrequentItems.sketch(df.repartition(parts), "item", k)
      assert(sk.size <= k, s"summary exceeded k at $parts partitions")
      assert(exact.subsetOf(sk.keySet),
        s"lost a qualifying item at $parts partitions: $sk")
    }
  }

  test("exactHeavyHitters returns exactly the > n/k items with exact counts") {
    val k = 10
    val got = FrequentItems.exactHeavyHitters(skewed.repartition(13), "item", k)
      .as[(String, Long)].collect().toMap
    assert(got === Map("h1" -> 400L, "h2" -> 250L))
  }

  test("uniform stream yields no false mandatory items; buffer stays bounded") {
    // nothing exceeds n/k — output must be empty, whatever the sketch holds
    val uniform = (1 to 500).flatMap(i => Seq(s"u_$i", s"u_$i")).toDF("item")
    val hh = FrequentItems.exactHeavyHitters(uniform, "item", 20)
    assert(hh.count() === 0L)
    assert(FrequentItems.sketch(uniform, "item", 20).size <= 20)
  }

  test("sketch aggregates partially before the exchange (shuffle moves sketches, not items)") {
    val ds = skewed.select(col("item").cast("string")).as[String]
    val plan = ds.select(new MisraGries(10).toColumn)
      .queryExecution.executedPlan.toString
    // partial MG per task, ONE exchange of ≤k-entry sketch buffers, final
    // merge — the distinct-item set itself never shuffles
    assert(plan.contains("partial_misragries"), plan)
    assert("Exchange".r.findAllMatchIn(plan).size === 1, plan)
  }

  test("merge subtraction preserves the guarantee on adversarial splits") {
    // heavy item confined to ONE partition: partials elsewhere are pure
    // tail, so the merge's subtract-and-drop step runs hot — the heavy
    // item must still survive the merge tree
    val k = 5
    val df = (Seq.fill(300)("heavy") ++ (1 to 600).map(i => s"t_$i"))
      .toDF("item")
      .withColumn("p", when(col("item") === "heavy", 0).otherwise(
        abs(hash(col("item"))) % 31 + 1))
      .repartition(32, col("p"))
      .select("item")
    val n = 900L
    assert(300L * k > n)
    val sk = FrequentItems.sketch(df, "item", k)
    assert(sk.contains("heavy"), sk.toString)
  }
}
