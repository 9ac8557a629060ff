package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed —
  * the 100 TB failure mode where one hot key pins a single task.
  *
  * First line of defense is AQE's runtime skew-join splitting
  * (spark.sql.adaptive.skewJoin, on by default in this engine's sessions).
  * `saltedJoin` is the explicit fallback for when the skew is known ahead
  * of time or AQE can't help (e.g. a broadcast-ineligible dimension with
  * one dominant key): the left (large, skewed) side gets a random salt in
  * [0, buckets); the right side is exploded `buckets`-fold so every
  * (key, salt) pair finds its match. Each hot key's work then spreads
  * across `buckets` tasks.
  */
object Skew {

  /** Equi-join `left.key = right.key` with the left side salted.
    * `buckets` multiplies the right side's cardinality — keep it small
    * (8-64) and apply only when a key's frequency justifies it.
    *
    * Join-type contract: inner/left/left_semi/left_anti only. Right and
    * full outer are REJECTED — an unmatched right row exists once per salt
    * replica, so those types would emit `buckets` duplicates of every
    * unmatched right row (silent result corruption, not a perf concern). */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String,
      buckets: Int, joinType: String = "inner"): DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "")
    require(!Set("right", "rightouter", "full", "outer", "fullouter").contains(jt),
      s"saltedJoin cannot preserve $joinType semantics: unmatched right rows " +
        s"would appear once per salt replica ($buckets times)")
    val saltedLeft = left.withColumn("__salt",
      (rand(seed = 42) * buckets).cast("int"))
    val explodedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(explodedRight,
        saltedLeft(key) === explodedRight(key) &&
          saltedLeft("__salt") === explodedRight("__salt"),
        joinType)
      .drop(explodedRight(key))
      .drop("__salt")
  }

  /** Top-n heaviest keys of a column with their counts — the diagnostic
    * for deciding whether salting is warranted. */
  def keyHistogram(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key").asc)
      .limit(topN)
}
