package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the latest right value with the
  * same key and right.time <= left.time (the time-series join Spark lacks
  * natively).
  *
  * Implementation is preference-order (a) — composition of built-ins:
  * tag and union both sides on (key, time), then a single window pass per
  * key carries the last-seen right value forward onto each left row.
  * Cost: ONE shuffle on key + in-partition sort by (time, tag) — the same
  * lower bound a native sort-merge as-of operator would have, so no custom
  * SparkPlan is warranted. Never a range-explode, never a per-row rescan.
  *
  * Ties: a right row at exactly left.time wins (right sorts before left at
  * equal times), matching the <= contract.
  */
object AsOfJoin {

  /** Returns `left` plus `asof_<valueCol>` from the matched right row
    * (NULL when no right row precedes). `right` needs (key, time, value). */
  def asof(
      left: DataFrame, right: DataFrame,
      key: String, timeCol: String, valueCol: String): DataFrame = {
    val vType = right.schema(valueCol).dataType
    val l = left
      .withColumn("__tag", lit(1))
      .withColumn("__v", lit(null).cast(vType))
    val leftOnly = left.columns.filterNot(c => c == key || c == timeCol)
    val r = leftOnly.foldLeft(
        right.select(col(key), col(timeCol).as(timeCol),
          lit(0).as("__tag"), col(valueCol).as("__v"))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = l.unionByName(r.select(l.columns.map(col).toSeq: _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(timeCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(s"asof_$valueCol", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .drop("__tag", "__v")
  }
}
