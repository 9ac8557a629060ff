package graft

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.Registry

/** The SQL surface: every custom expression callable from spark.sql. */
class GraftExtensionsSpec extends SparkSpec {

  test("registered SQL functions evaluate correctly") {
    GraftFunctions.register(spark)
    val row = spark.sql("""
      SELECT
        CAST(roc_date('1100718') AS STRING) AS d,
        roc_date('1101301') AS bad,
        simhash32(array('hello', 'world')) AS sh,
        minhash_hex(array('a', 'b', 'c'), 2, 0) AS mh,
        shingle_hashes(array('a', 'b', 'c'), 2) AS shg,
        dot_f(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
              array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dp,
        norm_f(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS nrm,
        sorted_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS ic
    """).collect().head
    assert(row.getAs[String]("d") === "2021-07-18")
    assert(row.isNullAt(row.fieldIndex("bad")))
    assert(row.getAs[Double]("dp") === 11.0)
    assert(row.getAs[Double]("nrm") === 5.0)
    assert(row.getAs[Int]("ic") === 2)
    assert(row.getAs[Seq[Long]]("shg").length === 2)
    assert(row.getAs[String]("mh").length === 32)
  }

  test("roc_date in SQL matches the composed reference over the corpus-derived vectors") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val vectors = Seq("1100718", "0991122", "991122", "1050230", "1101301",
      "1100732", "1100700", "", "abc", "11007", "11012251") // last: 8 digits → NULL
    val df = vectors.toDF("roc")
    val mismatches = df.select(
        functions.HousePrice.rocToDate(col("roc")).as("kernel"),
        functions.HousePrice.rocToDateRef(col("roc")).as("ref"))
      .filter(!(col("kernel") <=> col("ref")))
      .count()
    assert(mismatches === 0)
  }

  test("kernel rocToDate == composed form over all order dates round-tripped") {
    val o = Registry.table(spark, sf0001, "orders")
    val roc = concat(
      (year(col("o_orderdate")) - 1911).cast("string"),
      lpad(month(col("o_orderdate")).cast("string"), 2, "0"),
      lpad(dayofmonth(col("o_orderdate")).cast("string"), 2, "0"))
    val n = o.select(
        functions.HousePrice.rocToDate(roc).as("kernel"),
        functions.HousePrice.rocToDateRef(roc).as("ref"))
      .filter(!(col("kernel") <=> col("ref")))
      .count()
    assert(n === 0)
  }
}
