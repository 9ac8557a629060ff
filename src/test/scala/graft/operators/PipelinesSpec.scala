package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.fixtures.RawCsvFixture

/** Golden end-to-end: raw dual-header CSVs (reference input contract) →
  * both pipeline DAGs → expected rows (SURVEY §5.3). */
class PipelinesSpec extends SparkSpec {

  private lazy val dir = RawCsvFixture.write(
    Files.createTempDirectory("graft-pipe-spec")).toString

  test("building pipeline: golden output (filters, city, ROC date, repair, ping)") {
    val got = Pipelines.building(spark, dir + "/*_a.csv")
      .orderBy(col("total_price").desc_nulls_last)
      .collect()
    assert(got.length === 4)
    val first = got.head // the >2^31 total row
    assert(first.getAs[String]("city") === "宜蘭縣")
    assert(first.getAs[Long]("total_price") === 5000000000L)
    assert(first.getAs[Double]("building_area_ping") === 200.0)
    assert(first.getAs[Double]("unit_price_ping") === 49586.85)
    assert(first.getAs[java.sql.Date]("transaction_date").toString === "2021-07-18")
    // the all-garbage row survives with NULLs (dates valid, numerics null)
    val nullRow = got.filter(_.isNullAt(got.head.fieldIndex("total_price")))
    assert(nullRow.length === 1)
    assert(nullRow.head.getAs[String]("position") === "信義段9地號")
    assert(nullRow.head.isNullAt(nullRow.head.fieldIndex("unit_price_ping")))
  }

  test("land pipeline: golden output incl. section extraction") {
    val got = Pipelines.land(spark, dir + "/*_a.csv")
      .orderBy(col("total_price").desc)
      .collect()
    assert(got.length === RawCsvFixture.expectedLand.length)
    def opt[T](r: org.apache.spark.sql.Row, f: String): Option[T] =
      if (r.isNullAt(r.fieldIndex(f))) None else Some(r.getAs[T](f))
    got.zip(RawCsvFixture.expectedLand).foreach { case (r, (city, town, pos, sec, areaPing, date, total, pricePing)) =>
      assert(r.getAs[String]("city") === city)
      assert(r.getAs[String]("township_dist") === town)
      assert(r.getAs[String]("position") === pos)
      assert(opt[String](r, "section") === sec)
      assert(opt[Double](r, "land_area_ping") === areaPing)
      assert(r.getAs[java.sql.Date]("transaction_date").toString === date)
      assert(r.getAs[Long]("total_price") === total)
      assert(opt[Double](r, "unit_price_ping") === pricePing)
    }
  }

  test("completion_date ROC conversion is offered as an option (SURVEY §1.2)") {
    val df = Pipelines.building(spark, dir + "/*_a.csv", convertCompletionDate = true)
    val iso = df.select(col("position"), col("completion_date_iso")).collect()
      .map(r => r.getString(0) -> Option(r.getDate(1)).map(_.toString)).toMap
    assert(iso("大湖段572地號") === Some("2010-01-01")) // ROC 0990101
    assert(iso("幸福段88地號") === Some("2019-01-01"))  // ROC 1080101
    assert(iso("民權段55地號") === None)                // empty string → NULL, row kept
    // default output keeps the reference-shaped schema
    assert(!Pipelines.building(spark, dir + "/*_a.csv")
      .columns.contains("completion_date_iso"))
  }

  test("avgPriceByYear answers the reference's demonstrated analytics query") {
    val out = Pipelines.avgPriceByYear(Pipelines.building(spark, dir + "/*_a.csv"))
      .orderBy(col("txn_year")).collect()
    assert(out.map(_.getAs[Int]("txn_year")).toSeq === Seq(1999, 2010, 2021))
    val y2021 = out.find(_.getAs[Int]("txn_year") == 2021).get
    assert(y2021.getAs[Long]("n_txns") === 2L)
    // avg(49586.85, 40811.96) = 45199.405 -> HALF_UP 2 -> 45199.41
    assert(y2021.getAs[Double]("avg_unit_price_ping") === 45199.41)
  }

  test("buildingObserved reports per-stage drop counts from one action") {
    val (df, obs) = Pipelines.buildingObserved(spark, dir + "/*_a.csv")
    val finalRows = df.count() // the one action; metrics fire as a side effect
    val m = obs.get
    // fixture: 5 of the 12 data rows carry the 房地 prefix; one of those
    // has an invalid ROC date (Feb 30) → 4 valid, nothing dropped after
    assert(m("n_class") === 5L)      // rows past the class filter
    assert(m("n_valid_date") === 4L) // minus the invalid-date row
    assert(finalRows === 4L)
    assert(df.columns.toSeq === Pipelines.building(spark, dir + "/*_a.csv").columns.toSeq)
  }

  test("dual-header filter: English header row never leaks into output") {
    val b = Pipelines.building(spark, dir + "/*_a.csv").select("township_dist")
    val l = Pipelines.land(spark, dir + "/*_a.csv").select("township_dist")
    assert(b.unionByName(l).filter(col("township_dist").contains("township")).count() === 0)
  }
}
