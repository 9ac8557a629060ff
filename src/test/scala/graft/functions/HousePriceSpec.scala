package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.HousePrice._

/** Unit vectors from the reference's docstring examples (SURVEY §5) plus
  * edge cases (§7.4). */
class HousePriceSpec extends SparkSpec {
  import spark.implicits._

  private def rocOf(s: String): Option[String] =
    Seq(s).toDF("roc").select(rocToDate(col("roc")).cast("string"))
      .collect().map(r => Option(r.getString(0))).head

  test("rocToDate: reference docstring vector 1100718 -> 2021-07-18") {
    assert(rocOf("1100718") === Some("2021-07-18"))
  }

  test("rocToDate: 6-digit ROC year (0991122 / 991122 -> 2010-11-22)") {
    assert(rocOf("0991122") === Some("2010-11-22"))
    assert(rocOf("991122") === Some("2010-11-22"))
  }

  test("rocToDate: invalid month/day/garbage/empty -> NULL (F3 semantics)") {
    assert(rocOf("1101301") === None) // month 13
    assert(rocOf("1100732") === None) // day 32
    assert(rocOf("1050230") === None) // Feb 30
    assert(rocOf("1100700") === None) // day 00
    assert(rocOf("abc") === None)
    assert(rocOf("") === None)
    assert(rocOf("11007") === None)   // too short
  }

  test("cityForLetter: reference map (g -> yilan, a -> taipei, unknown -> NULL)") {
    val out = Seq("g", "a", "7", "").toDF("l")
      .select(cityForLetter(col("l"))).collect().map(r => Option(r.getString(0)))
    assert(out(0) === Some("宜蘭縣"))
    assert(out(1) === Some("台北市"))
    assert(out(2) === None)
    assert(out(3) === None)
  }

  test("cityFromFilename: letter at basename index 6 (reference example)") {
    val out = Seq("gs://bucket/land/101S4_g_lvr_land_a.csv", "/x/110S1_a_lvr_land_a.csv", "/x/short")
      .toDF("p").select(cityFromFilename(col("p"))).collect().map(r => Option(r.getString(0)))
    assert(out(0) === Some("宜蘭縣"))
    assert(out(1) === Some("台北市"))
    assert(out(2) === None)
  }

  test("repairUnitPrice: Beam semantics (divide by area), div-by-zero -> NULL") {
    val df = Seq(
      (0.0, 3000000.0, 100.0),  // repair -> 30000
      (500.0, 3000000.0, 100.0), // keep
      (0.0, 100.0, 0.0))         // repair with area 0 -> NULL
      .toDF("unit", "total", "area")
    val out = df.select(repairUnitPrice(col("unit"), col("total"), nullif(col("area"), lit(0.0))))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out(0) === Some(30000.0))
    assert(out(1) === Some(500.0))
    assert(out(2) === None)
  }

  test("ping conversion: exact multiples and HALF_UP rounding") {
    val out = Seq((661.158, 15000.0)).toDF("area", "price")
      .select(m2ToPing(col("area")), priceM2ToPing(col("price")))
      .collect().head
    assert(out.getDouble(0) === 200.0)
    assert(out.getDouble(1) === 49586.85)
  }

  test("extractSection: reference docstring + NULL on no-match") {
    val out = Seq("大湖段572地號", "和平段1小段2地號", "no section here")
      .toDF("p").select(extractSection(col("p")))
      .collect().map(r => Option(r.getString(0)))
    assert(out(0) === Some("大湖段"))
    assert(out(1) === Some("和平段1小段")) // greedy: longest 段 prefix
    assert(out(2) === None)
  }
}
