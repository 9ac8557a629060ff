package graft.fixtures

import java.nio.file.{Files, Paths, Path}
import java.nio.charset.StandardCharsets

/** Deterministic synthetic raw CSVs reproducing the reference's input
  * contract exactly (FIXTURES.md §A): season+cityletter filenames, BOM'd
  * Chinese header, embedded English header as data row 1, messy values
  * (invalid ROC dates, zero unit prices, garbage numerics, >2³¹ totals).
  *
  * Used by the golden end-to-end tests and by the q20_building_pipeline
  * oracle query (whose expected output is the literal VALUES table below —
  * derived by hand from the reference semantics, SURVEY §2.4).
  */
object RawCsvFixture {

  val header: Seq[String] = Seq(
    "鄉鎮市區", "交易標的", "土地位置建物門牌", "土地移轉總面積平方公尺",
    "建物移轉總面積平方公尺", "建築完成年月", "交易年月日", "總價元", "單價元平方公尺")

  private val englishHeaderRow = Seq(
    "township dist", "transaction sign", "position", "land area m2",
    "building area m2", "completion date", "transaction date", "total price",
    "unit price m2")

  /** file → rows (all strings, raw form). */
  val files: Map[String, Seq[Seq[String]]] = Map(
    // city letter index 6 = 'g' → 宜蘭縣
    "101S4_g_lvr_land_a.csv" -> Seq(
      // valid building txn; area is an exact multiple of 3.30579; total > 2³¹
      Seq("礁溪鄉", "房地(含車位)", "大湖段572地號", "100", "661.158", "0990101", "1100718", "5000000000", "15000"),
      // invalid ROC date (Feb 30) → dropped by F3
      Seq("礁溪鄉", "房地", "青仔地段100地號", "50", "33.0579", "0850605", "1050230", "4000000", "0"),
      // land-only row → dropped by the building filter, kept by land
      Seq("頭城鎮", "土地", "下埔段339地號", "330.579", "", "", "1020505", "12000000", "36299"),
      // 車位 → dropped by both pipelines
      Seq("礁溪鄉", "車位", "大忠段111地號", "0", "10", "1001231", "1011111", "800000", "0"),
      // zero unit price → E5 repair = 3000000/100 → 30000 → ping 99173.7;
      // 6-digit ROC year 099 → 2010-11-22
      Seq("宜蘭市", "房地", "民權段55地號", "0", "100", "", "0991122", "3000000", "0"),
      // land row, zero unit price → E5 repair over LAND area (1500000/66.1158
      // → 22687.47 → ping 75000.01); position has no 段 → section NULL
      Seq("冬山鄉", "土地", "羅東鎮中正路100號", "66.1158", "", "", "1070203", "1500000", "0"),
      // land row with invalid ROC month (13) → dropped by F3
      Seq("五結鄉", "土地", "隱形段1地號", "33.0579", "", "", "1021332", "777777", "100")),
    // city letter 'a' → 台北市
    "110S1_a_lvr_land_a.csv" -> Seq(
      // total exactly 2³¹ (the reference's 32-bit cast would overflow here)
      Seq("中正區", "房地(含車位)", "幸福段88地號", "", "45.5", "1080101", "1100101", "2147483648", "12345.6"),
      // garbage numerics → NULL casts; land row for the land pipeline
      Seq("大安區", "土地", "和平段1小段2地號", "165.2895", "", "0770707", "0880808", "9000000", "54.5"),
      // garbage everywhere: area/total/unit all NULL after cast
      Seq("大安區", "房地", "信義段9地號", "", "abc", "0770707", "0880808", "xyz", ""),
      // land row, garbage area → NULL area ⇒ repair ÷NULL ⇒ NULL price;
      // greedy E7 match keeps the LAST 段 (multi-段 position)
      Seq("中山區", "土地", "長安段三小段5地號", "xyz", "", "", "1111111", "5000000", "0"),
      // land row with a QUOTED comma-bearing position (real LVR files carry
      // quoted addresses) — the csv reader must keep it one field
      Seq("萬華區", "土地", "\"艋舺大道88號, 5樓\"", "33.0579", "", "", "1000101", "2000000", "100")))

  /** Write the fixture files under a stable temp dir; idempotent. */
  def writeDefault(): String =
    write(Paths.get(sys.props("java.io.tmpdir"), "graft-raw-fixture")).toString

  def write(dir: Path): Path = {
    Files.createDirectories(dir)
    files.foreach { case (name, rows) =>
      val sb = new StringBuilder
      sb.append("﻿").append(header.mkString(",")).append("\n")
      sb.append(englishHeaderRow.mkString(",")).append("\n")
      rows.foreach(r => sb.append(r.mkString(",")).append("\n"))
      Files.write(dir.resolve(name), sb.toString.getBytes(StandardCharsets.UTF_8))
    }
    dir
  }

  /** Expected building-pipeline output (q20 projection), derived by hand:
    * rows 2/3/4 of file g and row 2 of file a are filtered; ping values are
    * HALF_UP(x, 2) of the double arithmetic; completion_date_iso is the
    * optional §1.2 ROC conversion — NULL on the empty-string row, never a
    * row filter. */
  val expectedBuildingSql: String = """
    SELECT * FROM (VALUES
      ('宜蘭縣', '礁溪鄉', '大湖段572地號', CAST(200.0 AS DOUBLE), DATE '2021-07-18', CAST(5000000000 AS BIGINT), CAST(49586.85 AS DOUBLE), DATE '2010-01-01'),
      ('宜蘭縣', '宜蘭市', '民權段55地號', CAST(30.25 AS DOUBLE), DATE '2010-11-22', CAST(3000000 AS BIGINT), CAST(99173.7 AS DOUBLE), CAST(NULL AS DATE)),
      ('台北市', '中正區', '幸福段88地號', CAST(13.76 AS DOUBLE), DATE '2021-01-01', CAST(2147483648 AS BIGINT), CAST(40811.96 AS DOUBLE), DATE '2019-01-01'),
      ('台北市', '大安區', '信義段9地號', CAST(NULL AS DOUBLE), DATE '1999-08-08', CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), DATE '1988-07-07')
    ) AS t(city, township_dist, position, building_area_ping, transaction_date, total_price, unit_price_ping, completion_date_iso)"""

  /** Expected land-pipeline output (q64 projection and the golden ScalaTest),
    * derived by hand, ordered by total_price desc: E7 section extraction is
    * greedy to the LAST 段 and NULL on no-match; the garbage-area row keeps
    * NULL area AND NULL repaired price (÷NULL); the zero-unit-price row takes
    * the E5 repair over the LAND area (1500000/66.1158 → 22687.47 → ping
    * 75000.01). */
  val expectedLand: Seq[(String, String, String, Option[String], Option[Double], String, Long, Option[Double])] = Seq(
    ("宜蘭縣", "頭城鎮", "下埔段339地號", Some("下埔段"), Some(100.0), "2013-05-05", 12000000L, Some(119996.87)),
    ("台北市", "大安區", "和平段1小段2地號", Some("和平段1小段"), Some(50.0), "1999-08-08", 9000000L, Some(180.17)),
    ("台北市", "中山區", "長安段三小段5地號", Some("長安段三小段"), None, "2022-11-11", 5000000L, None),
    ("台北市", "萬華區", "艋舺大道88號, 5樓", None, Some(10.0), "2011-01-01", 2000000L, Some(330.58)),
    ("宜蘭縣", "冬山鄉", "羅東鎮中正路100號", None, Some(20.0), "2018-02-03", 1500000L, Some(75000.01)))

  /** The same expectation as a DuckDB VALUES table (q64's oracle). */
  val expectedLandSql: String = """
    SELECT * FROM (VALUES
      ('宜蘭縣', '頭城鎮', '下埔段339地號', '下埔段', CAST(100.0 AS DOUBLE), DATE '2013-05-05', CAST(12000000 AS BIGINT), CAST(119996.87 AS DOUBLE)),
      ('台北市', '大安區', '和平段1小段2地號', '和平段1小段', CAST(50.0 AS DOUBLE), DATE '1999-08-08', CAST(9000000 AS BIGINT), CAST(180.17 AS DOUBLE)),
      ('台北市', '中山區', '長安段三小段5地號', '長安段三小段', CAST(NULL AS DOUBLE), DATE '2022-11-11', CAST(5000000 AS BIGINT), CAST(NULL AS DOUBLE)),
      ('台北市', '萬華區', '艋舺大道88號, 5樓', CAST(NULL AS VARCHAR), CAST(10.0 AS DOUBLE), DATE '2011-01-01', CAST(2000000 AS BIGINT), CAST(330.58 AS DOUBLE)),
      ('宜蘭縣', '冬山鄉', '羅東鎮中正路100號', CAST(NULL AS VARCHAR), CAST(20.0 AS DOUBLE), DATE '2018-02-03', CAST(1500000 AS BIGINT), CAST(75000.01 AS DOUBLE))
    ) AS t(city, township_dist, position, section, land_area_ping, transaction_date, total_price, unit_price_ping)"""
}
