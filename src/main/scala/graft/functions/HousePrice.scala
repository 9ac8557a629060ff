package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's entire scalar "expression language" (SURVEY §2.4, E1–E8),
  * re-expressed as native Spark column functions — zero UDFs, so every
  * operator stays inside whole-stage codegen and Catalyst can push/fold/prune
  * through it.
  *
  * Reference sites (behavior only, no code copied):
  *  - E1 city-from-filename: etl_pipeline_spark.py:11-23 (26-entry letter map)
  *  - E2 ROC→ISO date:       etl_pipeline_beam.py:92-93 ('1100718'→'2021-07-18')
  *  - E3 date validity:      etl_pipeline_spark.py:26-33 (subsumed by E2 NULLs)
  *  - E5 zero-price repair:  etl_pipeline_beam.py:99 (divide by AREA — the
  *    Spark file's :73-74 divides by the zero column itself; that is a bug we
  *    deliberately do not reproduce, SURVEY §7.4.2)
  *  - E6 m²→ping:            etl_pipeline_spark.py:76,78 (factor 3.30579)
  *  - E7 section regex:      etl_pipeline_beam.py:49-58 ('大湖段572地號'→'大湖段')
  */
object HousePrice {

  /** m² → 坪 (ping) conversion factor, etl_pipeline_spark.py:76. */
  val M2_PER_PING = 3.30579

  /** E1: the reference's 26-letter → city/county lookup table
    * (etl_pipeline_spark.py:15-20, duplicated etl_pipeline_beam.py:27-38). */
  val cityCode: Map[String, String] = Map(
    "a" -> "台北市", "b" -> "台中市", "c" -> "基隆市", "d" -> "台南市",
    "e" -> "高雄市", "f" -> "新北市", "g" -> "宜蘭縣", "h" -> "桃園縣",
    "j" -> "新竹縣", "k" -> "苗栗縣", "l" -> "臺中縣", "m" -> "南投縣",
    "n" -> "彰化縣", "p" -> "雲林縣", "q" -> "嘉義縣", "r" -> "臺南縣",
    "s" -> "高雄縣", "t" -> "屏東縣", "u" -> "花蓮縣", "v" -> "臺東縣",
    "x" -> "澎湖縣", "y" -> "陽明山", "w" -> "金門縣", "z" -> "連江縣",
    "i" -> "嘉義市", "o" -> "新竹市")

  /** Letter → city as a single chained CASE expression (codegen-able; a
    * 22-arm `when` folds to a Catalyst CaseWhen — constant-foldable and far
    * cheaper than the reference's Python UDF at etl_pipeline_spark.py:46). */
  def cityForLetter(letter: Column): Column =
    cityCode.toSeq.sortBy(_._1).foldLeft(lit(null).cast("string")) {
      case (acc, (k, v)) => when(letter === lit(k), lit(v)).otherwise(acc)
    }

  /** E1 end-to-end: path → basename → char at index 6 → city name.
    * `101S4_g_lvr_land_a.csv` → 'g' → 宜蘭縣. Defensive: short basenames
    * yield NULL (substring past end → empty → no CASE arm matches). */
  def cityFromFilename(path: Column): Column =
    cityForLetter(substring(substring_index(path, "/", -1), 7, 1))

  /** E2+E3: ROC calendar string → DATE. '1100718' → 2021-07-18
    * (year = leading digits + 1911; month/day = fixed-width trailing 4).
    * Invalid month/day/garbage → NULL — exactly the reference's F3 validity
    * filter for free. Accepts 6-digit (ROC year < 100) and 7-digit forms;
    * anything longer is malformed under the data contract → NULL.
    * Implemented as the codegen'd RocDate expression (single byte pass). */
  def rocToDate(roc: Column): Column =
    graft.functions.RocDate.rocDate(roc.cast("string"))

  /** Composed-expression reference form of E2 (kept for cross-checks; on
    * the contract domain of 6/7-digit strings it equals rocToDate —
    * it additionally "accepts" malformed 8+-digit strings by accident,
    * which the kernel deliberately rejects). */
  def rocToDateRef(roc: Column): Column = {
    val digits = roc.cast("string")
    val n = length(digits)
    val yr = digits.substr(lit(1), n - 4).cast("int") + 1911
    val mo = substring(digits, -4, 2)
    val dy = substring(digits, -2, 2)
    // concat_ws (E8) folds year-month-day join; to_date validates strictly.
    when(n >= 6 && n <= 7 && digits.rlike("^[0-9]+$"),
      to_date(concat_ws("-", yr.cast("string"), mo, dy), "yyyy-M-d"))
  }

  /** E5 (Beam semantics): repair unit_price==0 by total/area; ÷0 → NULL
    * (non-ANSI), matching pandas NaN→NULL at the reference's sink. */
  def repairUnitPrice(unitPrice: Column, totalPrice: Column, area: Column): Column =
    when(unitPrice === 0, round(totalPrice / area, 2)).otherwise(unitPrice)

  /** E6: m² → ping for areas (divide), HALF_UP round 2. */
  def m2ToPing(area: Column): Column = round(area / lit(M2_PER_PING), 2)

  /** E6: per-m² price → per-ping price (multiply), HALF_UP round 2. */
  def priceM2ToPing(price: Column): Column = round(price * lit(M2_PER_PING), 2)

  /** E7: extract leading '…段' section from a position string; NULL (not "")
    * on no-match, preserving the reference's pandas-NaN semantics
    * (SURVEY §7.4.5). */
  def extractSection(position: Column): Column =
    nullif(regexp_extract(position, "^(.*段)", 1), lit(""))

  /** Generic NULL-on-no-match regexp extract (engine surface for E7). */
  def regexpExtractNull(c: Column, pattern: String, group: Int): Column =
    nullif(regexp_extract(c, pattern, group), lit(""))
}
