package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.HousePrice
import graft.functions.HousePrice._
import graft.queries.Registry.table

/** The reference's expression language (SURVEY §2.4 E1–E8) exercised over
  * the driver corpus so the DuckDB oracle can hash-check the semantics:
  * ROC-date round-trips, the 26-way city decode, zero-price repair + ping
  * conversion, NULL-preserving regex extraction, provenance columns.
  */
object HousePriceQueries {

  /** CASE-expression form of the city map for the oracle side, generated
    * from the same Scala constant so the two can never drift. */
  private val cityCaseSql: String =
    "CASE " + cityCode.toSeq.sorted.map { case (k, v) =>
      s"WHEN letter = '$k' THEN '$v'"
    }.mkString(" ") + " ELSE NULL END"

  val queries: Seq[Q] = Seq(

    // ---- E2+E3+E8: ROC-date round trip ------------------------------------
    // Build the 7-digit ROC string from o_orderdate, parse it back with the
    // engine's rocToDate, verify equality, aggregate by recovered year.
    Q("q15_roc_roundtrip", (s, dir) => {
      val o = table(s, dir, "orders")
      val roc = concat(
        (year(col("o_orderdate")) - 1911).cast("string"),
        lpad(month(col("o_orderdate")).cast("string"), 2, "0"),
        lpad(dayofmonth(col("o_orderdate")).cast("string"), 2, "0"))
      o.withColumn("recovered", rocToDate(roc))
        .withColumn("matches",
          when(col("recovered") === to_date(col("o_orderdate")), 1L).otherwise(0L))
        .groupBy(year(col("recovered")).cast("long").as("roc_year"))
        .agg(count(lit(1)).as("n"), sum(col("matches")).as("n_roundtrip_ok"))
    }, Some("""
      SELECT CAST(year(recovered) AS BIGINT) AS roc_year, COUNT(*) AS n,
        CAST(SUM(CASE WHEN recovered = CAST(o_orderdate AS DATE) THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok
      FROM (
        SELECT o_orderdate,
          make_date(CAST(substr(roc, 1, len(roc)-4) AS INT) + 1911,
                    CAST(substr(roc, -4, 2) AS INT),
                    CAST(substr(roc, -2, 2) AS INT)) AS recovered
        FROM (SELECT o_orderdate,
                CAST(year(o_orderdate) - 1911 AS VARCHAR)
                  || lpad(CAST(month(o_orderdate) AS VARCHAR), 2, '0')
                  || lpad(CAST(day(o_orderdate) AS VARCHAR), 2, '0') AS roc
              FROM orders))
      GROUP BY roc_year""")),

    // ---- E1: filename-letter → city decode --------------------------------
    // Letter synthesized from c_custkey; the decode itself is the reference's
    // 26-entry lookup as one chained CASE — constant-folded, no UDF, no join.
    Q("q16_city_decode", (s, dir) => {
      val c = table(s, dir, "customer")
      c.withColumn("letter", chr(lit(97) + pmod(col("c_custkey"), lit(26))))
        .withColumn("city", cityForLetter(col("letter")))
        .groupBy(col("city")).agg(count(lit(1)).as("n"))
    }, Some(s"""
      SELECT $cityCaseSql AS city, COUNT(*) AS n
      FROM (SELECT chr(97 + CAST(c_custkey % 26 AS INT)) AS letter FROM customer)
      GROUP BY 1""")),

    // ---- E4+E5+E6: casts, zero-price repair, m²→ping ----------------------
    // unit price synthesized from l_tax (has real zeros → exercises the
    // repair branch); area = l_quantity; ÷0 guarded by nullif on both sides.
    Q("q17_unit_repair", (s, dir) => {
      val li = table(s, dir, "lineitem")
      li.withColumn("unit_price",
          repairUnitPrice(col("l_tax"), col("l_extendedprice"), nullif(col("l_quantity"), lit(0.0))))
        .withColumn("unit_price_ping", priceM2ToPing(col("unit_price")))
        .withColumn("area_ping", m2ToPing(col("l_quantity")))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("unit_price_ping").cast("decimal(28,2)")).cast("double").as("sum_price_ping"),
          sum(col("area_ping").cast("decimal(18,2)")).cast("double").as("sum_area_ping"),
          sum(when(col("l_tax") === 0.0, 1L).otherwise(0L)).as("n_repaired"),
          count(lit(1)).as("n"))
    }, Some(s"""
      SELECT l_returnflag,
        CAST(SUM(CAST(${Registry.sroundSql(s"unit_price * ${M2_PER_PING}", 2)} AS DECIMAL(28,2))) AS DOUBLE) AS sum_price_ping,
        CAST(SUM(CAST(${Registry.sroundSql(s"l_quantity / ${M2_PER_PING}", 2)} AS DECIMAL(18,2))) AS DOUBLE) AS sum_area_ping,
        CAST(SUM(CASE WHEN l_tax = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_repaired,
        COUNT(*) AS n
      FROM (SELECT l_returnflag, l_tax, l_quantity,
              CASE WHEN l_tax = 0
                   THEN CAST(${Registry.sroundSql("l_extendedprice / nullif(l_quantity, 0.0)", 2)} AS DOUBLE)
                   ELSE l_tax END AS unit_price
            FROM lineitem)
      GROUP BY l_returnflag""")),

    // ---- E7: NULL-preserving regex extraction -----------------------------
    Q("q18_section_extract", (s, dir) => {
      val p = table(s, dir, "part")
      p.withColumn("adjective", regexpExtractNull(col("p_name"), "^(small|red|blue) ", 1))
        .groupBy(col("adjective")).agg(count(lit(1)).as("n"))
    }, Some("""
      SELECT NULLIF(regexp_extract(p_name, '^(small|red|blue) ', 1), '') AS adjective,
        COUNT(*) AS n
      FROM part GROUP BY 1""")),

    // ---- P4: provenance (input_file_name) ---------------------------------
    Q("q19_provenance", (s, dir) => {
      table(s, dir, "nation")
        .withColumn("fname", substring_index(input_file_name(), "/", -1))
        .groupBy(col("fname")).agg(count(lit(1)).as("n"))
    }, Some("SELECT 'nation.parquet' AS fname, COUNT(*) AS n FROM nation GROUP BY 1")),

    // ---- Full building-pipeline golden run --------------------------------
    // Generates the raw dual-header BOM'd CSV contract (FIXTURES.md §A) into
    // a temp dir, runs the complete pipeline (filters, city decode, ROC
    // dates, casts, repair, ping conversion), checks against literal
    // expected rows. The one non-corpus query: its oracle is a VALUES table.
    Q("q20_building_pipeline", (s, _) => {
      val dir = graft.fixtures.RawCsvFixture.writeDefault()
      graft.operators.Pipelines.building(s, dir + "/*_a.csv",
          convertCompletionDate = true)
        .select(col("city"), col("township_dist"), col("position"),
          col("building_area_ping"), col("transaction_date"),
          col("total_price"), col("unit_price_ping"),
          col("completion_date_iso"))
    }, Some(graft.fixtures.RawCsvFixture.expectedBuildingSql)),

    // ---- Full land-pipeline golden run ------------------------------------
    // The reference's second (and larger) dataflow: 土地-only filter, E7
    // section extraction (greedy, NULL on no-match), repair over the LAND
    // area, NULL-propagating casts. Same VALUES-oracle scheme as q20.
    Q("q64_land_pipeline", (s, _) => {
      val dir = graft.fixtures.RawCsvFixture.writeDefault()
      graft.operators.Pipelines.land(s, dir + "/*_a.csv")
        .select(col("city"), col("township_dist"), col("position"),
          col("section"), col("land_area_ping"), col("transaction_date"),
          col("total_price"), col("unit_price_ping"))
    }, Some(graft.fixtures.RawCsvFixture.expectedLandSql)),

    // ---- Warehouse round trip (S5 + A5): write, read back, analyze --------
    // The reference's one real deployment path: load the cleaned table into
    // the warehouse (partitioned city × txn_year), query it later with a
    // filter that partition-prunes (WarehouseSpec asserts the pruned scan for
    // this exact shape), and run the README's avg-price-by-year analytic.
    Q("q65_warehouse_roundtrip", (s, _) => {
      val raw = graft.fixtures.RawCsvFixture.writeDefault()
      // per-invocation dir: a fixed path would race two JVMs running the
      // registry concurrently (one Overwrite deleting files mid-read)
      val wh = java.nio.file.Files
        .createTempDirectory("graft-warehouse-q65").toString + "/wh"
      graft.sources.Warehouse.overwrite(
        graft.operators.Pipelines.building(s, raw + "/*_a.csv"), wh)
      val back = graft.sources.Warehouse.read(s, wh)
        .filter(col("city") === "宜蘭縣" && col("txn_year") >= 2010)
      graft.operators.Pipelines.avgPriceByYear(back, byCity = true)
    }, Some("""
      SELECT * FROM (VALUES
        ('宜蘭縣', CAST(2010 AS INTEGER), CAST(99173.7 AS DOUBLE), CAST(1 AS BIGINT)),
        ('宜蘭縣', CAST(2021 AS INTEGER), CAST(49586.85 AS DOUBLE), CAST(1 AS BIGINT))
      ) AS t(city, txn_year, avg_unit_price_ping, n_txns)"""))
  )
}
