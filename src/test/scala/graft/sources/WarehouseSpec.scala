package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.fixtures.RawCsvFixture
import graft.operators.Pipelines

/** S5–S7 semantics + the scale property that matters: partition pruning.
  * The warehouse layout (city × txn_year) exists so A5-style analytics
  * read only the partitions they name — at 100 TB that's the difference
  * between a metadata lookup and a full scan. */
class WarehouseSpec extends SparkSpec {

  private lazy val rawDir = RawCsvFixture.write(
    Files.createTempDirectory("graft-wh-raw")).toString
  private lazy val whDir =
    Files.createTempDirectory("graft-wh").toString + "/building"

  private def load(): Unit =
    Warehouse.overwrite(Pipelines.building(spark, rawDir + "/*_a.csv"), whDir)

  test("overwrite + append dispositions") {
    load()
    val n1 = Warehouse.read(spark, whDir).count()
    assert(n1 === 4L)
    Warehouse.append(Pipelines.building(spark, rawDir + "/*_a.csv"), whDir)
    assert(Warehouse.read(spark, whDir).count() === 2 * n1)
    load() // overwrite resets
    assert(Warehouse.read(spark, whDir).count() === n1)
  }

  test("city/year filters prune partitions (scan reads only named partitions)") {
    load()
    val pruned = Warehouse.read(spark, whDir)
      .filter(col("city") === "宜蘭縣" && col("txn_year") === 2021)
    val plan = pruned.queryExecution.executedPlan
    // partition filters must appear as PartitionFilters on the scan, not
    // post-scan Filter over data columns
    assert(plan.toString.contains("PartitionFilters") &&
      plan.toString.contains("isnotnull(city"),
      s"expected partition filters in:\n$plan")
    assert(pruned.count() === 1L)
    // and the scan must actually select exactly the one named partition
    val scans = plan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val selected = scans.head.selectedPartitions
    assert(selected.partitionCount === 1, selected.toString)
  }

  test("q65 round-trip read shape prunes partitions before the analytic") {
    // the exact filter q65_warehouse_roundtrip applies after its write: the
    // scan must select only the two 宜蘭縣 partitions with txn_year >= 2010,
    // not read the warehouse and filter rows
    load()
    val back = Warehouse.read(spark, whDir)
      .filter(col("city") === "宜蘭縣" && col("txn_year") >= 2010)
    val scans = back.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.selectedPartitions.partitionCount === 2,
      scans.head.selectedPartitions.toString) // 宜蘭縣×2010 and 宜蘭縣×2021 only
    // and the analytic over the pruned read returns the q65 oracle rows
    val agg = Pipelines.avgPriceByYear(back, byCity = true)
      .orderBy(col("txn_year")).collect()
    assert(agg.map(r => (r.getAs[Int]("txn_year"),
      r.getAs[Double]("avg_unit_price_ping"), r.getAs[Long]("n_txns"))).toSeq ===
      Seq((2010, 99173.7, 1L), (2021, 49586.85, 1L)))
  }

  test("column projection reaches the parquet scan (ReadSchema pruning)") {
    load()
    val df = Warehouse.read(spark, whDir).select("total_price")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<total_price:bigint>"), scan)
  }
}
