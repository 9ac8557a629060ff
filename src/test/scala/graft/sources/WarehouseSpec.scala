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

  test("column projection reaches the parquet scan (ReadSchema pruning)") {
    load()
    val df = Warehouse.read(spark, whDir).select("total_price")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<total_price:bigint>"), scan)
  }
}
