package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sinks

/** The SchemaRegistry partitioning stance made concrete: staging written
  * partitionBy(etl_load_date) must let a date predicate prune partitions —
  * the scan reads only the selected date's files.
  */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("date predicate on partitioned staging prunes to one partition") {
    val path = Files.createTempDirectory("graft-prune").resolve("t").toString
    val rows = (1 to 300).map(i =>
      (i.toLong, s"v$i", f"2024-06-${i % 3 + 1}%02d"))
      .toDF("id", "v", "etl_load_date")
    Sinks.truncateInsert(rows, path, partitionBy = Seq("etl_load_date"))

    val q = spark.read.parquet(path).filter(col("etl_load_date") === "2024-06-02")
    assert(q.count() === 100L)

    val scan = q.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get
    // Partition filter present; only 1 of 3 date partitions is read.
    assert(scan.partitionFilters.nonEmpty, "no partition filters")
    assert(scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
      .map(_.files.size).sum < 300)
    val selected = scan.relation.location
      .listFiles(scan.partitionFilters, Nil).size
    assert(selected === 1, s"expected 1 partition dir selected, got $selected")
  }
}
