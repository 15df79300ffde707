package graft

import java.nio.file.Files

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Hive-style partitioned layout: a date-keyed filter must prune
  * directories at planning time (PartitionFilters), not scan-and-drop.
  * The testdata tables are single files, so this writes a partitioned
  * copy the way a 100 TB events table would actually be laid out. */
class PartitionPruningSpec extends SparkSpec {

  test("date-partitioned events: filter prunes partitions in the plan") {
    val events = Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")))
    val dir = Files.createTempDirectory("graft-part").toString
    events.write.mode("overwrite").partitionBy("day").parquet(dir)

    val nDays = events.select("day").distinct().count()
    assert(nDays > 1, "fixture needs multiple days to prove pruning")

    val oneDay = events.select(max("day")).head().getDate(0)
    val pruned = spark.read.parquet(dir).filter(col("day") === lit(oneDay))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"no partition filter in plan:\n$plan")
    // count matches the unpartitioned filter — pruning lost no rows
    assert(pruned.count() ==
      events.filter(col("day") === lit(oneDay)).count())
    // and the scan touches only the one matching directory
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .head.asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
      .selectedPartitions.partitionCount
    assert(scanned == 1, s"expected 1 partition, scanned $scanned")
  }
}
