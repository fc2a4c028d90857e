package graft

import org.apache.spark.sql.functions._

/** Partitioned-sink competency: lang-partitioned parquet writes give
  * partition-pruned scans on read (the layout a 100 TB corpus would use).
  */
class SinkSpec extends SparkSuite {

  test("partitionBy(lang) write -> read with lang filter prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.load(spark, sf(), "documents")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("lang") === "de")
    val expected = Tables.load(spark, sf(), "documents")
      .filter(col("lang") === "de").count()
    assert(back.count() == expected)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"expected partition pruning in plan:\n$plan")
    // only the de=... directory is listed once pruning applies
    val scanned = back.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scanned.contains("lang=en") || scanned.contains("lang=de"))
  }
}
