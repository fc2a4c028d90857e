package graft

import graft.gen.RecordGen
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the reference's full producer->consumer loop as one batch
    * plan — generate records (SURVEY §2.1 S2/S3), encode to wire JSON
    * (P1/P2/P5), parse back (§1.6), count per (topic, partition) (A1).
    * Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val wire = RecordGen.toWire(RecordGen.records(spark, n = 5000L, numPartitions = 4))
    RecordGen.parseWire(wire)
      .groupBy("topic", "partition")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("topic", "partition")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Declared.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = graft.queries.Declared.oracleSql
}
