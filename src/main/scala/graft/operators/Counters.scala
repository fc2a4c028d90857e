package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation operators A1-A7 (SURVEY §2.5), batch form.
  *
  * All are plain hash aggregations: Spark does map-side partial
  * aggregation automatically, so at 100 TB each of these is one shuffle
  * of (group-key, partial-state) — the minimal possible data movement.
  */
object Counters {

  /** A1: running count per key — the reference's
    * `recordsProduced/Consumed` counter tables
    * (reference: DataGenerator.java:548-551).
    */
  def countPerKey(df: DataFrame, keys: String*): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))

  /** A2: group-by type with collected member list
    * (reference: DataGenerator.java:256-258). The list is sorted so the
    * result is deterministic (collection order is not semantic).
    */
  def collectPerType(df: DataFrame, typeCol: String, memberCol: String): DataFrame =
    df.groupBy(col(typeCol))
      .agg(sort_array(collect_set(col(memberCol))).as("members"))

  /** A3/A4/A5: global sum + min/max instants + predicated count
    * (reference: CounterProgressCheck.java:82-111).
    */
  def counterStats(df: DataFrame, valueCol: Column, tsCol: Column,
                   stalePredicate: Column): DataFrame =
    df.agg(
      sum(valueCol).as("total"),
      min(tsCol).as("earliest"),
      max(tsCol).as("latest"),
      count(when(stalePredicate, 1)).as("inactive"),
      count(lit(1)).as("n"))

  /** A1 under skew: two-phase salted aggregation. Phase 1 aggregates on
    * (key, salt) — hot keys split across `salt` reducers — phase 2 merges
    * the partials. Same result as `countPerKey`; use when a counter key
    * (one topic-partition) receives a disproportionate share of records.
    */
  def countPerKeySalted(df: DataFrame, salt: Int, keys: String*): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
    salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as("cnt"))
  }

  /** A7: zero-fill — cross product of two small dimensions with count 0
    * (reference: DataGenerator.java:225-235). Dims are tiny: Spark plans
    * this as a broadcast nested-loop join, no shuffle.
    */
  def zeroFill(topics: DataFrame, partitions: DataFrame): DataFrame =
    topics.crossJoin(partitions).withColumn("cnt", lit(0L))
}
