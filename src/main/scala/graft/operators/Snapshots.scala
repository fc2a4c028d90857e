package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot-diff / staleness operators J1 + F5 (SURVEY §2.3-2.4).
  *
  * The reference's health check diffs a previous counter snapshot against
  * the current one per (cluster, topic-partition)
  * (reference: CounterProgressCheck.java:44-66). Batch form: `lag` over a
  * window partitioned by the counter key — one shuffle on the key, then a
  * linear scan per partition; at scale the key space (topic-partitions) is
  * small relative to data, so this stays cheap.
  */
object Snapshots {

  /** J1: per-key delta between consecutive snapshots. */
  def snapshotDelta(df: DataFrame, keyCols: Seq[String],
                    orderCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    df.withColumn("delta",
      col(valueCol) - coalesce(lag(col(valueCol), 1).over(w), lit(0L)))
  }

  /** F5: staleness severity tiers
    * (reference: CounterProgressCheck.java:61-66 — debug < 3 min,
    * info < 4 min, warn otherwise; DOWN at >= 5 min inactivity :80-88).
    */
  def severity(staleSeconds: Column): Column =
    when(staleSeconds < 180, "debug")
      .when(staleSeconds < 240, "info")
      .otherwise("warn")

  def isInactive(lastActivity: Column, now: Column): Column =
    lastActivity < (now - expr("INTERVAL 5 MINUTES"))
}
