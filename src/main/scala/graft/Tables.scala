package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-provided parquet fixtures (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Normalizes `events.ts` to session-TZ TIMESTAMP regardless of the
    * fixture's physical encoding, so every downstream operator can rely on
    * `unix_micros(ts)` / `cast(ts as long)` being well-defined:
    *
    *  - parquet TIMESTAMP(NANOS): Spark 4 rejects it outright
    *    ([PARQUET_TYPE_ILLEGAL]); read nanos as long via the legacy flag and
    *    floor-divide to micros — identical to DuckDB's
    *    `timestamp_ns::timestamp` truncation.
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *    TIMESTAMP_NTZ; cast to TIMESTAMP. Session TZ is pinned UTC
    *    (build.sbt), so the wall-clock reinterpretation is the identity and
    *    matches DuckDB's naive-timestamp reading bit-exactly.
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=true): already TIMESTAMP;
    *    pass through.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    } else df
  }
}
