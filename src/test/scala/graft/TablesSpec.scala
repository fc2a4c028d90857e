package graft

import java.io.File
import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the loader's `events.ts` normalization across every physical parquet
  * encoding the driver has shipped so far (r1-r7: timestamp[ns]; r8+:
  * timestamp[us] isAdjustedToUTC=false → TIMESTAMP_NTZ) plus the plain
  * session-TZ case. A fixture regeneration that changes the physical type
  * must NOT change the loaded Spark type — 11 time-series queries broke in
  * r8 because it silently did (VERDICT.md r8 item 1).
  */
class TablesSpec extends SparkSuite {

  private def tmpDir(): File = {
    val d = Files.createTempDirectory("graft-tables").toFile
    d.deleteOnExit(); d
  }

  test("loader normalizes events.ts to TimestampType for the live fixtures at every SF") {
    for (d <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val df = Tables.load(spark, sf(d), "events")
      assert(df.schema("ts").dataType == TimestampType, s"$d: ${df.schema("ts").dataType}")
      // unix_micros must analyze AND evaluate — this is exactly what broke in r8.
      val r = df.filter(col("ts").isNotNull)
        .select(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head
      assert(!r.isNullAt(0) && r.getLong(0) <= r.getLong(1))
    }
  }

  test("loader handles a TIMESTAMP_NTZ (us, isAdjustedToUTC=false) encoding") {
    import spark.implicits._
    val dir = new File(tmpDir(), "ntz")
    // Writing a TIMESTAMP_NTZ column produces parquet TIMESTAMP(MICROS,
    // isAdjustedToUTC=false) — the exact r8 fixture encoding.
    Seq((1L, "2024-03-01T10:15:30"), (2L, "2024-03-02T00:00:00"))
      .toDF("event_id", "s")
      .select($"event_id", $"s".cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(new File(dir, "events.parquet").getPath)
    val df = Tables.load(spark, dir.getPath, "events")
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.orderBy("event_id").select("ts").as[Timestamp].collect()
    // Session TZ is UTC, so NTZ wall-clock == UTC instant.
    assert(got(0) == Timestamp.valueOf("2024-03-01 10:15:30"))
    assert(got(1) == Timestamp.valueOf("2024-03-02 00:00:00"))
  }

  test("loader handles a nanos-as-long encoding (r1-r7 fixtures)") {
    import spark.implicits._
    val dir = new File(tmpDir(), "ns")
    // Simulate the legacy-flag read result: loader sees LongType nanos.
    Seq((1L, 1709288130123456789L), (2L, 1709337600000000000L))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(new File(dir, "events.parquet").getPath)
    val df = Tables.load(spark, dir.getPath, "events")
    assert(df.schema("ts").dataType == TimestampType)
    val micros = df.orderBy("event_id").select(unix_micros($"ts")).as[Long].collect()
    assert(micros(0) == 1709288130123456L) // floor-truncated, DuckDB-identical
    assert(micros(1) == 1709337600000000L)
  }

  test("loader passes through a session-TZ TIMESTAMP encoding unchanged") {
    import spark.implicits._
    val dir = new File(tmpDir(), "ltz")
    Seq((1L, Timestamp.valueOf("2024-03-01 10:15:30")))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(new File(dir, "events.parquet").getPath)
    val df = Tables.load(spark, dir.getPath, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select("ts").as[Timestamp].head == Timestamp.valueOf("2024-03-01 10:15:30"))
  }
}
