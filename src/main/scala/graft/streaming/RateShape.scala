package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S1: the reference's square-wave producer rate
  * (reference: DataGenerator.java:459 — `rate = 100*((nowMs/10000)%5)+10`,
  * i.e. 10/110/210/310/410 rec/s with 10 s steps, 50 s period; pacing
  * :528-534).
  *
  * Spark mapping (SURVEY §4.3): built-in `rate` / `rate-micro-batch`
  * source at the peak rate (410 r/s) + a deterministic admission filter —
  * zero custom-source surface, fully codegen'd, and the same waveform
  * *shape* with a virtual clock (reproduce shape, not wall phase —
  * SURVEY §7.3).
  */
object RateShape {

  val peakRate: Long = 410L

  /** Target rate for a given epoch second (the reference formula with
    * seconds in place of wall millis).
    */
  def rateFor(epochSec: Column): Column =
    lit(100) * pmod(floor(epochSec / 10), lit(5)) + 10

  /** Admission predicate: with a constant-rate source emitting `peak`
    * rows/sec carrying (timestamp, value), admit `value % peak <
    * rateFor(sec)` rows of each second — a square wave with exactly the
    * reference's duty cycle. `value` is the rate source's monotonically
    * increasing row id.
    */
  def admit(tsCol: Column, valueCol: Column, peak: Long = peakRate): Column = {
    requirePeak(peak)
    pmod(valueCol, lit(peak)) < rateFor(unix_timestamp(tsCol))
  }

  /** The source rate is the admission modulus: below the 410 r/s waveform
    * peak the upper square-wave steps would silently clip to the source
    * rate, distorting the reference 10/110/210/310/410 shape.
    */
  private def requirePeak(peak: Long): Unit =
    require(peak >= peakRate,
      s"rate-source peak must be >= $peakRate rows/s (the waveform's top " +
        s"step); got $peak — steps above the source rate would clip")

  /** Apply the admission filter to a rate-source stream with columns
    * (timestamp, value).
    */
  def shape(rateStream: DataFrame, peak: Long = peakRate): DataFrame = {
    requirePeak(peak)
    rateStream.filter(admit(col("timestamp"), col("value"), peak))
  }

  /** Batch form for tests/oracles: a virtual-time clock of `seconds`
    * seconds at `peak` rows/s, admitted by the same predicate. Proves the
    * waveform deterministically (no wall clock).
    */
  def virtualWave(spark: org.apache.spark.sql.SparkSession, seconds: Int,
                  peak: Long = peakRate): DataFrame = {
    requirePeak(peak)
    val n = seconds * peak
    spark.range(n)
      .withColumn("sec", floor(col("id") / peak))
      .withColumn("slot", pmod(col("id"), lit(peak)))
      .filter(col("slot") < rateFor(col("sec")))
  }
}
