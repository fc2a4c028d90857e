package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key trailing time-range (rolling) aggregates — "each event with
  * its key's activity over the preceding hour": count / sum / mean over
  * the inclusive window [t - widthUs, t], one output row per input row.
  * The telemetry primitive behind rate and burst monitors (the
  * reference's counter-progress checks are the degenerate
  * whole-history form of this).
  *
  * Plan: ONE per-key window with a RANGE frame — a single hash
  * exchange on the key plus an in-partition sort; Spark evaluates the
  * sliding frame with a two-pointer bound walk, never a rescan per
  * row, so per-key cost is O(rows) regardless of width. Equal
  * timestamps are RANGE-frame peers and aggregate together in both
  * engines (SQL-standard). Skew: the hot-key caveat and remedy are
  * the same as AsofJoin's (salt by coarse time bin; a trailing window
  * additionally needs the previous bin's tail, width permitting).
  *
  * Money arithmetic rides INTEGER cents: a double sum's value depends
  * on accumulation order, which a distributed aggregation does not fix
  * — summing `round(value * 100)::long` is exact, order-independent,
  * and engine-portable; the mean is derived from the integer sum by
  * one division at the end.
  */
object Rolling {

  /** Output: (id, k, t_us, roll_cnt, roll_sum_cents, roll_avg). */
  def rollingStats(df: DataFrame, keyCol: String, tsCol: String,
                   idCol: String, valueCol: String,
                   widthUs: Long = 3600L * 1000000L): DataFrame = {
    require(widthUs >= 0, s"widthUs must be >= 0 (got $widthUs)")
    val base = df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(keyCol).as("k"),
        unix_micros(col(tsCol)).as("t_us"),
        round(col(valueCol) * 100).cast("long").as("cents"))
    val w = Window.partitionBy("k").orderBy("t_us")
      .rangeBetween(-widthUs, 0)
    base.select(col("id"), col("k"), col("t_us"),
      count(lit(1)).over(w).as("roll_cnt"),
      sum(col("cents")).over(w).as("roll_sum_cents"),
      round(sum(col("cents")).over(w).cast("double") / 100.0 /
        count(lit(1)).over(w), 6).as("roll_avg"))
  }
}
