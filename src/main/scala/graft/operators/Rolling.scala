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
    val base = prepared(df, keyCol, tsCol, idCol, valueCol, widthUs)
    val w = Window.partitionBy("k").orderBy("t_us")
      .rangeBetween(-widthUs, 0)
    rollOver(base, w)
  }

  /** Skew-salted twin — identical output contract, for the hot-key
    * regime (one key holding most rows makes the per-key window a
    * single straggler task). The window partition key becomes
    * (key, time-bin) with `binWidthUs >= widthUs`; the boundary stitch
    * is a CONTEXT COPY: every row within `widthUs` of its bin's end is
    * duplicated into the NEXT bin as a non-emitting context row, so a
    * row early in a bin still sees its full trailing frame. Exact by
    * construction (a frame spans at most two bins when bin >= width);
    * context volume is <= one width-worth of rows per (key, bin) —
    * the replicate-small/spread-big trade, same family as
    * [[graft.operators.RangeJoin.intervalJoinSalted]]. Emitted rows
    * are the `own` copies only.
    */
  def rollingStatsSalted(df: DataFrame, keyCol: String, tsCol: String,
                         idCol: String, valueCol: String,
                         widthUs: Long = 3600L * 1000000L,
                         binWidthUs: Long = 6L * 3600L * 1000000L): DataFrame = {
    require(binWidthUs >= widthUs,
      s"binWidthUs ($binWidthUs) must be >= widthUs ($widthUs): a " +
        "trailing frame may span at most two bins")
    val base = prepared(df, keyCol, tsCol, idCol, valueCol, widthUs)
    def binOf(t: org.apache.spark.sql.Column) = t - pmod(t, lit(binWidthUs))
    val own = base.withColumn("bin", binOf(col("t_us")))
      .withColumn("own", lit(true))
    val context = base
      .filter(pmod(col("t_us"), lit(binWidthUs)) >= binWidthUs - widthUs)
      .withColumn("bin", binOf(col("t_us")) + binWidthUs)
      .withColumn("own", lit(false))
    val w = Window.partitionBy("k", "bin").orderBy("t_us")
      .rangeBetween(-widthUs, 0)
    rollOver(own.unionByName(context), w).filter(col("own"))
      .drop("bin", "own")
  }

  private def prepared(df: DataFrame, keyCol: String, tsCol: String,
                       idCol: String, valueCol: String,
                       widthUs: Long): DataFrame = {
    require(widthUs >= 0, s"widthUs must be >= 0 (got $widthUs)")
    df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(keyCol).as("k"),
        unix_micros(col(tsCol)).as("t_us"),
        round(col(valueCol) * 100).cast("long").as("cents"))
  }

  /** One shared aggregate body for both window shapes — the plain and
    * salted forms cannot drift.
    */
  private def rollOver(base: DataFrame,
                       w: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
    base.withColumn("roll_cnt", count(lit(1)).over(w))
      .withColumn("roll_sum_cents", sum(col("cents")).over(w))
      .withColumn("roll_avg",
        round(sum(col("cents")).over(w).cast("double") / 100.0 /
          count(lit(1)).over(w), 6))
      .drop("cents")
}
