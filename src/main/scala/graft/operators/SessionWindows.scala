package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-based sessionization through Spark's NATIVE `session_window`
  * aggregation — the engine's second sessionize form, complementing
  * x13's lag+cumsum window formulation: the native form is the one
  * that also runs STREAMING (session state merges across micro-batches
  * under a watermark; the lag form cannot stream — `lag` needs the
  * whole history ordered). Batch and stream share this exact groupBy,
  * which is what the StreamingSpec equality test holds.
  *
  * Merge semantics (verified against Spark's implementation in
  * OperatorsSpec, and what the DuckDB oracle reproduces): an event
  * extends its predecessor's session iff `t - prev_t <= gap` — the
  * session window is the CLOSED [t, t + gap], so a successor exactly
  * `gap` later still MERGES; session end = last event + gap.
  *
  * Scale: a hash aggregation keyed by (key, merged window) — one
  * shuffle of slim rows; per-key state in streaming is one entry per
  * OPEN session inside the watermark horizon, not per event.
  */
object SessionWindows {

  /** Output: (k, sess_start_us, sess_end_us, n_events) — one row per
    * merged session. Works on batch and streaming frames alike (add a
    * watermark upstream for streaming append mode).
    */
  def sessionCounts(df: DataFrame, keyCol: String, tsCol: String,
                    gap: String = "30 minutes"): DataFrame =
    df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(session_window(col(tsCol), gap).as("sw"), col(keyCol).as("k"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("k"), unix_micros(col("sw.start")).as("sess_start_us"),
        unix_micros(col("sw.end")).as("sess_end_us"), col("n_events"))

  /** Skew-salted twin — identical output contract, for the hot-key
    * regime (the session merge sorts each key's rows inside one task;
    * a key holding half the corpus is a straggler). Two levels:
    *
    *  1. per-(key, TIME-BIN) sessions: the same `session_window`
    *     aggregation with the bin in the grouping key, so the hot
    *     key's per-ROW work (the expensive part) spreads across bins;
    *  2. chain-merge at SUMMARY granularity: per key, bin-local
    *     sessions sorted by start merge iff `start <= prev_end`
    *     (prev_end = prev's last event + gap, so this is exactly the
    *     closed-interval merge rule the row level uses — pinned by the
    *     boundary test). One running-chain window per key over SESSION
    *     SUMMARIES — rows ∝ sessions, not events.
    *
    * Exact for any session shape (a session spanning many bins is a
    * chain of bin-local sessions, each touching the next). The summary
    * window is per-key, so the salt bounds the per-ROW pass but not a
    * pathological key with MILLIONS of isolated sessions — the
    * realistic hot key (flash crowd) is dense activity = FEW merged
    * sessions, which is precisely when the summary pass is tiny.
    * `gapUs` is numeric here (the merge rule needs micros arithmetic).
    */
  def sessionCountsSalted(df: DataFrame, keyCol: String, tsCol: String,
                          gapUs: Long = 1800L * 1000000L,
                          binWidthUs: Long = 6L * 3600L * 1000000L): DataFrame = {
    require(gapUs > 0, s"gapUs must be positive (got $gapUs)")
    require(binWidthUs > 0, s"binWidthUs must be positive (got $binWidthUs)")
    import org.apache.spark.sql.expressions.Window
    val us = unix_micros(col(tsCol))
    val perBin = df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("bin", us - pmod(us, lit(binWidthUs)))
      .groupBy(session_window(col(tsCol), s"$gapUs microseconds").as("sw"),
        col(keyCol).as("k"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("k"), unix_micros(col("sw.start")).as("s_us"),
        unix_micros(col("sw.end")).as("e_us"), col("n"))
    // summary-level chain merge: starts are strictly increasing per key
    // (same-bin sessions are disjoint, cross-bin events are bin-ordered)
    // and ends are monotone with them, so one lag suffices
    val w = Window.partitionBy("k").orderBy("s_us")
    perBin
      .withColumn("new_chain",
        when(col("s_us") > lag(col("e_us"), 1).over(w) ||
          lag(col("e_us"), 1).over(w).isNull, 1).otherwise(0))
      .withColumn("chain", sum(col("new_chain"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("k", "chain")
      .agg(min(col("s_us")).as("sess_start_us"),
        max(col("e_us")).as("sess_end_us"),
        sum(col("n")).as("n_events"))
      .select(col("k"), col("sess_start_us"), col("sess_end_us"),
        col("n_events"))
  }
}
