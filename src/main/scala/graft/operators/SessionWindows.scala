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
}
