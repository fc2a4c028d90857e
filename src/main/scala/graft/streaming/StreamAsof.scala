package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stream-static AS-OF join — the streaming consumer of
  * [[graft.operators.AsofJoin]]: an events stream matched to the
  * prevailing static snapshot/quote/config-version at event time (the
  * [[StreamSimilarity]] batch-index / stream-probe split).
  *
  * The static right series compiles ONCE into a validity-INTERVAL
  * index: each (key, ts) right row (deduped to the max-id
  * representative, exactly as the batch operator does) becomes
  * `[matched_t, valid_to)` where `valid_to` is the key's next right
  * timestamp (null for the latest row). "Latest right row at-or-before
  * the event" is then a pure lookup: the event's timestamp falls in
  * exactly ONE interval per key, so the probe is a stream-static
  * LEFT-OUTER join — key equality plus the range predicate — with no
  * streaming state, no watermark, and no dedup pass (at most one match
  * per event by construction; unmatched events surface with null match
  * columns, the batch operator's left-join shape).
  *
  * Scale: the index build is one per-key window over the snapshot
  * series (batch-side, once — at 100 TB a `partitionBy`-bucketed write
  * reused across refreshes, the [[StreamSimilarity.bandedIndex]]
  * policy; persist it, or Spark re-derives the static plan every
  * micro-batch). The per-batch join broadcasts whichever side is
  * small; dimension-sized snapshot series (the common case — configs,
  * quotes-per-symbol) broadcast whole.
  */
object StreamAsof {

  /** Compile the static right series into the validity-interval index:
    * (k, matched_t, matched_id, valid_to) — one row per deduped right
    * observation; intervals partition each key's timeline.
    */
  def intervalIndex(right: DataFrame, keyCol: String, tsCol: String,
                    rightIdCol: String): DataFrame = {
    val rd = right
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol).as("k"), col(tsCol).as("matched_t"))
      .agg(max(col(rightIdCol).cast("long")).as("matched_id"))
    val w = Window.partitionBy("k").orderBy("matched_t")
    rd.withColumn("valid_to", lead(col("matched_t"), 1).over(w))
  }

  /** Probe the index with an event stream (or a batch frame — the plan
    * is identical, which is what the batch/stream equality test holds).
    * Output contract matches [[graft.operators.AsofJoin.asofJoin]]:
    * (lid, k, t, matched_id, matched_t).
    */
  def asofProbe(stream: DataFrame, index: DataFrame, keyCol: String,
                tsCol: String, leftIdCol: String): DataFrame = {
    val l = stream.select(col(leftIdCol).cast("long").as("lid"),
      col(keyCol).as("lk"), col(tsCol).as("t"))
    l.join(index,
        l("lk") === index("k") && l("t") >= index("matched_t") &&
          (index("valid_to").isNull || l("t") < index("valid_to")),
        "left_outer")
      .select(col("lid"), col("lk").as("k"), col("t"),
        col("matched_id"), col("matched_t"))
  }
}
