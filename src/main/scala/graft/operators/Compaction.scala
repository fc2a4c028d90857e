package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Latest-version compaction — the CDC / versioned-corpus "keep the newest
  * row per key" operator (the batch analogue of Kafka's log compaction,
  * which is the retention model the reference's topics run under —
  * reference: DataGenerator.java:474-503 keys records by id exactly so a
  * compacted topic retains one latest value per key).
  *
  * Formulated as ONE hash aggregation over a greatest-row struct
  * ([[graft.functions.GreatestRow greatest_row]]`(struct(ord...,
  * payload...))` — struct comparison is lexicographic, so the greatest
  * struct IS the row with the greatest (ts, tie) prefix). The partial max
  * runs map-side inside each scan task; the shuffle carries at most one
  * slim struct per (task, key). Two rejected formulations, in order:
  * `row_number() over (partition by key order by ts desc) = 1` sorts
  * every key's full history AND ships every row through the exchange;
  * the built-in `max(struct(...))` keeps the shuffle slim but is not
  * hash-aggregable (struct agg buffers don't fit the fixed-width hash
  * map), so it silently degrades to SortAggregate — every scan partition
  * sorts by key first. greatest_row is a TypedImperativeAggregate, so the
  * plan is ObjectHashAggregate: no window, no sort, no join anywhere
  * (PlanSpec-gated).
  *
  * Tie rule: equal `tsCol` resolves to the greatest `tieCol` (the struct
  * comparison's second field). `(tsCol, tieCol)` must uniquely identify a
  * row within a key — the standard CDC assumption (sequence number /
  * offset as the tie column); payload fields sit AFTER the tie fields in
  * the struct precisely so the comparison never reaches them when that
  * holds (null payloads therefore cannot influence engine-dependent null
  * ordering).
  *
  * The same expression STREAMS: in update mode the max-struct state is
  * one slim struct per key, monotone under the greatest-row order, so
  * out-of-order arrivals can never regress it (StreamingSpec "streaming
  * latest-per-key compaction equals the batch operator"). Production
  * streams should bound the key-space state (watermark + state TTL) as
  * with any streaming aggregation.
  */
object Compaction {

  /** Output: one row per key — `k`, then `last_<c>` for tsCol, tieCol and
    * every payload column. Null keys / null order values are dropped (a
    * versioned record without a version is not a version).
    */
  def latestByKey(df: DataFrame, keyCol: String, tsCol: String,
                  tieCol: String, payloadCols: Seq[String]): DataFrame = {
    val fields = Seq(tsCol, tieCol) ++ payloadCols
    df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(tieCol).isNotNull)
      .groupBy(col(keyCol).as("k"))
      .agg(graft.functions.GreatestRow.greatest_row(
        struct(fields.map(col): _*)).as("m"))
      .select(col("k") +: fields.map(c => col(s"m.$c").as(s"last_$c")): _*)
  }
}
