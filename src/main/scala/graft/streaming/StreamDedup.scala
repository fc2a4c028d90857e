package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication (SURVEY §7.3 "ack-exact counters"): Spark's
  * Kafka sink is at-least-once per micro-batch, so replayed records
  * inflate downstream counters vs. the reference's ack-exact semantics
  * (`DataGenerator.java:513` counts broker acks). The consumer side
  * restores exactness by dropping replays on the record identity
  * `(topic, partition, offset)`.
  *
  * Scale design: `dropDuplicatesWithinWatermark` keeps dedup state ONLY
  * inside the watermark horizon — memory is O(records per horizon), not
  * O(stream history), and the state store is hash-partitioned on the
  * dedup key across executors. Replays in Kafka land within seconds of
  * the original, so a minutes-scale horizon is safe.
  */
object StreamDedup {

  /** Exactly-once record stream from an at-least-once transport. */
  def exactlyOnce(records: DataFrame, tsCol: String = "timestamp",
                  watermark: String = "10 minutes"): DataFrame =
    records.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("topic", "partition", "offset")

  /** Streaming exact content-dedup (X1's streaming form): first document
    * per content hash within the watermark horizon survives. The state
    * key is the 256-bit hash, never the document body.
    */
  def firstPerContent(docs: DataFrame, textCol: String, tsCol: String,
                      watermark: String = "10 minutes"): DataFrame =
    docs.withColumn("content_hash", sha2(col(textCol), 256))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
