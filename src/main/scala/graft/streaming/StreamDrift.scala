package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Streaming form of the X5e drift report: a per-micro-batch HISTOGRAM
  * JOURNAL. Each batch appends its slim (grp, bucket, c) hashed-unigram
  * delta (≤ groups × numBuckets rows of longs) plus one doc-count row
  * per group; the corpus-wide drift report is
  * [[graft.ext.TextStats.driftFromHistogram]] over the SUMMED journal.
  *
  * Integer histograms fold exactly by addition in any order, so — unlike
  * the sketch journal's bounded-error merge — the journal fold is
  * BIT-IDENTICAL to the batch report over the same rows
  * (StreamingSpec-pinned). No refresh re-scans history; the read side
  * aggregates journal metadata, never documents.
  */
object StreamDrift {

  /** bucket −1 carries the per-(batch, group) doc count — outside the
    * hashed domain [0, numBuckets), so it can never collide with a
    * histogram row.
    */
  val DocCountBucket: Long = -1L

  /** One micro-batch's journal delta (batch form): histogram rows plus
    * the bucket = −1 doc-count rows.
    */
  def histogramDelta(df: DataFrame, textCol: String, groupCol: String,
                     numBuckets: Int): DataFrame = {
    val hist = graft.ext.TextStats.groupBucketHistogram(
      df, textCol, groupCol, numBuckets)
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("c"))
      .select(col("grp"), lit(DocCountBucket).as("bucket"), col("c"))
    hist.unionByName(counts)
  }

  /** Start the journal: per-micro-batch delta rows appended to parquet.
    * Checkpointing is the caller's streaming-app concern.
    */
  def journal(stream: DataFrame, journalDir: String, textCol: String,
              groupCol: String, numBuckets: Int = 1024,
              configure: DataStreamWriter[org.apache.spark.sql.Row] =>
                DataStreamWriter[org.apache.spark.sql.Row] = identity)
    : StreamingQuery = {
    val writer = stream.writeStream
      .trigger(Trigger.ProcessingTime(0))
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          histogramDelta(batch, textCol, groupCol, numBuckets)
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(journalDir)
        }
      }
    configure(writer).start()
  }

  /** Fold-on-read: the drift report from a journal — sum the deltas per
    * (grp, bucket), split out the doc-count rows, and run the SAME KL
    * arithmetic as the batch [[graft.ext.TextStats.sourceDrift]].
    *
    * foreachBatch is at-least-once: a failed-then-retried micro-batch
    * appends its delta rows a second time. (batch_id, grp, bucket) is
    * unique WITHIN a batch and the delta is deterministic in the batch's
    * rows, so the fold first collapses retry copies via first-per-key
    * before summing across batches — the journal read stays exact under
    * any number of replays. Two slim aggregations over metadata-sized
    * rows (≤ batches × groups × buckets), never documents.
    */
  def driftFromJournal(spark: SparkSession, journalDir: String,
                       numBuckets: Int = 1024): DataFrame = {
    val folded = spark.read.parquet(journalDir)
      .groupBy("batch_id", "grp", "bucket").agg(max(col("c")).as("c"))
      .groupBy("grp", "bucket").agg(sum(col("c")).as("c"))
    val nd = folded.filter(col("bucket") === DocCountBucket)
      .select(col("grp"), col("c").as("n_docs"))
    val gh = folded.filter(col("bucket") =!= DocCountBucket)
    graft.ext.TextStats.driftFromHistogram(gh, nd, numBuckets)
  }
}
