package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Streaming form of the X5g PMI collocation report: a per-micro-batch
  * COUNT JOURNAL (the [[StreamDrift]] pattern applied to the
  * unigram+bigram count streams). Each batch appends its slim
  * (kind, ka, kb, c) gram-count delta — integer counts fold EXACTLY by
  * addition in any order, so the journal's fold-on-read reconstructs
  * the same count frames a batch pass would compute over the union of
  * batches, and [[graft.ext.TextStats.pmiFromCounts]] (the ONE shared
  * arithmetic core) then yields a report BIT-IDENTICAL to the batch
  * [[graft.ext.TextStats.pmiCollocations]] over the same rows
  * (StreamingSpec-pinned, retry included).
  *
  * This is the incremental-corpus-analytics deployment shape: ingest
  * journals cheap deltas per micro-batch; the dashboard report
  * aggregates journal metadata (≤ batches × vocabulary slim rows),
  * never documents.
  */
object StreamCollocations {

  /** One micro-batch's count delta (batch form): kind 'u' rows carry
    * (term, null, c) unigram counts; kind 'b' rows carry (a, b, c)
    * bigram counts.
    */
  def countsDelta(df: DataFrame, textCol: String): DataFrame = {
    val base = df.select(
      graft.ext.Dedup.tokens(coalesce(col(textCol), lit(""))).as("w"))
    graft.ext.TextStats.unigramCounts(base)
      .select(lit("u").as("kind"), col("t").as("ka"),
        lit(null).cast("string").as("kb"), col("cu").as("c"))
      .unionByName(graft.ext.TextStats.bigramCounts(base)
        .select(lit("b").as("kind"), col("a").as("ka"),
          col("b").as("kb"), col("cb").as("c")))
  }

  /** Start the journal: per-micro-batch delta rows appended to parquet.
    * Checkpointing is the caller's streaming-app concern.
    */
  def journal(stream: DataFrame, journalDir: String, textCol: String,
              configure: DataStreamWriter[org.apache.spark.sql.Row] =>
                DataStreamWriter[org.apache.spark.sql.Row] = identity)
    : StreamingQuery = {
    val writer = stream.writeStream
      .trigger(Trigger.ProcessingTime(0))
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          countsDelta(batch, textCol)
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(journalDir)
        }
      }
    configure(writer).start()
  }

  /** Fold-on-read: the PMI report from a journal. foreachBatch is
    * at-least-once, so retry copies collapse first-per
    * (batch_id, kind, ka, kb) before summing across batches (the
    * [[StreamDrift.driftFromJournal]] discipline — the delta is
    * deterministic in the batch's rows, so max == the single true
    * value), then the batch arithmetic core runs over the folded
    * counts.
    */
  def pmiFromJournal(spark: SparkSession, journalDir: String,
                     minCount: Long, k: Int): DataFrame = {
    val folded = spark.read.parquet(journalDir)
      .groupBy("batch_id", "kind", "ka", "kb").agg(max(col("c")).as("c"))
      .groupBy("kind", "ka", "kb").agg(sum(col("c")).as("c"))
    graft.ext.TextStats.pmiFromCounts(
      folded.filter(col("kind") === "u")
        .select(col("ka").as("t"), col("c").as("cu")),
      folded.filter(col("kind") === "b")
        .select(col("ka").as("a"), col("kb").as("b"), col("c").as("cb")),
      minCount, k)
  }
}
