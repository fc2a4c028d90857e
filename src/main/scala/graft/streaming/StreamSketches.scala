package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.functions.FreqSketch

/** Streaming sketch maintenance (the X17 family's streaming form): a
  * per-micro-batch SKETCH JOURNAL. Each batch contributes one row of
  * kilobyte sketch blobs (HLL distinct state, KLL quantile state,
  * Theta set state, frequent-items state) appended to a parquet
  * journal; corpus-wide answers are the `*_union_agg` fold over the
  * journal. No refresh ever re-scans history — the associativity /
  * bound-preservation the batch suite pins (x57/x58/x59/x60) is
  * exactly what makes the fold order irrelevant here.
  *
  * Scale design: the journal is cluster METADATA, not data — one row
  * of ~KB blobs per (batch, source), partitionable by day at 100 TB;
  * the read-side fold aggregates a few thousand blobs regardless of
  * corpus size. Contrast with `StreamCounters`' exact running counts
  * (bounded key domain) — sketches are the unbounded-domain form
  * (distinct ids, quantiles over values, heavy-hitter terms).
  */
object StreamSketches {

  /** Per-batch sketch delta of `df` (batch form — one row):
    * (n_rows, hll distinct-id state, kll value-quantile state, theta
    * id-set state, freq item state).
    */
  def sketchDelta(df: DataFrame, idCol: String, valueCol: String,
                  itemCol: String, lgK: Int = 12, kllK: Int = 200,
                  maxMapSize: Int = 1024): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      hll_sketch_agg(col(idCol), lit(lgK)).as("hll"),
      kll_sketch_agg_double(col(valueCol).cast("double"), kllK).as("kll"),
      theta_sketch_agg(col(idCol), lgK + 2).as("theta"),
      FreqSketch.freq_sketch_agg(col(itemCol), maxMapSize).as("freq"))

  /** Start the journal: one appended row of sketch blobs per
    * micro-batch. `trigger` defaults to processing-time 0 (as fast as
    * batches arrive); checkpointing is the caller's streaming-app
    * concern, passed through untouched.
    */
  def journal(stream: DataFrame, journalDir: String, idCol: String,
              valueCol: String, itemCol: String,
              configure: DataStreamWriter[org.apache.spark.sql.Row] =>
                DataStreamWriter[org.apache.spark.sql.Row] = identity)
    : StreamingQuery = {
    val writer = stream.writeStream
      .trigger(Trigger.ProcessingTime(0))
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          sketchDelta(batch, idCol, valueCol, itemCol)
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(journalDir)
        }
      }
    configure(writer).start()
  }

  /** Fold the journal into corpus-wide answers: distinct-id estimate,
    * value quantile at `q`, theta id-set blob (for set algebra against
    * other journals), frequent-items blob, and the exact row total.
    * One job over rows-of-blobs — never over data.
    */
  def fold(spark: SparkSession, journalDir: String, q: Double = 0.5,
           maxMapSize: Int = 1024): DataFrame =
    spark.read.parquet(journalDir).agg(
      sum(col("n_rows")).as("n_rows"),
      hll_sketch_estimate(hll_union_agg(col("hll"), lit(false)))
        .as("distinct_ids"),
      kll_sketch_get_quantile_double(
        kll_merge_agg_double(col("kll")), lit(q)).as("value_quantile"),
      theta_union_agg(col("theta"), 14).as("theta"),
      FreqSketch.freq_merge_agg(col("freq"), maxMapSize).as("freq"))

  /** X5h streaming twin (r11): per-micro-batch VOCABULARY-GROWTH
    * journal — the incremental form of [[graft.ext.TextStats.vocabGrowth]]'s
    * Heaps curve that x82's docstring documents (exact distinct counts
    * per checkpoint need the batch pass; a stream maintains the curve
    * as mergeable HLL states instead, with exact token mass riding
    * alongside). One row per batch: (batch_id, hll term state, exact
    * token count, hll doc state).
    */
  def vocabJournal(stream: DataFrame, journalDir: String,
                   textCol: String, idCol: String, lgK: Int = 12,
                   configure: DataStreamWriter[org.apache.spark.sql.Row] =>
                     DataStreamWriter[org.apache.spark.sql.Row] = identity)
    : StreamingQuery = {
    val writer = stream.writeStream
      .trigger(Trigger.ProcessingTime(0))
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          batch.select(col(idCol).as("_id"),
              explode(graft.ext.Dedup.tokens(
                coalesce(col(textCol), lit("")))).as("term"))
            .agg(hll_sketch_agg(col("term"), lit(lgK)).as("hll_terms"),
              count(lit(1)).as("n_tokens"),
              hll_sketch_agg(col("_id"), lit(lgK)).as("hll_docs"))
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(journalDir)
        }
      }
    configure(writer).start()
  }

  /** The growth curve read off the journal: one row per batch prefix
    * (k = batch_id), folding every row with batch_id <= k — a
    * journal-sized self-join over kilobyte blobs, never a corpus
    * re-scan. At-least-once retry copies (byte-identical rows re-
    * appended for the same batch) collapse via the per-batch
    * dropDuplicates before the fold (the StreamDrift discipline).
    */
  def vocabCurveFromJournal(spark: SparkSession, journalDir: String): DataFrame = {
    val j = spark.read.parquet(journalDir).dropDuplicates("batch_id")
    j.select(col("batch_id").as("k")).as("a")
      .join(j.as("b"), col("b.batch_id") <= col("a.k"))
      .groupBy(col("k"))
      .agg(hll_sketch_estimate(hll_union_agg(col("b.hll_terms"), lit(false)))
          .as("vocab_est"),
        sum(col("b.n_tokens")).as("n_tokens"),
        hll_sketch_estimate(hll_union_agg(col("b.hll_docs"), lit(false)))
          .as("docs_est"))
      .orderBy("k")
  }
}
