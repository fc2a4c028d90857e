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

  /** X1b streaming form (r12): first document per NORMALIZED content
    * within the horizon — [[firstPerContent]] keyed on
    * `sha2(Dedup.normalizeText(text))`, so re-cased / re-punctuated /
    * re-spaced replays of a document are dropped at ingest exactly as
    * the batch [[graft.ext.Dedup.normalizedDedup]] would group them.
    * Same state shape: a 256-bit key per horizon document, never the
    * body.
    */
  def firstPerNormalizedContent(docs: DataFrame, textCol: String,
                                tsCol: String,
                                watermark: String = "10 minutes"): DataFrame =
    docs.withColumn("norm_hash",
        sha2(graft.ext.Dedup.normalizeText(col(textCol)), 256))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("norm_hash")

  /** X26c streaming form (r16): first page per CANONICAL URL within
    * the horizon — the C4/RefinedWeb URL-dedup rule at crawl-ingest
    * time. Canonicalization (and the registered domain, carried for
    * downstream domain caps) is the SAME pure expression set as the
    * batch [[graft.ext.Urls]] path — map-only per micro-batch; the
    * keep-first streams via the bounded-state watermark dedup keyed on
    * the canonical string. Batch [[graft.ext.Urls.urlDedup]] keeps the
    * SMALLEST id per canonical URL; the stream keeps the FIRST ARRIVAL
    * inside the horizon — identical when ids follow fetch order (the
    * crawl contract, StreamingSpec-pinned), and the at-the-horizon
    * approximation otherwise (the StreamCurate near-dup note: periodic
    * batch sweeps reconcile across horizons).
    */
  def firstPerCanonicalUrl(docs: DataFrame, urlCol: String, tsCol: String,
                           watermark: String = "10 minutes"): DataFrame =
    docs.withColumn("canonical_url",
        graft.ext.Urls.canonicalUrl(col(urlCol)))
      .withColumn("reg_domain", graft.ext.Urls.registeredDomain(
        graft.ext.Urls.host(col("canonical_url"))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("canonical_url")

  /** The crawl FRONT DOOR as a stream (r18 — x130's container → fetch
    * identity → canonical-URL keep-first → keeper-only extraction, at
    * landing-zone ingest time). Input is a PARSED container stream
    * ([[graft.sources.FileSources.readWarcStream]] → the shared header
    * parse), so batch and stream share one parse/quarantine path;
    * fetch identity comes from the mandatory WARC-Record-ID header
    * exactly like the batch `crawlPages`; the URL keep-first is
    * [[firstPerCanonicalUrl]] (bounded state: one canonical string per
    * horizon page — never a body); and ONLY kept pages pay extraction,
    * which is pure expression work per micro-batch. Batch equivalence
    * is the keep-first contract: identical to `Urls.urlDedup(
    * latestWins = false)` + keeper extraction when fetch ids follow
    * arrival order (the crawl contract — StreamingSpec pins stream ==
    * batch on container drops across micro-batches); across horizons
    * the periodic batch sweep reconciles (the [[firstPerCanonicalUrl]]
    * note).
    */
  def crawlFrontDoor(warc: DataFrame,
                     watermark: String = "10 minutes"): DataFrame = {
    val pages = graft.sources.FileSources.warcDocs(warc)
      .withColumn("fetch_id",
        regexp_extract(col("record_id"), "urn:graft:([0-9]+)", 1)
          .cast("long"))
      .withColumn("ts", to_timestamp(col("warc_date")))
    firstPerCanonicalUrl(pages, "url", "ts", watermark)
      .select(col("fetch_id").as("doc_id"),
        graft.ext.Extract.htmlToText(col("body")).as("text"),
        col("canonical_url"), col("reg_domain"))
  }

  /** Cross-corpus NEAR-dup at ingest (x41's streaming form — the
    * [[StreamSimilarity]] batch-index / stream-probe split): "is this
    * new document a near-duplicate of anything already in the corpus?"
    * answered per micro-batch inside `foreachBatch`.
    *
    * The corpus side is built ONCE —
    * [[graft.ext.Dedup.minhashBandIndex]] (slim (doc_id, band, bucket)
    * rows) plus [[graft.ext.Dedup.shingleFrame]] (exact-verification
    * table); at 100 TB both are one-off partitioned writes reused
    * across corpus refreshes, and persisting them is what makes the
    * per-batch probe |batch|-proportional. The probe itself is
    * [[graft.ext.Dedup.crossDupPairsPrebuilt]] VERBATIM (one code path
    * with the batch refresh operator, so they cannot drift): only the
    * micro-batch is shingled/hashed, candidates come from the banded
    * equi-join, and every emitted pair is exact-Jaccard verified —
    * precision 1, recall identical to the batch form.
    *
    * `foreachBatch` (not a continuous stream-static join) because the
    * candidate dedup + verification join are plain batch ops there —
    * the same reasoning as [[StreamSimilarity.topKPerBatch]].
    */
  def crossDupProbe(batch: DataFrame, oldIndex: DataFrame,
                    oldShingles: DataFrame, textCol: String, idCol: String,
                    k: Int, threshold: Double,
                    bands: Int = 16, rowsPerBand: Int = 4): DataFrame =
    graft.ext.Dedup.crossDupPairsPrebuilt(batch, oldIndex, oldShingles,
      textCol, idCol, k, threshold, bands, rowsPerBand, materialize = false)

  /** X1e streaming twin (r13): per-micro-batch LINE-HISTOGRAM journal —
    * the standing state corpus-wide keep-first line dedup needs at
    * ingest. Each batch appends the slim per-batch histogram
    * (batch_id, lh, n_docs, first_id, first_pos) — 60-bit line hashes,
    * never line text — built by the SAME
    * [[graft.ext.Dedup.lineHistogram]] code path as the batch form.
    * The state folds EXACTLY across batches: a document arrives whole
    * in one batch, so distinct-doc counts add and the global first
    * occurrence is the min of per-batch minima — [[lineStateFold]] +
    * [[graft.ext.Dedup.lineDropsAgainst]] over the folded journal
    * equals the batch [[graft.ext.Dedup.lineDrops]] over the union of
    * batches bit-for-bit (StreamingSpec-pinned). At-least-once replays
    * re-append byte-identical rows and collapse via the
    * (batch_id, lh) dropDuplicates in the fold (the StreamDrift
    * discipline).
    */
  def lineJournal(stream: DataFrame, journalDir: String, idCol: String,
                  linesCol: org.apache.spark.sql.Column,
                  configure: org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =>
                    org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = identity)
    : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.streaming.Trigger
    val writer = stream.writeStream
      .trigger(Trigger.ProcessingTime(0))
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.ext.Dedup.lineHistogram(
              graft.ext.Dedup.lineFrame(batch, idCol, linesCol))
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(journalDir)
        }
      }
    configure(writer).start()
  }

  /** Fold the line journal into the standing per-line state — a
    * journal-sized aggregation over slim rows, never a corpus re-scan.
    * Feed the result to [[graft.ext.Dedup.lineDropsAgainst]] with any
    * document set's [[graft.ext.Dedup.lineFrame]] to get its drop
    * list under the corpus-wide keep-first election.
    */
  def lineStateFold(spark: org.apache.spark.sql.SparkSession,
                    journalDir: String): DataFrame =
    spark.read.parquet(journalDir)
      .dropDuplicates("batch_id", "lh")
      .groupBy("lh")
      .agg(sum(col("n_docs")).as("n_docs"),
        min(struct(col("first_id").as("doc_id"), col("first_pos").as("pos")))
          .as("first"))
      .select(col("lh"), col("n_docs"), col("first.doc_id").as("first_id"),
        col("first.pos").as("first_pos"))

  /** The journal-backed drop list for a document set (the deployment
    * read path: the standing fold + one slim join — the batch and
    * stream forms share [[graft.ext.Dedup.lineDropsAgainst]] verbatim,
    * so they cannot drift).
    */
  def lineDropsFromJournal(spark: org.apache.spark.sql.SparkSession,
                           journalDir: String, docs: DataFrame,
                           idCol: String,
                           linesCol: org.apache.spark.sql.Column,
                           minDocs: Int = 2): DataFrame =
    graft.ext.Dedup.lineDropsAgainst(
      graft.ext.Dedup.lineFrame(docs, idCol, linesCol),
      lineStateFold(spark, journalDir), minDocs)
}
