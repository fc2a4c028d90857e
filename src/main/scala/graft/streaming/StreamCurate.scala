package graft.streaming

import graft.ext.Curation
import org.apache.spark.sql.DataFrame

/** Streaming curation (the x25 pipeline's streaming form): the SAME gate
  * sequence as the batch path — [[Curation.standardGates]] is shared, so
  * the two cannot drift — followed by streaming exact content dedup.
  *
  * What is and is not streamable, by construction:
  *  - the hash sample / language / quality / repetition gates are pure
  *    column expressions: identical semantics batch vs. stream, map-only
  *    per micro-batch, no state.
  *  - exact content dedup streams via `dropDuplicatesWithinWatermark`
  *    keyed on the 256-bit content hash — state bounded by the horizon.
  *  - NEAR-dup cluster resolution (x23) is a batch/global computation
  *    (connected components over the full pair graph); a stream can at
  *    best approximate it within a window. The intended deployment is
  *    this stream for ingest-time gating + a periodic batch x25/x30 pass
  *    for near-dup sweeps.
  */
object StreamCurate {

  /** Gate + dedup a streaming documents frame. `tsCol` must be a
    * timestamp column (event time) for the dedup watermark.
    */
  def curate(docs: DataFrame, tsCol: String,
             idCol: String = "doc_id", textCol: String = "text",
             sampleThr: String = "c0",
             watermark: String = "10 minutes"): DataFrame =
    StreamDedup.firstPerContent(
      Curation.standardGates(docs, idCol, textCol, sampleThr),
      textCol, tsCol, watermark)

  /** Batch-train / stream-apply temperature mixing: `rates` is the
    * (group, thr) frame from [[Curation.temperatureRates]] computed on a
    * batch corpus snapshot; applying it to the stream is a broadcast
    * join + the deterministic 4-hex md5 gate — map-only per micro-batch,
    * stateless, and the kept set for any given rates table is exactly
    * what the batch [[Curation.temperatureSample]] would keep.
    */
  def applyTemperature(docs: DataFrame, rates: DataFrame,
                       groupCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    docs.join(broadcast(rates.select(col(groupCol), col("thr"))), Seq(groupCol))
      // salt must match Curation.temperatureSample exactly (batch/stream
      // kept-set equality) — "graft-temp", salt-separated from the
      // sample gates, see hashKeep's salt note
      .filter(col("thr").isNull ||
        Curation.hashKeep(col(idCol), col("thr"), salt = "graft-temp", width = 4))
      .drop("thr")
  }

  /** Batch-train / stream-apply DSIR gating: `(ratio, defaultLr)` is
    * the [[graft.ext.TrainSet.dsirRatioMap]] artifact trained on a
    * batch (raw snapshot, target) pair; the stream keeps documents
    * whose map-only [[graft.ext.TrainSet.dsirLogWeight]] clears
    * `minLogWeight` — the ingest-time "does this look like the target
    * distribution" filter (the thresholded form of x67's resample; a
    * stream has no global top-k, so the gate is the streamable
    * semantics). Pure per-row expression: stateless, no join, no
    * shuffle, identical batch vs. stream by construction. Grams the
    * training histograms never saw score the Laplace floor
    * `defaultLr`.
    */
  def applyDsir(docs: DataFrame, ratio: Map[Long, Double],
                defaultLr: Double, numBuckets: Int,
                minLogWeight: Double, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions.col
    docs.filter(graft.ext.TrainSet.dsirLogWeight(
      col(textCol), ratio, defaultLr, numBuckets) >= minLogWeight)
  }

  /** Batch-train / stream-apply vocabulary-coverage gate: the top-v
    * vocab is a batch artifact ([[graft.ext.TextStats.topVocab]], built
    * per corpus refresh) and the OOV-rate filter is the identical
    * map-only [[graft.ext.TextStats.oovCounts]] expression — stateless
    * per micro-batch, so ingest can drop documents the tokenizer would
    * shred (high OOV mass) before they ever reach the corpus. A
    * tokenless document has rate 0 (nothing to shred) and is KEPT.
    */
  def applyOovGate(docs: DataFrame, vocab: Seq[String], maxOovRate: Double,
                   textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions.{col, greatest, lit}
    val c = graft.ext.TextStats.oovCounts(col(textCol), vocab)
    docs.filter(
      c.getField("n_oov") / greatest(c.getField("n_tokens"), lit(1L))
        <= maxOovRate)
  }

  /** Batch-train / stream-apply BPE segmentation (r10): the ordered
    * merge list is a batch artifact ([[graft.ext.TextStats.bpeTrain]],
    * persisted via `Artifacts.saveBpeMerges`) and the per-document
    * (n_words, n_subwords) segmentation is the identical map-only
    * [[graft.ext.TextStats.bpeSegmentCount]] fold — merges ride as
    * literals, no join, no shuffle, stateless per micro-batch. The
    * ingest-time use is fertility monitoring / gating: a document whose
    * subwords-per-word blows past the corpus norm is byte noise the
    * tokenizer would shred.
    */
  def segmentBpe(docs: DataFrame, merges: Seq[(String, String)],
                 textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions.col
    docs.withColumn("seg",
      graft.ext.TextStats.bpeSegmentCount(col(textCol), merges))
  }

  /** Streaming content-defined chunking: [[graft.ext.Curation.cdcChunks]]
    * is pure per-row array arithmetic, so the SAME expression chunks a
    * micro-batch — each arriving document explodes into its
    * content-anchored chunks with the same hashes the batch pass would
    * produce (chunk state is per-document, never cross-row; stateless).
    */
  def chunkCdc(docs: DataFrame, textCol: String = "text",
               idCol: String = "doc_id", window: Int = 4,
               modulus: Int = 64): DataFrame =
    graft.ext.Curation.cdcChunks(docs, textCol, idCol, window, modulus)

  /** Batch-train / stream-apply decontamination: `flagged` is a
    * benchmark-contaminated id set from a batch pass —
    * [[Curation.contaminationOverlap]] (shingle) or
    * [[Curation.semanticDecontam]] (embedding) — and applying it to the
    * stream is a broadcast left_anti join: map-only per micro-batch,
    * stateless, no watermark state. The benchmark is fixed, so the
    * flagged set only needs retraining when the benchmark (not the
    * stream) changes — the same batch-train / stream-apply split as
    * [[applyTemperature]]. Ids arriving in the stream that the batch
    * pass never saw are KEPT (decontam flags known leaks; it is not an
    * allow-list).
    */
  def applyDecontam(docs: DataFrame, flagged: DataFrame,
                    idCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    docs.join(broadcast(flagged.select(col(idCol))), Seq(idCol), "left_anti")
  }

  /** Batch-train / stream-apply boilerplate gate: `bloom` is the
    * corpus-common shingle sketch from
    * [[graft.ext.Curation.commonShingleBloom]]; the stream side
    * recomputes each document's distinct shingle hashes and keeps the
    * document iff its common fraction stays under `maxFrac` — map-only
    * per micro-batch, stateless, the sketch rides as a literal. The
    * bloom has no false negatives, so vs. the batch
    * [[graft.ext.Curation.boilerplateFraction]] df gate the stream
    * fraction is inflated-or-equal (fp rate) — the gate drops a
    * superset, never leaks boilerplate past it; with the sketch sized
    * to the trained set the fp inflation is ~0 and the kept sets match
    * exactly (StreamingSpec).
    */
  def applyBoilerplateGate(docs: DataFrame, bloom: Array[Byte],
                           textCol: String = "text", k: Int = 3,
                           maxFrac: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.functions._
    val sh = graft.ext.Dedup.shingles(col(textCol), k)
    val common = size(filter(sh, s =>
      graft.functions.BloomGate.might_contain(lit(bloom), xxhash64(s))))
    // round to 6dp like the batch boiler_frac: an unrounded compare
    // disagrees with the batch gate exactly at the rounding boundary
    // (a doc at 0.4999996 rounds to the batch's 0.5 and must drop here
    // too for the kept sets to match)
    docs.filter(
      round(common.cast("double") / greatest(size(sh), lit(1)), 6) < maxFrac)
  }

  /** X7j streaming twin (r12): batch-train / stream-apply gate-chain
    * DISTILLATION — the deployment x98's student exists for: at ingest
    * the distilled NB model gates at wire speed through ONE codegen'd
    * scoring fold ([[graft.ext.TextStats.nbScores]]), never
    * re-evaluating the teacher's langid/quality/repetition expression
    * chain. The model is the persisted x98 artifact (retrained per
    * corpus refresh, like [[applyTemperature]]'s rates); scoring is
    * map-only, stateless, no join — identical batch vs. stream by
    * construction (StreamingSpec pins kept-set equality across
    * micro-batches).
    */
  def applyDistilledGate(docs: DataFrame,
                         model: graft.ext.TextStats.NbModel,
                         textCol: String = "text",
                         keepLabel: String = "keep"): DataFrame = {
    import org.apache.spark.sql.functions.col
    docs.filter(graft.ext.TextStats.nbPredict(
      graft.ext.TextStats.nbGramBuckets(col(textCol), model.numBuckets),
      model).getField("lang") === keepLabel)
  }

  /** X5k streaming twin (r13): the frozen reference-LM PERPLEXITY gate —
    * the CCNet deployment shape: [[graft.ext.TextStats.refLmTrain]]'s
    * model plus the per-language tail boundary the batch
    * [[graft.ext.TextStats.perplexityTiers]] emits as `thr_lo` gate
    * live ingest, keeping the head+middle tiers (mean bigram log-prob
    * clears the language's own tail tertile). Model tables and the
    * threshold map both ride into the plan as reference objects —
    * map-only, stateless, no join, so the stream keeps EXACTLY the
    * batch tiers' non-tail rows (StreamingSpec-pinned). Languages
    * without a trained threshold and sub-2-token documents (no mean
    * exists) fail closed — the x42 bloom discipline.
    */
  def applyPerplexityGate(docs: DataFrame,
                          model: graft.ext.TextStats.RefLm,
                          tailThr: Map[String, Double],
                          textCol: String = "text",
                          langCol: String = "lang"): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.ext.{Dedup, TextStats}
    val lp = round(TextStats.refLmAvgLogProb(col(textCol), col(langCol),
      model), 6)
    val thr = element_at(typedLit(tailThr), coalesce(col(langCol), lit("")))
    docs.filter(
      size(Dedup.tokens(coalesce(col(textCol), lit("")))) >= 2 &&
        thr.isNotNull && lp >= thr)
  }

  /** X7k streaming twin (r14): the fractional-EPOCH gate on live
    * ingest — [[graft.ext.Curation.epochRates]]' recipe (n_full full
    * copies + one md5-gated fractional copy, salt "graft-epoch")
    * frozen into the plan as a group-keyed literal map, so each
    * arriving document emits its (document × copy) instances map-only:
    * no state, no join, no aggregate, and the emitted multiset is
    * EXACTLY what the batch [[graft.ext.Curation.epochUpsample]] emits
    * for the same documents under the same rates
    * (StreamingSpec-pinned). Groups missing from the recipe emit
    * nothing — same as the batch inner rates join. `rates` maps group
    * -> (n_full, thr) straight from epochRates' (n_full, thr) columns.
    */
  def applyEpochGate(docs: DataFrame,
                     rates: Map[String, (Long, String)],
                     groupCol: String = "lang",
                     idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.ext.Curation
    val g = coalesce(col(groupCol), lit(""))
    val nf = element_at(typedLit(rates.map { case (k, v) => k -> v._1 }), g)
    val th = element_at(typedLit(rates.map { case (k, v) => k -> v._2 }), g)
    val extra = when(th.isNotNull &&
      Curation.hashKeep(col(idCol), th, salt = "graft-epoch", width = 4),
      1).otherwise(0)
    val nCopies = (coalesce(nf, lit(0L)) + extra).cast("int")
    docs.filter(col(idCol).isNotNull && col(groupCol).isNotNull &&
        nf.isNotNull)
      .withColumn("copy", explode(when(nCopies > 0,
        sequence(lit(0), nCopies - 1)).otherwise(array().cast("array<int>"))))
  }

  /** X26 streaming twin (r15): HTML → clean-text extraction on live
    * ingest — [[graft.ext.Extract]] is pure column-expression work
    * (noise strip, block segmentation, anchor-share keep rule), so the
    * stream applies the EXACT batch operator: map-only per micro-batch,
    * no state, no join, and the extracted text of any document is
    * bit-identical to the batch pass (StreamingSpec-pinned). The
    * deployment shape of step 0: pages extract at the wire and only
    * clean text enters the stateful dedup/gate stages downstream.
    */
  def applyExtract(docs: DataFrame, htmlCol: String = "html",
                   outCol: String = "clean_text"): DataFrame = {
    import org.apache.spark.sql.functions.col
    import graft.ext.Extract
    docs.withColumn("_bf", Extract.blockFeatures(col(htmlCol)))
      .withColumn(outCol, Extract.textOf(col("_bf")))
      .withColumn("n_blocks", Extract.blockCountOf(col("_bf")).cast("long"))
      .withColumn("n_kept", Extract.keptCountOf(col("_bf")).cast("long"))
      .drop("_bf")
  }

  /** X5f-c streaming twin (r15): unigram-LM Viterbi ENCODE on live
    * ingest — the segmentation is one codegen'd expression with the
    * trained table frozen into the plan as reference objects
    * ([[graft.functions.UnigramSegment]]), so the stream applies the
    * EXACT batch encoder: map-only per micro-batch, no state, no join,
    * ids bit-identical to the batch pass (StreamingSpec-pinned). The
    * wire-speed tokenization shape: documents encode as they arrive
    * and only slim id sequences flow downstream.
    */
  def applyUnigramEncode(docs: DataFrame, table: Array[(String, Long)],
                         textCol: String = "text",
                         outCol: String = "ids"): DataFrame = {
    import org.apache.spark.sql.functions.col
    docs.withColumn(outCol,
      graft.ext.TextStats.unigramEncodeIds(col(textCol), table))
  }

  /** X5f-e streaming twin (r17): greedy WordPiece ENCODE on live
    * ingest — the segmentation is one codegen'd maximal-munch
    * expression with the trained vocabulary frozen into the plan as a
    * reference object ([[graft.functions.WordPieceSegment]]), so the
    * stream applies the EXACT batch encoder: map-only per micro-batch,
    * no state, no join, ids bit-identical to the batch pass
    * (StreamingSpec-pinned) — [[applyUnigramEncode]]'s shape for the
    * third tokenizer family.
    */
  def applyWordPieceEncode(docs: DataFrame, vocab: Seq[String],
                           textCol: String = "text",
                           outCol: String = "ids"): DataFrame = {
    import org.apache.spark.sql.functions.col
    docs.withColumn(outCol,
      graft.ext.TextStats.wordPieceEncodeIds(col(textCol), vocab))
  }

  /** X7i streaming twin (r12): the gate-funnel JOURNAL — per
    * micro-batch, append the slim (stage, n_docs, n_tokens) delta
    * ([[Curation.funnelCounts]], the SAME classification expression as
    * the batch funnel). Integer counts fold exactly by addition in any
    * order, so [[funnelFromJournal]] reconstructs the funnel a batch
    * pass would compute over the union of batches — bit-identical
    * through the ONE shared [[Curation.funnelFromCounts]] core
    * (StreamingSpec-pinned, at-least-once retries included). This is
    * the live ingest-observability shape: the dashboard reads ≤
    * batches × 5 journal rows, never documents.
    */
  def funnelJournal(stream: DataFrame, journalDir: String,
                    idCol: String = "doc_id", textCol: String = "text",
                    sampleThr: String = "c0",
                    configure: org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =>
                      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = identity)
    : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val writer = stream.writeStream
      .trigger(Trigger.ProcessingTime(0))
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          Curation.funnelCounts(batch, idCol, textCol, sampleThr)
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(journalDir)
        }
      }
    configure(writer).start()
  }

  /** Fold-on-read: the funnel report from a journal. foreachBatch is
    * at-least-once, so retry copies collapse first per
    * (batch_id, stage) — the delta is deterministic in the batch's
    * rows, so max == the single true value — before summing across
    * batches and running the shared report core.
    */
  def funnelFromJournal(spark: org.apache.spark.sql.SparkSession,
                        journalDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Curation.funnelFromCounts(
      spark.read.parquet(journalDir)
        .groupBy("batch_id", "stage")
        .agg(max(col("n_docs")).as("n_docs"),
          max(col("n_tokens")).as("n_tokens"))
        .groupBy("stage")
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens")))
  }
}
