package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-set assembly operators (SURVEY §2.9 north-star family):
  * the two order-sensitive steps between a curated corpus and a training
  * run — a deterministic epoch shuffle (what ORDER do the examples arrive
  * in) and a weight-proportional subsample (WHICH examples make the mix).
  *
  * Both derive every random decision from md5 over (salt/seed, id) — the
  * [[Curation.splitAssign]] / `hashKeep` convention — so results are
  * identical across engines, runs, executors and retries, and an epoch or
  * sample is re-drawn by changing one string, never by mutable RNG state.
  *
  * Scale design (100 TB of documents):
  *  - epochShuffle's plan is ONE hash exchange on the shard id plus an
  *    in-shard sort — rows never pass through a global range sort, and
  *    the md5 shard assignment is balanced by construction (~n/numShards
  *    per shard, no skew for any id distribution).
  *  - weightedSample is a per-stratum top-K, which Spark plans with a
  *    WindowGroupLimit below the exchange: every input partition keeps at
  *    most K rows per stratum map-side, so the shuffle carries
  *    O(partitions x strata x K) rows — not the corpus.
  */
object TrainSet {

  /** Deterministic epoch shuffle: every row gets a pseudorandom
    * (shard, pos) drawn from md5(seed ":" id). Changing `seed` (e.g. the
    * epoch number) redraws the whole permutation; keeping it fixes the
    * exact global training order, reproducible on any cluster.
    *
    * `pos` ranks the full md5 hex within the shard (id as tiebreak, so
    * even a 128-bit collision stays deterministic). A trainer streams
    * shard files in shard order and rows in pos order; the concatenation
    * is a uniform random permutation of the corpus.
    *
    * Output: (shard, pos, id-column) — join back to the payload by id, or
    * select extra columns before calling.
    */
  def epochShuffle(df: DataFrame, idCol: String, seed: String,
                   numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive (got $numShards)")
    val h = md5(concat(lit(seed), lit(":"), col(idCol).cast("string")))
    // first 8 hex chars < 2^32, so the conv result is non-negative and
    // plain % is already a bucket in [0, numShards)
    val w = Window.partitionBy("shard").orderBy(col("_h"), col(idCol))
    df.filter(col(idCol).isNotNull)
      .withColumn("_h", h)
      .withColumn("shard",
        conv(substring(col("_h"), 1, 8), 16, 10).cast("long") % numShards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("shard"), col("pos"), col(idCol))
  }

  /** Weight-proportional sample WITHOUT replacement, K per stratum
    * (Efraimidis–Spiridakis exponential race, the one-pass distributed
    * formulation): row i draws priority -ln(u_i) / w_i with u_i an
    * md5-derived uniform in (0, 1]; the K smallest priorities per stratum
    * win. Distributionally identical to K sequential weighted draws
    * without replacement — the quality-weighted subsample a mixture
    * builder runs per (lang, source) stratum — but embarrassingly
    * parallel and, via the md5 uniforms, deterministic in (salt, id).
    *
    * Rows with null or non-positive weight are excluded (a document with
    * no mass cannot be drawn). Output: (stratum, rank, id, priority
    * rounded to 6dp); rank 1 is the most favoured draw.
    */
  def weightedSample(df: DataFrame, stratumCol: String, idCol: String,
                     weightCol: String, k: Int,
                     salt: String = "graft-wsample"): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    // (v + 1) / 2^32 over v in [0, 2^32): u in (0, 1], so ln(u) is finite
    val u = (conv(substring(md5(concat(lit(salt), lit(":"),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("long") + 1) /
      lit(4294967296.0)
    val w = Window.partitionBy("stratum").orderBy(col("_pri"), col(idCol))
    df.filter(col(idCol).isNotNull && col(stratumCol).isNotNull &&
        col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(stratumCol).as("stratum"), col(idCol),
        (-log(u) / col(weightCol).cast("double")).as("_pri"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("stratum"), col("rank"), col(idCol),
        round(col("_pri"), 6).as("priority"))
  }

  /** Deterministic uniform negative sampling for contrastive training:
    * each anchor draws `k` pseudorandom corpus documents (the classic
    * in-batch-negatives replacement when batches must be reproducible).
    *
    * Two-step arithmetic-join formulation:
    *  1. the corpus is indexed ONCE into contiguous global slots 1..N in
    *     pseudorandom order — [[epochShuffle]] shards + a driver-side
    *     prefix sum over the 32 per-SHARD counts (cluster-metadata-sized,
    *     never data; the [[graft.operators.Routing.assignByIndex]]
    *     zipWithIndex pattern) — so no global sort at any corpus size,
    *     and the index is reusable across anchor batches;
    *  2. each anchor explodes to k draws with slot_j =
    *     md5(salt:anchor:j) % N + 1, and negatives resolve via ONE hash
    *     equi-join on slot over slim (slot, id) rows.
    *
    * Draws are independent across j (with replacement): a duplicate
    * negative for one anchor is possible at probability ~k²/2N —
    * vanishing for real corpora. Self-matches (anchor drew itself,
    * ~k/N) are dropped, so an anchor very occasionally carries k-1
    * negatives; re-draw chains would make every draw depend on corpus
    * membership, destroying slot-arithmetic reproducibility. Output:
    * (anchor_id, j, neg_id).
    */
  def negativeSample(anchors: DataFrame, anchorIdCol: String,
                     corpus: DataFrame, corpusIdCol: String,
                     k: Int, salt: String = "graft-negs"): DataFrame = {
    val idx = corpusSlotIndex(corpus, corpusIdCol, salt)
    negativeSampleIndexed(anchors, anchorIdCol, idx, k, salt)
  }

  /** The reusable corpus slot index: (slot, neg_id) with contiguous
    * pseudorandom slots 1..N. Build once per (corpus version, salt) —
    * persist or write it out — and serve every anchor batch (batch or
    * streaming) from [[negativeSampleIndexed]]; at 100 TB the index is a
    * one-off bucketed write, not a per-batch recompute. N is
    * `slot`'s max; the driver-side work here is one 32-row count
    * collect.
    */
  def corpusSlotIndex(corpus: DataFrame, corpusIdCol: String,
                      salt: String = "graft-negs"): DataFrame = {
    val idx = epochShuffle(corpus, corpusIdCol, salt, numShards = 32)
    val counts = idx.groupBy("shard").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    require(counts.nonEmpty, "corpus is empty")
    var acc = 0L
    val offsets = counts.map { case (s, c) =>
      val off = acc; acc += c; s -> off
    }.toMap
    idx.withColumn("slot",
        element_at(typedLit(offsets), col("shard")) + col("pos"))
      .select(col("slot"), col(corpusIdCol).as("neg_id"))
  }

  /** Draw against a prebuilt [[corpusSlotIndex]]. Stream-friendly: with a
    * STREAMING anchors frame this is a stateless stream-static equi-join
    * (the StreamSimilarity batch-index/stream-probe pattern) — tested for
    * batch/stream equality in StreamingSpec. N comes from one scalar agg
    * over the index (constant-folded once per batch plan).
    */
  def negativeSampleIndexed(anchors: DataFrame, anchorIdCol: String,
                            slotIndex: DataFrame, k: Int,
                            salt: String = "graft-negs"): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    val n = slotIndex.agg(max(col("slot"))).collect()(0).getLong(0)
    require(n > 0, "corpus is empty")
    val draws = anchors.filter(col(anchorIdCol).isNotNull)
      .select(col(anchorIdCol).as("anchor_id"))
      .withColumn("j", explode(sequence(lit(1), lit(k))))
      // 48-bit md5 prefix: modulo bias ~n/2^48, immaterial for any corpus
      .withColumn("slot", conv(substring(md5(concat(lit(salt), lit(":"),
        col("anchor_id").cast("string"), lit(":"), col("j").cast("string"))),
        1, 12), 16, 10).cast("long") % n + 1)
    draws.join(slotIndex, Seq("slot"))
      .filter(col("neg_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("j").cast("long").as("j"), col("neg_id"))
  }
}
