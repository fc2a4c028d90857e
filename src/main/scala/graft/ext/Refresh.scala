package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X23 (r11): INCREMENTAL assembly refresh — the deployment shape of the
  * standing curation+dedup pipeline. x78 proves the batch composition;
  * a real corpus refresh must NOT rebuild from scratch: corpus v2
  * arrives, [[CorpusDiff.diff]] classifies it, and only the
  * `added + changed` documents pay corpus-scale work (gating,
  * tokenization, shingling, MinHash) — everything else updates slim
  * standing state and re-derives the manifest from metadata-sized
  * frames.
  *
  * The standing pipeline P(corpus), shared verbatim by the full-rebuild
  * and refresh paths so they cannot drift:
  *  1. curation gates ([[Curation.standardGates]] — per-doc, so the
  *     gate status of an unchanged document never changes);
  *  2. near-dup pairs via banded MinHash LSH
  *     ([[Dedup.minhashLshPairs]]'s banding, exact-Jaccard verified);
  *  3. connected-component duplicate clusters
  *     ([[Dedup.dupClusters]]) + quality survivor election
  *     ([[Dedup.clusterSurvivors]]);
  *  4. standing set = gated − non-survivors;
  *  5. sharded export manifest ([[TrainSet.exportManifest]]).
  *
  * EXACTNESS (refresh == rebuild, the declared x85 claim): banding is a
  * deterministic per-document function of its text, and candidate
  * verification is exact Jaccard — so the v2 pair set decomposes
  * disjointly into (old×old = standing pairs minus those touching a
  * removed/changed id) ∪ (new×old = [[Dedup.crossDupPairsPrebuilt]]
  * against the standing index minus touched rows) ∪ (new×new =
  * [[Dedup.minhashLshPairs]] over the new batch), each computed with
  * the SAME banding parameters. Gates, clusters, election and manifest
  * are pure functions of (meta, pairs), so the refresh output is
  * bit-identical to a from-scratch rebuild — asserted by the declared
  * x85 row (Spark compares both sides; DuckDB independently replays the
  * full rebuild) and witnessed at scale by ScaleCheck.
  *
  * Scale: the state frames are SLIM — meta (id, quality, n_toks), band
  * index (id, band, bucket), per-doc shingle sets (the one state frame
  * that scales with text volume — the cross-verify side), pair list
  * (id, id). Corpus text is touched only for the delta; the
  * anti-joins that retire touched rows
  * broadcast the (delta-sized) touched id list. Clusters/election/
  * manifest recompute over pair-list-sized frames — metadata, not
  * corpus. All four state frames persist via [[Artifacts.saveIndex]]
  * (the "build once per corpus version, probe many times" contract).
  */
object Refresh {

  /** The standing state of P(corpus): slim gated meta, the banded
    * MinHash index + shingle table of the GATED corpus (the cross-dedup
    * probe side), and the verified near-dup pair list.
    */
  final case class State(meta: DataFrame, bandIdx: DataFrame,
                         shingles: DataFrame, pairs: DataFrame)

  /** Banding/verification parameters — must be identical across the
    * state build, the refresh and any rebuild being compared.
    */
  final case class Params(k: Int = 3, threshold: Double = 0.2,
                          bands: Int = 16, rowsPerBand: Int = 4)

  private def meta(gated: DataFrame): DataFrame =
    gated.select(col("doc_id"), col("quality"),
      TextStats.tokenCount(col("text")).cast("long").as("n_toks"))

  /** Build the standing state from scratch (corpus version 1, or any
    * periodic full re-baseline).
    *
    * NOTE the returned frames are LAZY except the checkpointed pair
    * list: meta/bandIdx/shingles re-run corpus-scale gating+shingling
    * on EVERY downstream use unless persisted. The deployment contract
    * is to write all four through [[Artifacts.saveIndex]] and hand
    * [[refresh]] the reloaded frames (what the declared x85 does) —
    * a refresh fed the raw lazy frames re-gates the full corpus
    * several times over and comes out SLOWER than a rebuild
    * (measured: 173 s vs 76 s at ScaleCheck's 16x).
    */
  def buildState(corpus: DataFrame, p: Params = Params()): State = {
    val gated = Curation.standardGates(corpus)
    State(
      meta(gated),
      Dedup.minhashBandIndex(gated, "text", "doc_id", p.k, p.bands, p.rowsPerBand),
      Dedup.shingleFrame(gated, "text", "doc_id", p.k),
      Dedup.minhashLshPairs(gated, "text", "doc_id", p.k, p.threshold,
          p.bands, p.rowsPerBand)
        .select("id_a", "id_b"))
  }

  /** P's tail: clusters → quality election → survivor drop → manifest,
    * a pure function of (meta, pairs) shared by both paths.
    */
  def manifestOf(metaDf: DataFrame, pairs: DataFrame, seed: String,
                 numShards: Int): DataFrame = {
    val clusters = Dedup.dupClusters(pairs)
    val drop = clusters.join(
        Dedup.clusterSurvivors(clusters, metaDf, "doc_id", col("quality"))
          .select(col("survivor_id").as("doc_id")),
        Seq("doc_id"), "left_anti")
      .select("doc_id")
    val standing = metaDf.join(broadcast(drop), Seq("doc_id"), "left_anti")
    TrainSet.exportManifest(standing, "doc_id", col("n_toks"), seed, numShards)
  }

  /** The from-scratch path: P(corpus) end to end. */
  def fullRebuild(corpus: DataFrame, seed: String, numShards: Int,
                  p: Params = Params()): DataFrame = {
    val st = buildState(corpus, p)
    manifestOf(st.meta, st.pairs, seed, numShards)
  }

  /** The incremental path: diff v1 → v2, retire removed/changed rows
    * from every state frame (broadcast anti-join on the delta-sized
    * touched list), gate + shingle + band ONLY the added/changed docs,
    * find their cross pairs against the standing index and their
    * within-batch pairs, and re-derive the manifest from the updated
    * slim state. Returns (updated state, manifest).
    */
  def refresh(state: State, oldCorpus: DataFrame, newCorpus: DataFrame,
              seed: String, numShards: Int,
              p: Params = Params()): (State, DataFrame) = {
    val d = CorpusDiff.diff(oldCorpus, newCorpus, "doc_id", "text")
      .select("doc_id", "status")
    val touched = d.filter(col("status").isin("removed", "changed"))
      .select("doc_id").localCheckpoint(true)
    val freshIds = d.filter(col("status").isin("added", "changed"))
      .select("doc_id")
    val newDocs = newCorpus.join(freshIds, Seq("doc_id"), "left_semi")
    val newGated = Curation.standardGates(newDocs)
      .localCheckpoint(true) // consumed by meta, band, shingle, 2 pair legs

    def retire(df: DataFrame, idCols: String*): DataFrame =
      idCols.foldLeft(df) { (acc, c) =>
        acc.join(broadcast(touched.withColumnRenamed("doc_id", c)), Seq(c), "left_anti")
      }

    val meta2 = retire(state.meta, "doc_id").unionByName(meta(newGated))
    val band2 = retire(state.bandIdx, "doc_id")
      .unionByName(Dedup.minhashBandIndex(newGated, "text", "doc_id",
        p.k, p.bands, p.rowsPerBand))
    val sh2 = retire(state.shingles, "doc_id")
      .unionByName(Dedup.shingleFrame(newGated, "text", "doc_id", p.k))
    // cross pairs probe the RETIRED index (standing minus touched), so a
    // changed document never pairs against its own dead version
    val cross = Dedup.crossDupPairsPrebuilt(newGated,
        retire(state.bandIdx, "doc_id"), retire(state.shingles, "doc_id"),
        "text", "doc_id", p.k, p.threshold, p.bands, p.rowsPerBand)
      .select(least(col("id_new"), col("id_old")).as("id_a"),
        greatest(col("id_new"), col("id_old")).as("id_b"))
    val within = Dedup.minhashLshPairs(newGated, "text", "doc_id",
        p.k, p.threshold, p.bands, p.rowsPerBand)
      .select("id_a", "id_b")
    // old×old / new×old / new×new are disjoint by construction — no
    // dedup needed, and together they are exactly P(v2)'s pair set
    val pairs2 = retire(state.pairs, "id_a", "id_b")
      .unionByName(cross).unionByName(within)
    val st2 = State(meta2, band2, sh2, pairs2)
    (st2, manifestOf(meta2, pairs2, seed, numShards))
  }
}
