package graft.streaming

import graft.ext.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch-index / stream-query similarity search (X3d's streaming form —
  * the same train/apply split as [[StreamCurate.applyTemperature]]): the
  * corpus-side banded sign-LSH index is built ONCE from a batch snapshot
  * — at 100 TB a `partitionBy(band, bucket)` parquet write reused across
  * every query batch — and the query stream is banded map-only per
  * micro-batch and equi-joined against it. A stream-static equi-join:
  * the corpus never shuffles, no streaming state is created, and the
  * per-batch candidate volume is ~bands/2^bitsPerBand of the index per
  * query.
  *
  * Top-k is per micro-batch via [[topKPerBatch]] inside `foreachBatch`
  * (the candidate dedup + ranked window are plain batch ops there);
  * chaining a streaming dedup AND a streaming top-k aggregation in one
  * continuous query would stack two stateful operators for no benefit —
  * a query vector answers within its own batch.
  */
object StreamSimilarity {

  /** The static corpus index: one (neighbor_id, cv, band, bucket) row
    * per (vector, band) — [[Similarity.bandedFrame]], the identical
    * banding the batch [[Similarity.lshTopKBanded]] uses.
    */
  def bandedIndex(corpus: DataFrame, bands: Int, bitsPerBand: Int,
                  dim: Int, seed: Long = 42L, idCol: String = "vec_id",
                  vecCol: String = "embedding",
                  maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val b = Similarity.bandedFrame(corpus, "neighbor_id", "cv",
      bands, bitsPerBand,
      Similarity.hyperplanes(bands * bitsPerBand, dim, seed),
      idCol, vecCol)
    // optional hot-bucket cap (Similarity.capBuckets): bounds the
    // per-probe candidate scan a mega-bucket would otherwise cost
    if (maxBucketSize == Int.MaxValue) b
    else Similarity.capBuckets(b, maxBucketSize, "neighbor_id")
  }

  /** Band the query stream (map-only, stateless) and join the static
    * index on (band, bucket): emits scored candidate rows
    * (query_id, neighbor_id, sim) — multi-band collisions still
    * duplicated here; [[topKPerBatch]] dedups them.
    */
  def probeCandidates(queries: DataFrame, index: DataFrame,
                      bands: Int, bitsPerBand: Int, dim: Int,
                      seed: Long = 42L, idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame =
    Similarity.bandedFrame(queries, "query_id", "qv",
        bands, bitsPerBand,
        Similarity.hyperplanes(bands * bitsPerBand, dim, seed),
        idCol, vecCol)
      .join(index, Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("qv"), col("cv")).as("sim"))

  /** Batch helper for `foreachBatch`: [[Similarity.topKFromCandidates]]
    * verbatim — the SAME dedup + ranking the batch
    * [[Similarity.lshTopKBanded]] tail runs, so they cannot drift.
    */
  def topKPerBatch(candidates: DataFrame, k: Int): DataFrame =
    Similarity.topKFromCandidates(candidates, k)
}
