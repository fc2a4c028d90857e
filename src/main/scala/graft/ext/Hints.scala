package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast hints for unbounded id lists.
  *
  * The election/decontamination tails of the assembly pipelines join a
  * slim `(doc_id)` list (non-survivor cluster members, contaminated
  * ids, retired versions) left_anti against a corpus-sized frame. On
  * the fixtures those lists are tiny and the broadcast hint is exactly
  * right — without it the planner (blind to checkpoint-backed stats)
  * falls back to a SortMergeJoin that shuffles the whole corpus on
  * doc_id just to subtract a few thousand ids. But the list's size is
  * a property of the DATA, not the plan: on a real web crawl the
  * duplicate-drop side is 30–50 % of all documents (CCNet-class
  * corpora dedup away most of their input) — billions of ids, far
  * over the broadcast cap, a guaranteed driver OOM if hinted
  * unconditionally. So every such site routes through this gate:
  * verifiably small → hint; otherwise leave the join unhinted and let
  * AQE pick the strategy from runtime statistics.
  */
object Hints {

  /** Session-conf override for the gate — tests drive the
    * over-threshold fallback path by lowering it instead of crafting
    * multi-million-row fixtures.
    */
  val GateConfKey = "graft.hints.broadcastIdRows"

  /** Default gate: ~4 M packed longs ≈ 32 MB on the driver — far
    * under the 8 GB broadcast hard cap and a trivial collect, yet
    * large enough that every delta-sized refresh list on a healthy
    * corpus stays hinted.
    */
  val DefaultBroadcastIdRows: Long = 4L << 20

  def gate(spark: SparkSession): Long =
    spark.conf.getOption(GateConfKey).map(_.toLong)
      .getOrElse(DefaultBroadcastIdRows)

  /** True when the id frame is verifiably under the gate. Counting is
    * an action — callers pass MATERIALIZED (localCheckpoint'ed or
    * artifact-backed) frames so the count is a cached-partition scan,
    * not a plan replay.
    */
  def isSlim(ids: DataFrame): Boolean = ids.count() <= gate(ids.sparkSession)

  /** Hint the frame for broadcast only when [[isSlim]]. */
  def hintIfSlim(ids: DataFrame): DataFrame =
    if (isSlim(ids)) broadcast(ids) else ids

  /** Gate TWO independent materialized frames with ONE Spark job (r19):
    * the union of their global-count aggregates runs both count stages
    * concurrently inside a single action, halving the per-gate job
    * latency the refresh family pays (guide §2.6 — actions are only
    * sequential because driver code calls them sequentially). Both
    * frames materialize into their caches exactly as two separate
    * counts would (the count IS the materializing action for lazy
    * localCheckpoints). Falls back gracefully for empty frames: a
    * global count always yields one row.
    */
  def hintIfSlim2(a: DataFrame, b: DataFrame): (DataFrame, DataFrame) = {
    val out = hintIfSlimN(Seq(a, b))
    (out(0), out(1))
  }

  /** N-frame form of [[hintIfSlim2]] — one job, N concurrent count
    * stages, one gate decision per frame.
    */
  def hintIfSlimN(frames: Seq[DataFrame]): Seq[DataFrame] = {
    import org.apache.spark.sql.functions.{col, lit}
    require(frames.nonEmpty)
    val counts = frames.zipWithIndex
      .map { case (f, i) =>
        f.groupBy().count().select(lit(i).as("_i"), col("count"))
      }
      .reduce(_.unionAll(_))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val g = gate(frames.head.sparkSession)
    frames.zipWithIndex.map { case (f, i) =>
      if (counts(i) <= g) broadcast(f) else f
    }
  }

  /** For LAZILY-derived id lists (an election tail, a contamination
    * scan): materialize once, so the gate count AND every downstream
    * join read the checkpoint instead of re-running the derivation.
    * The checkpoint is LAZY (r18): the gate count itself materializes
    * it — one job instead of an eager-materialize job followed by a
    * count job, with identical caching afterwards.
    */
  def checkpointAndHint(ids: DataFrame): DataFrame =
    hintIfSlim(ids.localCheckpoint(eager = false))
}
