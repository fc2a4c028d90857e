package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** X22b streaming twin: STATEFUL sequence packing — the ingest-time form
  * of [[graft.ext.Curation.packChunks]]. A training-data pipeline that
  * packs at ingest (rather than re-packing the whole corpus per refresh)
  * must carry the partially-filled tail chunk of every (group, shard)
  * ACROSS micro-batches; that carry is exactly one long of state per key
  * (the running token sum), kept in the state store via
  * `flatMapGroupsWithState` and checkpointed with the query, so a restart
  * resumes packing mid-chunk without re-reading the packed prefix.
  *
  * Chunk arithmetic is bit-identical to the batch operator: a document's
  * chunk is `floor(preceding_tokens / capacity)` within its (group,
  * shard), shard = portable md5 of the order key mod `nShards` (the same
  * [[graft.operators.Routing.portableHash]] expression, so a stream-packed
  * corpus and a batch-packed corpus land every document in the SAME
  * chunk).
  *
  * Equality contract (StreamingSpec): stream == batch exactly when each
  * shard's documents arrive in micro-batches that are MONOTONE in the
  * order key (any within-batch disorder is fine — the per-key batch
  * iterator is sorted here before folding; ingest sequence numbers give
  * this for free on append-only feeds). A document arriving after a
  * LATER-ordered document already packed lands in a later chunk than the
  * batch re-pack would place it — the same prefix-stability property the
  * incremental-refresh family (x85) documents: streaming state extends a
  * sealed prefix, it never rewrites one.
  *
  * Scale: state is ONE long per (group, shard) key — a few KB for any
  * real shard fan-out; each micro-batch shuffles only its own rows once
  * (the groupByKey exchange), and the per-key fold materializes only that
  * key's slice of the batch (bounded by the micro-batch, not the corpus).
  */
object StreamPack {

  final case class PackedRow(group: String, shard: Long, order_id: Long,
                             tok: Long, cum: Long, chunk_id: Long)

  // not `private`: the Dataset encoders' generated projections construct
  // these from outside the object's lexical scope
  final case class Key(group: String, shard: Long)

  final case class In(group: String, shard: Long, order_id: Long, tok: Long)

  /** Pack a streaming frame into capacity-bounded chunks, carrying each
    * (group, shard)'s partial tail chunk across micro-batches. Append
    * mode: every input document is emitted exactly once with its final
    * chunk assignment (assignments are start-offset-based, so a document
    * never moves once emitted — no retraction needed).
    */
  def packStream(docs: DataFrame, partitionCol: String, orderCol: String,
                 tokens: Column, capacity: Int,
                 nShards: Int = 1): Dataset[PackedRow] = {
    require(capacity > 0, s"capacity must be positive (got $capacity)")
    val spark = docs.sparkSession
    import spark.implicits._
    val shard =
      if (nShards <= 1) lit(0L)
      else graft.operators.Routing.assignByKey(
        col(orderCol), nShards, graft.operators.Routing.portableHash)
    docs
      .select(
        col(partitionCol).cast("string").as("group"),
        shard.cast("long").as("shard"),
        col(orderCol).cast("long").as("order_id"),
        tokens.cast("long").as("tok"))
      .as[In]
      .groupByKey(d => Key(d.group, d.shard))
      .flatMapGroupsWithState[Long, PackedRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, batch, state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          // within-batch disorder is ours to fix (the iterator order is
          // an engine artifact); CROSS-batch order is the caller's
          // monotone-arrival contract (see scaladoc)
          val out = batch.toArray.sortBy(_.order_id).map { d =>
            cum += d.tok
            PackedRow(key.group, key.shard, d.order_id, d.tok, cum,
              (cum - d.tok) / capacity)
          }
          state.update(cum)
          out.iterator
      }
  }
}
