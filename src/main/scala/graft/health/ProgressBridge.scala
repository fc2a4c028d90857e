package graft.health

import graft.streaming.StreamCounters.ProgressStatus
import java.util.concurrent.atomic.AtomicReference

/** Driver-side bridge from the streaming progress monitor to the
  * liveness surface — the reference's `CounterProgressCheck` state
  * (`CounterProgressCheck.java:30-31`, snapshot + activity times) held as
  * the latest `progressMonitor` micro-batch.
  *
  * The snapshot is one row per (cluster, topic, partition) — bounded by
  * topology size (not data volume), so `collect()`ing it in foreachBatch
  * is safe at any scale; probes then read pure driver memory.
  */
final class ProgressBridge {
  private val last = new AtomicReference[Seq[ProgressStatus]](Seq.empty)

  /** foreachBatch sink: `.writeStream.foreachBatch((b, _) => bridge.update(b.collect()))`. */
  def update(batch: Seq[ProgressStatus]): Unit = last.set(batch)

  /** The reference's health datums (A3-A5): total count, min/max
    * activity instants, inactive-partition count; UP iff no partition is
    * stale (`CounterProgressCheck.java:118-121`).
    */
  def check(name: String): Liveness.CheckResult = {
    val snap = last.get()
    val inactive = snap.count(_.stale)
    val data = Map(
      "records" -> snap.map(_.count).sum.toString,
      "partitions" -> snap.size.toString,
      "inactivePartitions" -> inactive.toString) ++
      (if (snap.nonEmpty) Map(
        "earliestActivityMs" -> snap.map(_.lastActivityMs).min.toString,
        "latestActivityMs" -> snap.map(_.lastActivityMs).max.toString)
      else Map.empty)
    Liveness.CheckResult(name, up = inactive == 0, data)
  }
}
