package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed interval (range-containment) join — "which point events
  * fall inside each interval, per key". Spark plans a raw
  * `p.ts BETWEEN i.start AND i.end` join as BroadcastNestedLoop (or a
  * cartesian per key) — the l x r candidate blow-up that stops scaling
  * the moment neither side broadcasts.
  *
  * This is the classic BINNED formulation instead: time is cut into
  * fixed-width bins, each interval explodes to the bins it covers
  * (len/width + 1 slim rows), each point lands in exactly ONE bin, and
  * the candidate join is a hash EQUI-join on (key, bin) with the exact
  * containment predicate evaluated inside the join. Because a point
  * exists in a single bin, every true (interval, point) pair joins at
  * most once — no dedup pass. Shuffles carry (key, bin, id, bounds)
  * longs; candidate volume per bin is interval-density x point-density,
  * tunable via `binWidthUs` (width >> typical interval length degrades
  * toward per-key all-pairs; width << interval length inflates the
  * explode factor — size it near the median interval length). Hot bins
  * (flash-crowd keys) are the skew caveat; AQE skew-join handles the
  * join side, and salting the bin handles pathological cases.
  */
object RangeJoin {

  /** Output: one row per (interval, contained point) —
    * (iid, k, pid, p_ts). Bounds inclusive on both ends.
    *
    * `maxBinsPerInterval` bounds the per-interval explode factor
    * (span/binWidthUs + 1): one corrupt outlier interval (an epoch-0
    * start against current timestamps, say) would otherwise generate
    * millions of bin rows from a single input row — and Spark's
    * `sequence()` hard-errors past ~2^31 elements mid-job. The guard is
    * evaluated per row INSIDE the plan (assert_true feeding the sequence
    * start, so it cannot be pruned away) and fails loudly with the
    * offending interval id before anything explodes into the shuffle.
    */
  def intervalJoin(intervals: DataFrame, points: DataFrame,
                   keyCol: String, startCol: String, endCol: String,
                   tsCol: String, intervalIdCol: String, pointIdCol: String,
                   binWidthUs: Long = 3600L * 1000000L,
                   maxBinsPerInterval: Long = 100000L): DataFrame = {
    val (i, p) = intervalJoinPrepared(intervals, points, keyCol, startCol,
      endCol, tsCol, intervalIdCol, pointIdCol, binWidthUs, maxBinsPerInterval)
    i.join(p, Seq("k", "bin"))
      .filter(col("pt") >= col("t0") && col("pt") <= col("t1"))
      .select(col("iid"), col("k"), col("pid"), col("pt"))
  }

  /** Hot-bin salted variant — identical output contract to
    * [[intervalJoin]], for the flash-crowd regime its docstring names:
    * one (key, bin) holding most of the points (a viral hour) makes
    * that join partition a straggler no matter how the rest balances.
    *
    * The join key grows a salt: each POINT gets a deterministic
    * sub-bucket `pmod(xxhash64(pid), salt)`, each interval-bin row
    * explodes to all `salt` sub-buckets, and the equi-join runs on
    * (key, bin, salt) — the hot bin's points spread across `salt`
    * partitions while every true (interval, point) pair still meets
    * exactly once (a point lives in ONE (bin, salt); the interval
    * covers all salts of its bins). Cost: the interval side's slim
    * bin rows replicate `salt` x — the standard replicate-the-small-
    * side/spread-the-big-side skew trade. Keep `salt` modest (8-32):
    * it multiplies interval-bin rows unconditionally, so it buys tail
    * latency with a proportional candidate-build cost; AQE skew-join
    * handles mild skew without any of this, the salt handles the
    * pathological case AQE's byte thresholds miss.
    */
  def intervalJoinSalted(intervals: DataFrame, points: DataFrame,
                         keyCol: String, startCol: String, endCol: String,
                         tsCol: String, intervalIdCol: String, pointIdCol: String,
                         binWidthUs: Long = 3600L * 1000000L,
                         maxBinsPerInterval: Long = 100000L,
                         salt: Int = 8): DataFrame = {
    require(salt > 0, s"salt must be positive (got $salt)")
    val (i0, p0) = intervalJoinPrepared(intervals, points, keyCol, startCol,
      endCol, tsCol, intervalIdCol, pointIdCol, binWidthUs, maxBinsPerInterval)
    val i = i0.withColumn("salt",
      explode(sequence(lit(0L), lit(salt - 1L))))
    val p = p0.withColumn("salt",
      pmod(xxhash64(col("pid")), lit(salt.toLong)))
    i.join(p, Seq("k", "bin", "salt"))
      .filter(col("pt") >= col("t0") && col("pt") <= col("t1"))
      .select(col("iid"), col("k"), col("pid"), col("pt"))
  }

  /** The shared binned frames behind both join forms (one code path, so
    * the salted variant cannot drift from the plain one): interval rows
    * exploded to their bins (with the degenerate-span gate) and point
    * rows tagged with their single bin.
    */
  private def intervalJoinPrepared(intervals: DataFrame, points: DataFrame,
                                   keyCol: String, startCol: String, endCol: String,
                                   tsCol: String, intervalIdCol: String, pointIdCol: String,
                                   binWidthUs: Long, maxBinsPerInterval: Long):
      (DataFrame, DataFrame) = {
    require(binWidthUs > 0, s"binWidthUs must be positive (got $binWidthUs)")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive (got $maxBinsPerInterval)")
    // the bin id is the bin's START micro-timestamp, computed in exact
    // LONG arithmetic (t - pmod(t, w)) — floor(t / w) through doubles
    // is only exact for |t| < 2^53, so a far-future/past timestamp
    // could land a boundary point in the wrong bin and silently miss a
    // pair; the stepped sequence never divides at all
    def binOf(t: Column): Column = t - pmod(t, lit(binWidthUs))
    val i = intervals.select(col(keyCol).as("k"),
        col(intervalIdCol).cast("long").as("iid"),
        unix_micros(col(startCol)).as("t0"),
        unix_micros(col(endCol)).as("t1"))
      .filter(col("t0") <= col("t1"))
      // degenerate-span gate: nBins = (binOf(t1) - binOf(t0)) / w + 1.
      // assert_true returns null when the predicate holds (coalesced to
      // a 0 offset on the sequence start), raises with the interval id
      // when it doesn't — in-plan, so column pruning cannot drop it
      .withColumn("bin", explode(sequence(
        binOf(col("t0")) + coalesce(
          assert_true(
            (binOf(col("t1")) - binOf(col("t0"))) / binWidthUs + 1
              <= maxBinsPerInterval,
            concat(lit("intervalJoin: interval id="), col("iid"),
              lit(s" spans more than $maxBinsPerInterval bins of " +
                s"$binWidthUs us — corrupt bounds or binWidthUs far " +
                "too small for this data"))).cast("long"),
          lit(0L)),
        binOf(col("t1")), lit(binWidthUs))))
    val p = points.select(col(keyCol).as("k"),
        col(pointIdCol).cast("long").as("pid"),
        unix_micros(col(tsCol)).as("pt"))
      .withColumn("bin", binOf(col("pt")))
    (i, p)
  }
}
