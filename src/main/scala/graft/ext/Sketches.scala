package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketch state (SURVEY §2.9 north-star family) — the
  * incremental form of X4's approx-distinct: at 100 TB nobody recounts
  * the corpus per refresh; each partition / day / source keeps a SKETCH,
  * and corpus-wide cardinality is the union of stored sketches. Built on
  * Spark's own DataSketches HLL bindings (`hll_sketch_agg` /
  * `hll_union_agg` — real binary sketch state, persistable to a column),
  * not `approx_count_distinct`, whose HLL++ state never leaves the
  * aggregation.
  *
  * The load-bearing property is RE-AGGREGATION STABILITY of the merge:
  * HLL union is register-wise max, associative and commutative, so
  * unioning daily sketches into weekly sketches into one total gives
  * the same answer as unioning all dailies directly — the refresh
  * topology cannot change the answer. In the dense regime the equality
  * is EXACT (ExtSpec asserts == across three topologies at 3000
  * distinct); in the sparse->dense transition the union gadget's
  * coupon-promotion point is topology-dependent and estimates can
  * drift by a hair (measured 1 count at the 500-distinct boundary), so
  * x57 asserts <= 1% topology drift plus a measured relative-error
  * bound vs the exact count (provenance in BASELINE.md). Also NOT
  * claimed: a union's estimate equal to a single whole-corpus
  * sketch's at small cardinality — the union gadget goes dense while a
  * small direct sketch stays coupon-exact (measured 498 vs exact 500);
  * the error BOUND, not bitwise sketch equality, is the HLL contract.
  * Scale: per-group sketch build is one partial-agg pass (sketch
  * partials merge map-side); union passes aggregate kilobyte blobs.
  */
object Sketches {

  /** One HLL sketch blob per group: (groupCol, sketch). `lgK` = 12 is
    * Spark's default (~1.6 KB, ~2% standard error); both sides of a
    * union must agree on it.
    */
  def hllPerGroup(df: DataFrame, groupCol: String, valueCol: String,
                  lgK: Int = 12): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Aggregate Column: union a frame of sketch blobs into ONE blob
    * (register-wise max) — the roll-up step of an incremental pipeline
    * (daily -> weekly -> total).
    */
  def hllUnion(sketchCol: String = "sketch"): Column =
    hll_union_agg(col(sketchCol), lit(false))

  /** Estimated distinct count over a frame of sketch blobs (aggregate
    * Column: register-wise-max union, then estimate).
    */
  def hllUnionEstimate(sketchCol: String = "sketch"): Column =
    hll_sketch_estimate(hllUnion(sketchCol))

  // ---- quantile state (KLL — Spark's own DataSketches bindings) -----

  /** One KLL quantile sketch blob per group: (groupCol, qsketch). The
    * quantile companion to [[hllPerGroup]] — persist these per
    * partition/day/source, union per refresh, never re-scan. `k` = 200
    * gives ~1.65% single-sided rank error at 99% confidence. Built on
    * Spark's own `kll_sketch_agg_double` (4.1 ships the full KLL
    * surface next to the HLL one), NOT `approx_percentile`, whose
    * sketch state never leaves the aggregation.
    */
  def kllPerGroup(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int = 200): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(kll_sketch_agg_double(
        col(valueCol).cast("double"), k).as("qsketch"))

  /** Aggregate Column: union a frame of KLL blobs into one blob. Pass
    * the BUILD k (a larger union k cannot add accuracy back).
    */
  def kllUnion(sketchCol: String = "qsketch", k: Int = 200): Column =
    kll_merge_agg_double(col(sketchCol), k)

  /** Scalar Column: the value at normalized rank `q` of a sketch blob. */
  def kllQuantile(sketchCol: String, q: Double): Column =
    kll_sketch_get_quantile_double(col(sketchCol), lit(q))

  // ---- set-algebra state (Theta — Spark's own bindings) -------------

  /** One Theta sketch blob per group: (groupCol, sketch). The
    * SET-ALGEBRA member of the sketch family: unlike HLL (union-only),
    * Theta blobs support intersection and difference — "how many docs
    * do snapshots A and B share / how many are new in B" without an
    * exact id join, the sketch companion to X15's corpus diff.
    * `lgK` = 12 (4096 nominal entries) keeps the sketch EXACT below
    * ~4k distinct and ~1.6% RSE above (errors scale with the UNION
    * size for intersections — see x59's bound provenance).
    */
  def thetaPerGroup(df: DataFrame, groupCol: String, valueCol: String,
                    lgK: Int = 12): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(theta_sketch_agg(col(valueCol), lgK).as("sketch"))

  /** Aggregate Column: union a frame of Theta blobs into one blob. */
  def thetaUnion(sketchCol: String = "sketch", lgK: Int = 12): Column =
    theta_union_agg(col(sketchCol), lgK)

  // ---- heavy-hitter state (frequencies — functions.FreqSketch) ------

  /** One frequent-items sketch blob per group: (groupCol, fsketch).
    * The heavy-hitters member of the family (top terms/domains in one
    * pass, bounded state) — Spark has no built-in for it, so this
    * rides the custom `functions.FreqSketch` aggregate.
    */
  def freqPerGroup(df: DataFrame, groupCol: String, itemCol: String,
                   maxMapSize: Int = 1024): DataFrame =
    df.filter(col(itemCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(graft.functions.FreqSketch.freq_sketch_agg(
        col(itemCol), maxMapSize).as("fsketch"))

  /** Aggregate Column: union a frame of frequent-items blobs (error
    * bounds add across merges — never silently reset).
    */
  def freqUnion(sketchCol: String = "fsketch",
                maxMapSize: Int = 1024): Column =
    graft.functions.FreqSketch.freq_merge_agg(col(sketchCol), maxMapSize)
}
