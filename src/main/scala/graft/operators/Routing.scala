package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J3: round-robin routing (SURVEY §2.4).
  *
  * The reference routes record i to topics[i++ % topics.size]
  * (reference: DataGenerator.java:507). Two forms:
  *  - `assignByIndex`: position-exact — global row order WITHOUT a
  *    global window (no all-rows-to-one-partition stage): range
  *    partitioning + per-partition local ranks + driver-side prefix-sum
  *    of the partition counts (the zipWithIndex formulation).
  *  - `assignByKey`: hash-based — `pmod(hash(key), n)`: shuffle-free,
  *    stateless, the preferred form at scale when position identity
  *    doesn't matter (uniform like round-robin but order-independent).
  */
object Routing {

  /** Position-exact global index mod n, fully parallel. Plan:
    *  1. range-repartition + sort within partitions on `orderCol`, so
    *     partition p's rows all precede partition p+1's — then pin that
    *     exact partitioning with an eager localCheckpoint (the two
    *     passes below MUST see identical boundaries; re-running the
    *     range sampler for each pass could place a boundary row
    *     differently and skew every downstream index),
    *  2. per-partition counts -> driver prefix sum (one row per
    *     PARTITION, cluster-metadata-sized — never data),
    *  3. global index = offset(pid) + local row_number - 1, where the
    *     row_number window is partitioned by pid — every partition
    *     ranks in parallel; no empty-partition-spec WindowExec
    *     anywhere in the plan (the r7 verdict's 12-warnings-per-bench
    *     finding).
    * Ties on `orderCol` resolve within one partition (range
    * partitioning keeps equal keys together), same contract as the old
    * global-window form.
    */
  def assignByIndex(df: DataFrame, orderCol: String, n: Int): DataFrame = {
    val parts = df.repartitionByRange(col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = parts.groupBy("_pid").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (p, c) =>
      val off = acc; acc += c; p -> off
    }.toMap
    val wLocal = Window.partitionBy("_pid").orderBy(col(orderCol))
    val offCol =
      if (offsets.isEmpty) lit(0L)
      else element_at(typedLit(offsets), col("_pid"))
    parts.withColumn("slot",
        (offCol + row_number().over(wLocal) - 1) % n)
      .drop("_pid")
  }

  /** Hash-routing (the 100 TB form): map-only, stateless, no ordering.
    * The hash family is pluggable — xxhash64 (codegen'd, fastest) by
    * default; [[portableHash]] when the assignment must be reproducible
    * outside Spark (oracle checks, cross-engine handoffs).
    */
  def assignByKey(key: Column, n: Int,
                  hash: Column => Column = xxhash64(_)): Column =
    pmod(hash(key), lit(n.toLong))

  /** Engine-portable hash: first 15 hex chars (60 bits, fits a signed
    * long) of md5(key). md5 hex is identical across engines (unlike
    * xxhash64, whose value depends on Spark's internal row encoding), so
    * slots are oracle-checkable — DuckDB form:
    * `('0x' || substr(md5(key), 1, 15))::BIGINT`. 60 bits (not one byte)
    * so `assignByKey(_, n, portableHash)` stays uniform for any
    * realistic slot count — with a single byte, n > 256 left slots
    * >= 256 permanently empty and non-divisors of 256 skewed.
    */
  def portableHash(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
}
