package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J3: round-robin routing (SURVEY §2.4).
  *
  * The reference routes record i to topics[i++ % topics.size]
  * (reference: DataGenerator.java:507). Two forms:
  *  - `assignByIndex`: position-exact — needs a global row order, so it
  *    uses a window over the full ordering; fine for dimension-sized
  *    inputs, NOT for 100 TB facts.
  *  - `assignByKey`: hash-based — `pmod(hash(key), n)`: shuffle-free,
  *    stateless, the form to use at scale (uniform like round-robin but
  *    order-independent).
  */
object Routing {

  def assignByIndex(df: DataFrame, orderCol: String, n: Int): DataFrame = {
    val w = Window.orderBy(col(orderCol))
    df.withColumn("slot", ((row_number().over(w) - 1).cast("long")) % n)
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
