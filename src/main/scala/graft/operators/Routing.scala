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

  def assignByKey(key: Column, n: Int): Column = pmod(xxhash64(key), lit(n))
}
