package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J2/C1: config coalesce lookup (SURVEY §2.4).
  *
  * The reference resolves each known config name against per-cluster
  * overrides falling back to defaults
  * (reference: ClientConfigFactory.java:98-113, or-chain :101-103).
  * Relationally: two left-outer joins + coalesce. Both maps are tiny —
  * Catalyst broadcasts them, so the lookup is shuffle-free at any scale.
  */
object ConfigResolve {

  /** `names(name)` left-join `overrides(name, value)` left-join
    * `defaults(name, value)` -> (name, resolved).
    */
  def resolve(names: DataFrame, overrides: DataFrame, defaults: DataFrame,
              nameCol: String = "name", valueCol: String = "value"): DataFrame = {
    val o = broadcast(overrides).withColumnRenamed(valueCol, "_override")
    val d = broadcast(defaults).withColumnRenamed(valueCol, "_default")
    names
      .join(o, Seq(nameCol), "left")
      .join(d, Seq(nameCol), "left")
      .select(col(nameCol), coalesce(col("_override"), col("_default")).as("resolved"))
  }
}
