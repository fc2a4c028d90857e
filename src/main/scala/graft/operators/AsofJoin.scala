package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed AS-OF join — the canonical time-series lookup Spark has
  * no native operator for (SPARK-22947): each left row matches the
  * LATEST right row with the same key and `right.ts <= left.ts`
  * (inclusive). The workhorse for joining events to the prevailing
  * snapshot/quote/config-version at event time.
  *
  * Plan (the standard distributed formulation): tag and union the two
  * sides, shuffle on the key, sort each key's rows by (ts, side-tag)
  * inside the partition, and carry the last-seen right row forward with
  * a running `last(_, ignoreNulls)` window — right rows sort before
  * left rows at equal ts, which is exactly the inclusive <= semantics.
  * Two shuffles total: the key window exchange plus the slim (key, ts)
  * dedup's partial-agg exchange. No join blow-up (never materializes
  * the l x r candidate set a range-join would), no global sort; windows
  * parallelize across keys. A key whose history dwarfs the others is
  * the usual skew caveat — salt by coarse time-range and stitch the
  * boundary rows if one key's series outgrows a partition.
  *
  * Null semantics mirror the SQL formulation (`ON l.key = r.key AND
  * r.ts <= l.ts`, left join): right rows with a null key or null ts can
  * never match and are dropped up front (a null-ts right row would
  * otherwise sort NULLS-FIRST and poison every left row's running
  * `last`); left rows always surface — null-key or null-ts left rows
  * with null match columns, exactly as the left join leaves them.
  *
  * Right rows are first deduplicated per (key, ts) to the max-id
  * representative, so ties at the same timestamp resolve
  * deterministically and engine-portably (the DuckDB oracle makes the
  * same choice).
  */
object AsofJoin {

  /** Output: one row per left row — (lid, k, t, matched_id, matched_t),
    * match columns null when no right row precedes the left row.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               keyCol: String, tsCol: String,
               leftIdCol: String, rightIdCol: String): DataFrame = {
    val l = left.select(col(keyCol).as("k"), col(tsCol).as("t"),
      col(leftIdCol).cast("long").as("lid"),
      lit(1).as("tag"), lit(null).cast("long").as("rid"))
    val r = right
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol).as("k"), col(tsCol).as("t"))
      // cast BEFORE the max: a string id column would tie-break
      // lexicographically ('9' > '10'), diverging from the documented
      // numeric max-id representative and from the oracle
      .agg(max(col(rightIdCol).cast("long")).as("rid"))
      .select(col("k"), col("t"), lit(null).cast("long").as("lid"),
        lit(0).as("tag"), col("rid"))
    val w = Window.partitionBy("k").orderBy(col("t"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("matched_id", last(col("rid"), ignoreNulls = true).over(w))
      .withColumn("matched_t",
        last(when(col("tag") === 0, col("t")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("lid"), col("k"), col("t"),
        col("matched_id"), col("matched_t"))
  }
}
