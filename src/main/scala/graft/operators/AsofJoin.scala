package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    *
    * `maxStalenessUs` (the feature-store / point-in-time form): a match
    * older than the bound nulls out — "the prevailing quote, unless it
    * has gone stale". Exact as a POST-filter because the as-of match is
    * already the CLOSEST preceding right row: if it is too stale, every
    * other candidate is staler. Applied as one map-only `when` over the
    * joined output — no change to the window plan.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               keyCol: String, tsCol: String,
               leftIdCol: String, rightIdCol: String,
               maxStalenessUs: Option[Long] = None): DataFrame = {
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
    val joined = l.unionByName(r)
      .withColumn("matched_id", last(col("rid"), ignoreNulls = true).over(w))
      .withColumn("matched_t",
        last(when(col("tag") === 0, col("t")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("lid"), col("k"), col("t"),
        col("matched_id"), col("matched_t"))
    applyStaleness(joined, maxStalenessUs)
  }

  /** Null out matches staler than the bound (shared by the plain and
    * salted forms — one code path for the tolerance semantics).
    */
  private def applyStaleness(joined: DataFrame,
                             maxStalenessUs: Option[Long]): DataFrame =
    maxStalenessUs.fold(joined) { tol =>
      require(tol >= 0, s"maxStalenessUs must be >= 0 (got $tol)")
      val fresh = unix_micros(col("t")) - unix_micros(col("matched_t")) <= tol
      joined.select(col("lid"), col("k"), col("t"),
        when(fresh, col("matched_id")).as("matched_id"),
        when(fresh, col("matched_t")).as("matched_t"))
    }

  /** Skew-salted AS-OF join — identical output contract to [[asofJoin]],
    * for the hot-key regime the plain form's docstring warns about: one
    * key's series outgrowing a partition (a popular symbol/user holding
    * half the rows turns the per-key window into one straggler task).
    *
    * Salt = coarse time bin of width `binWidthUs`: the window partition
    * key becomes (key, bin), so a hot key's series spreads across its
    * bins and every task handles at most one bin of one key. The
    * boundary stitch — a left row early in a bin whose match lives in an
    * EARLIER bin — is a carry-in pseudo-row per (key, left-bin): the
    * latest right row from any earlier bin, computed at BIN granularity
    * (per-key window over per-bin summaries — O(bins) rows per key,
    * independent of row counts, so the stitch itself cannot become the
    * straggler). Within each (key, bin) the carry sorts first (bin
    * start, tag -1), right rows next (tag 0), left rows last (tag 1) —
    * the same inclusive <= tie order as the plain form.
    *
    * Two full-data shuffles, same as the plain form: the right (key, ts)
    * dedup's partial-agg exchange and the (key, bin) window exchange;
    * everything else (bin summaries, carry window, left-bin set) is
    * bin- or summary-sized. `tsCol` must be a timestamp (binning needs
    * micros arithmetic). Pick `binWidthUs` well under the hot key's time
    * span — a hot key concentrated inside ONE bin (flash crowd) needs a
    * proportionally narrower width; the null semantics and max-id tie
    * dedup are byte-identical to [[asofJoin]] (OperatorsSpec asserts
    * equality on boundary/carry/null fixtures; the skew witness lives in
    * tools.ScaleCheck).
    */
  def asofJoinSalted(left: DataFrame, right: DataFrame,
                     keyCol: String, tsCol: String,
                     leftIdCol: String, rightIdCol: String,
                     binWidthUs: Long = 3600L * 1000000L,
                     maxStalenessUs: Option[Long] = None): DataFrame = {
    require(binWidthUs > 0, s"binWidthUs must be positive (got $binWidthUs)")
    def binOf(t: Column): Column = {
      val us = unix_micros(t)
      us - pmod(us, lit(binWidthUs))
    }
    // right side: same (key, ts) max-id dedup as the plain form
    val rd = right
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol).as("k"), col(tsCol).as("t"))
      .agg(max(col(rightIdCol).cast("long")).as("rid"))
    val lv = left.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("k"), col(tsCol).as("t"),
        col(leftIdCol).cast("long").as("lid"))
    // ---- bin-level carry-in: latest right row from any EARLIER bin ----
    // per-(key, bin) latest right row (t unique after dedup, so the
    // struct max is the max-t row; rid rides along)
    val rs = rd.groupBy(col("k"), binOf(col("t")).as("bin"))
      .agg(max(struct(col("t"), col("rid"))).as("s"))
      .select(col("k"), col("bin"), lit(0).as("tag"),
        col("s.t").as("ct"), col("s.rid").as("crid"))
    val lb = lv.select(col("k"), binOf(col("t")).as("bin")).distinct()
      .select(col("k"), col("bin"), lit(-1).as("tag"),
        lit(null).cast(rs.schema("ct").dataType).as("ct"),
        lit(null).cast("long").as("crid"))
    // left-bin markers (tag -1) sort BEFORE same-bin right summaries, so
    // the running last sees strictly-earlier bins only — same-bin right
    // rows are already inside the bin's own window below
    val wb = Window.partitionBy("k").orderBy(col("bin"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = rs.unionByName(lb)
      .withColumn("c_rid", last(col("crid"), ignoreNulls = true).over(wb))
      .withColumn("c_t", last(col("ct"), ignoreNulls = true).over(wb))
      .filter(col("tag") === -1 && col("c_rid").isNotNull)
      .select(col("k"), col("bin"), timestamp_micros(col("bin")).as("t"),
        lit(-1).as("tag"), lit(null).cast("long").as("lid"),
        col("c_rid").as("rid"), col("c_t").as("rt"))
    // ---- main stage: union the three frames, window per (key, bin) ----
    val lm = lv.select(col("k"), binOf(col("t")).as("bin"), col("t"),
      lit(1).as("tag"), col("lid"),
      lit(null).cast("long").as("rid"),
      lit(null).cast(carry.schema("rt").dataType).as("rt"))
    val rm = rd.select(col("k"), binOf(col("t")).as("bin"), col("t"),
      lit(0).as("tag"), lit(null).cast("long").as("lid"),
      col("rid"), col("t").as("rt"))
    val w = Window.partitionBy("k", "bin").orderBy(col("t"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lm.unionByName(rm).unionByName(carry)
      .withColumn("matched_id", last(col("rid"), ignoreNulls = true).over(w))
      .withColumn("matched_t", last(col("rt"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("lid"), col("k"), col("t"),
        col("matched_id"), col("matched_t"))
    // null-key / null-ts left rows surface unmatched (left-join shape),
    // exactly as the plain form leaves them
    val lNull = left.filter(col(keyCol).isNull || col(tsCol).isNull)
      .select(col(leftIdCol).cast("long").as("lid"),
        col(keyCol).as("k"), col(tsCol).as("t"),
        lit(null).cast("long").as("matched_id"),
        lit(null).cast(carry.schema("rt").dataType).as("matched_t"))
    applyStaleness(matched.unionByName(lNull), maxStalenessUs)
  }
}
