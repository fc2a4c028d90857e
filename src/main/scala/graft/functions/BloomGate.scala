package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column bridge over Spark's OWN bloom-filter sketch pair
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the expressions
  * Spark's runtime row-level filtering is built on): the idiomatic
  * membership structure for batch-train / stream-apply gates at 100 TB,
  * where the trained key set (e.g. corpus-common shingle hashes) is too
  * big for a literal array but a few MB as a bloom filter.
  *
  * Contract: NO false negatives ever (a trained key always hits);
  * false-positive rate set by `expectedItems` vs the default sizing.
  * Deterministic: the sketch hashing is seedless, so the same trained
  * set always serializes to the same filter and the same probe always
  * returns the same answer — gate decisions are reproducible.
  */
object BloomGate {

  /** Aggregate a long/string column into a serialized bloom filter
    * (one binary row). Build map-side partials merge like any aggregate
    * — the driver only ever sees the merged sketch.
    */
  def bloom_agg(values: Column, expectedItems: Long): Column =
    GraftColumns.column(new BloomFilterAggregate(
      GraftColumns.expression(values), expectedItems).toAggregateExpression())

  /** Probe: true iff `value` may be in the filter `bloom` (binary
    * column/literal). Codegen'd; the deserialized sketch is cached per
    * task, so per-row cost is the hash probes only.
    */
  def might_contain(bloom: Column, value: Column): Column =
    GraftColumns.column(BloomFilterMightContain(
      GraftColumns.expression(bloom), GraftColumns.expression(value)))
}
