package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** `bucket_lookup(bucket)` — O(log n) lookup of a driver-built
  * (long → double) table with a default for missing keys, as a
  * codegen'd scalar expression.
  *
  * Exists because `element_at` on a LITERAL map is a linear scan of the
  * backing array per call: a 1024-entry DSIR ratio table probed once
  * per n-gram occurrence would cost ~10^5 comparisons per document —
  * quadratic pain that shows up the moment the corpus is real. Here the
  * table rides as two sorted parallel arrays (codegen REFERENCE
  * objects, the [[PqReconstruct]] lesson — never inline the table into
  * generated source) and each probe is one binary search, ~10 compares
  * at 1024 entries, boxing-free.
  */
case class BucketLookup(child: Expression, keys: Array[Long],
                        vals: Array[Double], default: Double)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(keys.length == vals.length,
    s"keys/vals length mismatch (${keys.length} vs ${vals.length})")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override protected def nullSafeEval(input: Any): Any =
    BucketLookup.compute(input.asInstanceOf[Long], keys, vals, default)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kRef = ctx.addReferenceObj("keys", keys, "long[]")
    val vRef = ctx.addReferenceObj("vals", vals, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BucketLookup.compute($c, $kRef, $vRef, ${default}D)")
  }

  override protected def withNewChildInternal(newChild: Expression): BucketLookup =
    copy(child = newChild)
  override def prettyName: String = "bucket_lookup"

  override lazy val canonicalized: Expression =
    copy(child = child.canonicalized)
}

object BucketLookup {

  /** Called from generated code — must stay public+static. */
  def compute(bucket: Long, keys: Array[Long], vals: Array[Double],
              default: Double): Double = {
    val i = java.util.Arrays.binarySearch(keys, bucket)
    if (i >= 0) vals(i) else default
  }

  /** Column API: `table` is sorted by key internally. */
  def bucket_lookup(bucket: Column, table: Map[Long, Double],
                    default: Double): Column = {
    val sorted = table.toArray.sortBy(_._1)
    GraftColumns.column(BucketLookup(GraftColumns.expression(bucket),
      sorted.map(_._1), sorted.map(_._2), default))
  }
}
