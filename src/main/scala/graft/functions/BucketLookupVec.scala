package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `bucket_lookup_vec(bucket)` — the multi-table sibling of
  * [[BucketLookup]]: ONE probe returns the length-L value vector of all L
  * tables at `bucket`, as a dense row-major slice `dense[bucket*L ..]`.
  *
  * Exists for multiclass scoring (NB log-likelihoods: L labels per gram).
  * L separate `bucket_lookup`s cost L binary searches per gram occurrence
  * and re-walk the probe machinery per label; hashed buckets are ALWAYS
  * the full residue range [0, numBuckets) (`hash % numBuckets`), so the
  * table can be dense and a probe is one O(1) index. The dense table
  * (numBuckets × L doubles — 40 KB at 1024×5) rides as a codegen
  * REFERENCE object, never inlined into generated source.
  */
case class BucketLookupVec(child: Expression, dense: Array[Double],
                           numLabels: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(numLabels > 0, s"numLabels must be positive (got $numLabels)")
  require(dense.length % numLabels == 0,
    s"dense length ${dense.length} not a multiple of numLabels $numLabels")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override protected def nullSafeEval(input: Any): Any =
    BucketLookupVec.compute(input.asInstanceOf[Long], dense, numLabels)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dRef = ctx.addReferenceObj("dense", dense, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BucketLookupVec.compute($c, $dRef, $numLabels)")
  }

  override protected def withNewChildInternal(newChild: Expression): BucketLookupVec =
    copy(child = newChild)
  override def prettyName: String = "bucket_lookup_vec"

  override lazy val canonicalized: Expression =
    copy(child = child.canonicalized)
}

object BucketLookupVec {

  /** Called from generated code — must stay public+static. */
  def compute(bucket: Long, dense: Array[Double], numLabels: Int): ArrayData = {
    val numBuckets = dense.length / numLabels
    require(bucket >= 0 && bucket < numBuckets,
      s"bucket $bucket outside dense range [0, $numBuckets)")
    val out = new Array[Double](numLabels)
    System.arraycopy(dense, bucket.toInt * numLabels, out, 0, numLabels)
    ArrayData.toArrayData(out)
  }

  /** Column API: `tables(l)` is the per-label sparse (bucket → value)
    * map over [0, numBuckets); absent buckets densify to `defaults(l)`.
    */
  def bucket_lookup_vec(bucket: Column, tables: Array[Map[Long, Double]],
                        defaults: Array[Double], numBuckets: Int): Column = {
    require(tables.length == defaults.length,
      s"tables/defaults length mismatch (${tables.length} vs ${defaults.length})")
    val L = tables.length
    val dense = Array.tabulate(numBuckets * L) { i =>
      tables(i % L).getOrElse((i / L).toLong, defaults(i % L))
    }
    GraftColumns.column(BucketLookupVec(GraftColumns.expression(bucket), dense, L))
  }
}
