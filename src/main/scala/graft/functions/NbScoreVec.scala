package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `nb_score_vec(buckets)` — the whole NB scoring fold as ONE codegen'd
  * expression: all L per-label log-posteriors of a document in a single
  * loop over its gram-bucket array, accumulating L doubles IN PLACE.
  *
  * Exists because the built-ins formulation
  * (`aggregate(buckets, priors, zip_with(acc, bucket_lookup_vec(b), +))`)
  * runs interpreted: `aggregate`/`zip_with` are higher-order functions
  * with lambda variables, which Spark evaluates via
  * `HigherOrderFunction.bind` rather than Janino codegen — and the
  * zip_with allocates TWO length-L arrays (the probe slice and the new
  * accumulator) per gram OCCURRENCE. At ~200 grams/doc × 5 labels that
  * is ~2,000 short-lived arrays per row; x71's r9 profile showed 70
  * cpu-sec of exactly this. Here the entire fold is one static call —
  * one output array per ROW, no lambda dispatch, whole-stage codegen
  * keeps the loop in the generated class.
  *
  * The dense likelihood table (numBuckets × L doubles, row-major by
  * bucket — the [[BucketLookupVec]] layout) and the length-L prior
  * vector ride as codegen REFERENCE objects, never inlined into
  * generated source.
  */
case class NbScoreVec(child: Expression, dense: Array[Double],
                      priors: Array[Double])
  extends UnaryExpression with ImplicitCastInputTypes {

  require(priors.nonEmpty, "priors must be non-empty")
  require(dense.length % priors.length == 0,
    s"dense length ${dense.length} not a multiple of numLabels ${priors.length}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))

  override protected def nullSafeEval(input: Any): Any =
    NbScoreVec.compute(input.asInstanceOf[ArrayData], dense, priors)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dRef = ctx.addReferenceObj("dense", dense, "double[]")
    val pRef = ctx.addReferenceObj("priors", priors, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NbScoreVec.compute($c, $dRef, $pRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): NbScoreVec =
    copy(child = newChild)
  override def prettyName: String = "nb_score_vec"

  override lazy val canonicalized: Expression =
    copy(child = child.canonicalized)
}

object NbScoreVec {

  /** Called from generated code — must stay public+static. Null bucket
    * elements (impossible from `nbGramBuckets`, whose md5 arithmetic is
    * null-intolerant over non-null tokens) are skipped defensively —
    * matching the built-ins fold, where `acc + null-slice` would
    * propagate null; skipping keeps the document scoreable.
    */
  def compute(buckets: ArrayData, dense: Array[Double],
              priors: Array[Double]): ArrayData = {
    val numLabels = priors.length
    val numBuckets = dense.length / numLabels
    val out = new Array[Double](numLabels)
    System.arraycopy(priors, 0, out, 0, numLabels)
    val n = buckets.numElements()
    var i = 0
    while (i < n) {
      if (!buckets.isNullAt(i)) {
        val b = buckets.getLong(i)
        require(b >= 0 && b < numBuckets,
          s"bucket $b outside dense range [0, $numBuckets)")
        val base = b.toInt * numLabels
        var l = 0
        while (l < numLabels) {
          out(l) += dense(base + l)
          l += 1
        }
      }
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Column API mirroring [[BucketLookupVec.bucket_lookup_vec]]'s dense
    * packing: `tables(l)` is label l's sparse (bucket → log-likelihood)
    * map; absent buckets densify to `defaults(l)`; `priors` seeds the
    * accumulator.
    */
  def nb_score_vec(buckets: Column, tables: Array[Map[Long, Double]],
                   defaults: Array[Double], priors: Array[Double],
                   numBuckets: Int): Column = {
    require(tables.length == defaults.length && tables.length == priors.length,
      s"tables/defaults/priors length mismatch (${tables.length}/" +
        s"${defaults.length}/${priors.length})")
    val L = tables.length
    val dense = Array.tabulate(numBuckets * L) { i =>
      tables(i % L).getOrElse((i / L).toLong, defaults(i % L))
    }
    GraftColumns.column(NbScoreVec(GraftColumns.expression(buckets), dense,
      priors.clone()))
  }
}
