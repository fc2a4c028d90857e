package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `pq_reconstruct(codes)` — decode a product-quantization code array
  * (one centroid id per subspace) back into the full concatenated
  * vector: `out[s*sub .. (s+1)*sub) = codebooks(s)(codes(s))`.
  *
  * This is the map-only ADC decode: cosine(query, pq_reconstruct(codes))
  * equals the classic per-subspace lookup-table sum (the inner product
  * distributes over the concatenation), so a PQ scan is one codegen'd
  * projection — no explode, no join, no per-id shuffle. The codebook
  * tensor rides as a codegen REFERENCE OBJECT (the [[NearestCells]]
  * lesson: literal-inlining m x codebookSize x sub doubles makes janino
  * compile multi-thousand-line classes); generated code is one static
  * call regardless of codebook size.
  *
  * Out-of-range or null-slot codes decode that subspace to zeros rather
  * than throwing: a corrupt code row degrades one candidate's score, it
  * must not kill a 100 TB scan stage.
  */
case class PqReconstruct(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(ArrayType(IntegerType))

  override protected def nullSafeEval(input: Any): Any =
    PqReconstruct.compute(input.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqReconstruct.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqReconstruct =
    copy(child = newChild)
  override def prettyName: String = "pq_reconstruct"

  override lazy val canonicalized: Expression =
    copy(child = child.canonicalized)
}

object PqReconstruct {

  /** Called from generated code — must stay public+static. */
  def compute(codes: ArrayData, codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val m = math.min(codes.numElements(), codebooks.length)
    var dim = 0
    var s = 0
    while (s < codebooks.length) { dim += codebooks(s)(0).length; s += 1 }
    val out = new Array[Double](dim)
    var off = 0
    s = 0
    while (s < codebooks.length) {
      val cb = codebooks(s)
      val sub = cb(0).length
      if (s < m && !codes.isNullAt(s)) {
        val code = codes.getInt(s)
        if (code >= 0 && code < cb.length) {
          System.arraycopy(cb(code), 0, out, off, sub)
        }
      }
      off += sub
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: `codes` must be array<int> of length m. */
  def pq_reconstruct(codes: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftColumns.column(PqReconstruct(GraftColumns.expression(codes), codebooks))
}
