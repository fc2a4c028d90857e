package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable KLL quantile sketches (X17's quantile companion — the
  * incremental form of x15's approx_percentile): per-partition / day /
  * source quantile STATE persisted as a binary column and unioned per
  * refresh, instead of re-scanning the corpus. Spark ships DataSketches
  * HLL bindings but no KLL surface; the datasketches-java KLL classes are
  * on the runtime classpath, so this is the same custom-aggregate bridge
  * `GreatestRow`/`TopKByScore` use: a `TypedImperativeAggregate` whose
  * buffer is the sketch object itself — ObjectHashAggregate-planned (hash
  * map per task, map-side partial merge, no sort), with the sketch's own
  * compact byte array as the partial-merge wire format.
  *
  * KLL contract (what x58 asserts): the sketch answers any rank query
  * within `getNormalizedRankError` of truth (~1.65% single-sided at
  * k=200, 99% conf), and merges preserve the bound — so roll-up topology
  * cannot push an estimate outside the bound. Estimates are not claimed
  * bitwise-stable across topologies: KLL compaction is randomized by
  * design (level offsets), so one-level and two-level unions may return
  * different in-bound elements; the BOUND, not the element, is the
  * contract (same stance as x57's HLL notes).
  */
object QuantileSketch {

  private val Inclusive = QuantileSearchCriteria.INCLUSIVE

  private[functions] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  /** Static codegen targets for the scalar expressions. NaN (not null)
    * marks an empty sketch: arithmetic-friendly and keeps the scalar
    * expressions non-nullable beyond their input's nullness.
    */
  def quantileOf(bytes: Array[Byte], rank: Double): Double = {
    val sk = heapify(bytes)
    if (sk.isEmpty) Double.NaN else sk.getQuantile(rank, Inclusive)
  }

  def rankOf(bytes: Array[Byte], value: Double): Double = {
    val sk = heapify(bytes)
    if (sk.isEmpty) Double.NaN else sk.getRank(value, Inclusive)
  }

  /** Build aggregate: `kll_sketch_agg(value, k)` -> compact sketch blob
    * per group. Null values are skipped (SQL aggregate convention); an
    * all-null group yields an empty sketch blob (8-byte preamble), which
    * unions as identity and answers quantile queries with NaN.
    */
  case class KllSketchAgg(
      child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"kll_sketch_agg needs a double input, got ${child.dataType.simpleString}")

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(k)

    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null) buf.update(v.asInstanceOf[Double])
      buf
    }

    override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
      buf.merge(other); buf
    }

    override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

    override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      QuantileSketch.heapify(bytes)

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false

    override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
      copy(child = newChild)
    override def prettyName: String = "kll_sketch_agg"
  }

  /** Union aggregate: `kll_union_agg(sketch_blob, k)` -> one merged blob.
    * `k` sizes the union buffer and must not exceed the input sketches'
    * k (KLL unions never grow accuracy; a larger-k union of smaller-k
    * sketches silently degrades to the smallest k — pass the build k).
    */
  case class KllMergeAgg(
      child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"kll_union_agg needs a binary sketch input, got ${child.dataType.simpleString}")

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(k)

    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null) buf.merge(QuantileSketch.heapify(v.asInstanceOf[Array[Byte]]))
      buf
    }

    override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
      buf.merge(other); buf
    }

    override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

    override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      QuantileSketch.heapify(bytes)

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false

    override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
      copy(child = newChild)
    override def prettyName: String = "kll_union_agg"
  }

  /** Scalar `kll_quantile(blob, rank)`: the value at normalized rank in
    * [0, 1] (INCLUSIVE criteria — the value whose cumulative weight
    * covers the rank). Codegen'd static call; NaN on an empty sketch.
    */
  case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == BinaryType && right.dataType == DoubleType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"kll_quantile needs (binary, double), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(blob: Any, rank: Any): Any =
      QuantileSketch.quantileOf(blob.asInstanceOf[Array[Byte]],
        rank.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (b, r) =>
        s"graft.functions.QuantileSketch.quantileOf($b, $r)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): KllQuantile =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "kll_quantile"
  }

  /** Scalar `kll_rank(blob, value)`: the normalized rank of the value
    * (INCLUSIVE). Codegen'd; NaN on an empty sketch.
    */
  case class KllRank(left: Expression, right: Expression)
    extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == BinaryType && right.dataType == DoubleType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"kll_rank needs (binary, double), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(blob: Any, value: Any): Any =
      QuantileSketch.rankOf(blob.asInstanceOf[Array[Byte]],
        value.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (b, v) =>
        s"graft.functions.QuantileSketch.rankOf($b, $v)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): KllRank =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "kll_rank"
  }

  // ---- Column API --------------------------------------------------

  def kll_sketch_agg(value: Column, k: Int = 200): Column =
    GraftColumns.column(
      KllSketchAgg(GraftColumns.expression(value), k).toAggregateExpression())

  def kll_union_agg(sketch: Column, k: Int = 200): Column =
    GraftColumns.column(
      KllMergeAgg(GraftColumns.expression(sketch), k).toAggregateExpression())

  def kll_quantile(sketch: Column, rank: Column): Column =
    GraftColumns.column(KllQuantile(
      GraftColumns.expression(sketch), GraftColumns.expression(rank)))

  def kll_rank(sketch: Column, value: Column): Column =
    GraftColumns.column(KllRank(
      GraftColumns.expression(sketch), GraftColumns.expression(value)))
}
