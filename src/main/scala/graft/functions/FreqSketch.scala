package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable frequent-items (heavy-hitters) sketch — the member of the
  * sketch family (X17d) Spark has NO built-in for (4.1 ships HLL, KLL,
  * Theta; frequencies is classpath-only), so this is the justified
  * custom-aggregate case: a `TypedImperativeAggregate` over the
  * DataSketches Misra-Gries `ItemsSketch<String>`, same bridge as
  * `GreatestRow`/`TopKByScore` — ObjectHashAggregate-planned, map-side
  * partial merge, compact blob as the wire format.
  *
  * What it buys at 100 TB: the top terms / domains / shingles of a
  * corpus in ONE pass with bounded state (`maxMapSize` counters), with
  * the Misra-Gries guarantee: estimates UNDERCOUNT by at most
  * `getMaximumError()` (est ≤ true ≤ est + maxError, maxError ≤
  * streamLength/maxMapSize), and `NO_FALSE_NEGATIVES` retrieval returns
  * every item with true count above the error line. Merge preserves the
  * bound, so per-partition/day sketches roll up — the same incremental
  * pattern as x57/x58/x59. Below `maxMapSize` distinct items the map
  * never purges and the sketch is EXACT (maxError 0) — x60 pins that
  * regime against DuckDB integers; the overflow regime's bound is
  * asserted in ExtSpec on a Zipf-ish synthetic stream.
  */
object FreqSketch {

  private val serde = new ArrayOfStringsSerDe()

  private def heapify(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance[String](Memory.wrap(bytes), serde)

  /** Static codegen targets for the scalar readers. */
  def estimateOf(bytes: Array[Byte], item: UTF8String): Long =
    heapify(bytes).getEstimate(item.toString)

  def maxErrorOf(bytes: Array[Byte]): Long = heapify(bytes).getMaximumError

  def itemsOf(bytes: Array[Byte]): ArrayData = {
    val rows = heapify(bytes).getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    new GenericArrayData(rows.map { r =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(r.getItem), r.getEstimate,
        r.getLowerBound, r.getUpperBound))
    }.asInstanceOf[Array[Any]])
  }

  val itemsType: ArrayType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)

  /** Build aggregate: `freq_sketch_agg(item, maxMapSize)` -> compact
    * sketch blob per group. Null items are skipped; `maxMapSize` must
    * be a power of 2 (the library enforces it) and bounds both state
    * and error: maxError <= streamLength / maxMapSize.
    */
  case class FreqSketchAgg(
      child: Expression, maxMapSize: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]]
    with UnaryLike[Expression] {

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"freq_sketch_agg needs a string input, got ${child.dataType.simpleString}")

    override def createAggregationBuffer(): ItemsSketch[String] =
      new ItemsSketch[String](maxMapSize)

    override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
      val v = child.eval(input)
      if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
      buf
    }

    override def merge(buf: ItemsSketch[String],
                       other: ItemsSketch[String]): ItemsSketch[String] =
      buf.merge(other)

    override def eval(buf: ItemsSketch[String]): Any = buf.toByteArray(serde)

    override def serialize(buf: ItemsSketch[String]): Array[Byte] =
      buf.toByteArray(serde)
    override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
      FreqSketch.heapify(bytes)

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false

    override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
      copy(child = newChild)
    override def prettyName: String = "freq_sketch_agg"
  }

  /** Union aggregate: `freq_merge_agg(blob, maxMapSize)` -> one merged
    * blob. Merge is Misra-Gries-safe: error bounds add, never silently
    * reset.
    */
  case class FreqMergeAgg(
      child: Expression, maxMapSize: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]]
    with UnaryLike[Expression] {

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"freq_merge_agg needs a binary sketch input, got ${child.dataType.simpleString}")

    override def createAggregationBuffer(): ItemsSketch[String] =
      new ItemsSketch[String](maxMapSize)

    override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
      val v = child.eval(input)
      if (v != null) buf.merge(FreqSketch.heapify(v.asInstanceOf[Array[Byte]]))
      buf
    }

    override def merge(buf: ItemsSketch[String],
                       other: ItemsSketch[String]): ItemsSketch[String] =
      buf.merge(other)

    override def eval(buf: ItemsSketch[String]): Any = buf.toByteArray(serde)

    override def serialize(buf: ItemsSketch[String]): Array[Byte] =
      buf.toByteArray(serde)
    override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
      FreqSketch.heapify(bytes)

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false

    override def withNewMutableAggBufferOffset(newOffset: Int): FreqMergeAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): FreqMergeAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): FreqMergeAgg =
      copy(child = newChild)
    override def prettyName: String = "freq_merge_agg"
  }

  /** Scalar `freq_estimate(blob, item)`: the item's estimated count
    * (est ≤ true ≤ est + maxError). Codegen'd static call.
    */
  case class FreqEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == BinaryType && right.dataType == StringType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"freq_estimate needs (binary, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    override def dataType: DataType = LongType
    override protected def nullSafeEval(blob: Any, item: Any): Any =
      FreqSketch.estimateOf(blob.asInstanceOf[Array[Byte]],
        item.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (b, i) =>
        s"graft.functions.FreqSketch.estimateOf($b, $i)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): FreqEstimate =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "freq_estimate"
  }

  /** Scalar `freq_max_error(blob)`: the sketch's tracked undercount
    * bound (0 while the counter map has never purged = exact regime).
    */
  case class FreqMaxError(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"freq_max_error needs binary, got ${child.dataType.simpleString}")
    override def dataType: DataType = LongType
    override protected def nullSafeEval(blob: Any): Any =
      FreqSketch.maxErrorOf(blob.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.functions.FreqSketch.maxErrorOf($b)")
    override protected def withNewChildInternal(newChild: Expression): FreqMaxError =
      copy(child = newChild)
    override def prettyName: String = "freq_max_error"
  }

  /** Scalar `freq_items(blob)`: array<struct<item, est, lb, ub>> of the
    * NO_FALSE_NEGATIVES frequent set — every item whose true count
    * exceeds maxError is guaranteed present.
    */
  case class FreqItems(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"freq_items needs binary, got ${child.dataType.simpleString}")
    override def dataType: DataType = FreqSketch.itemsType
    override protected def nullSafeEval(blob: Any): Any =
      FreqSketch.itemsOf(blob.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.functions.FreqSketch.itemsOf($b)")
    override protected def withNewChildInternal(newChild: Expression): FreqItems =
      copy(child = newChild)
    override def prettyName: String = "freq_items"
  }

  // ---- Column API --------------------------------------------------

  def freq_sketch_agg(item: Column, maxMapSize: Int = 1024): Column =
    GraftColumns.column(FreqSketchAgg(
      GraftColumns.expression(item), maxMapSize).toAggregateExpression())

  def freq_merge_agg(sketch: Column, maxMapSize: Int = 1024): Column =
    GraftColumns.column(FreqMergeAgg(
      GraftColumns.expression(sketch), maxMapSize).toAggregateExpression())

  def freq_estimate(sketch: Column, item: Column): Column =
    GraftColumns.column(FreqEstimate(
      GraftColumns.expression(sketch), GraftColumns.expression(item)))

  def freq_max_error(sketch: Column): Column =
    GraftColumns.column(FreqMaxError(GraftColumns.expression(sketch)))

  def freq_items(sketch: Column): Column =
    GraftColumns.column(FreqItems(GraftColumns.expression(sketch)))
}
