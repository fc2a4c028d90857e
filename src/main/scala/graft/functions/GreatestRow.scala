package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{DataType, StructType}

/** Greatest-row aggregate (X12 scale path, the argmax companion to
  * [[TopKByScore]]'s top-k).
  *
  * `greatest_row(struct(ord..., payload...))` keeps the lexicographically
  * greatest struct per group — i.e. the whole row whose ordering prefix is
  * maximal. Semantically identical to `max(struct(...))`, but Spark's
  * declarative `Max` over a struct buffer is not hash-aggregable (struct
  * buffers don't fit the fixed-width UnsafeRow hash map), so it silently
  * degrades to SortAggregate — every scan partition SORTS by the grouping
  * key first. As a TypedImperativeAggregate this runs under
  * ObjectHashAggregate instead: hash map per task, map-side partial merge,
  * no sort anywhere, one 16-to-few-hundred-byte buffer per (task, key).
  *
  * The buffer is a copied InternalRow; serialization between partial and
  * final is the row's UnsafeRow bytes.
  */
case class GreatestRow(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GreatestRow.Buf] with UnaryLike[Expression] {

  import GreatestRow.Buf

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val ordering: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(child.dataType)
      .asInstanceOf[Ordering[InternalRow]]
  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (!child.dataType.isInstanceOf[StructType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"greatest_row needs a struct input, got ${child.dataType.simpleString}")
    else if (!org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"struct is not orderable: ${child.dataType.simpleString}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  // row = null: empty group; a struct(...) input itself is never null
  override def createAggregationBuffer(): Buf = new Buf(null)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input).asInstanceOf[InternalRow]
    if (v != null && (buf.row == null || ordering.compare(v, buf.row) > 0))
      buf.row = v.copy()
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    if (other.row != null &&
        (buf.row == null || ordering.compare(other.row, buf.row) > 0))
      buf.row = other.row
    buf
  }

  override def eval(buf: Buf): Any = buf.row

  override def serialize(buf: Buf): Array[Byte] =
    if (buf.row == null) Array.emptyByteArray
    else toUnsafe(buf.row).getBytes

  override def deserialize(bytes: Array[Byte]): Buf =
    if (bytes.isEmpty) new Buf(null)
    else {
      val r = new UnsafeRow(structType.size)
      r.pointTo(bytes, bytes.length)
      new Buf(r)
    }

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(newOffset: Int): GreatestRow =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GreatestRow =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GreatestRow =
    copy(child = newChild)
  override def prettyName: String = "greatest_row"
}

object GreatestRow {
  /** Mutable single-row buffer (a bare InternalRow can't be the buffer
    * type parameter: it collides with the final InternalRow-typed bridge
    * methods on ImperativeAggregate). */
  final class Buf(var row: InternalRow)

  /** Column API: `greatest_row(struct(...))` as an aggregate Column. */
  def greatest_row(s: Column): Column =
    GraftColumns.column(
      GreatestRow(GraftColumns.expression(s)).toAggregateExpression())
}
