package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, ImplicitCastInputTypes, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import scala.collection.mutable

/** Bounded-heap top-k aggregate (SURVEY §4.3, X3 scale path).
  *
  * `top_k_by_score(score, id, k)` keeps the k (score, id) pairs with the
  * highest score per group — O(n log k) memory-bounded, and crucially a
  * real Catalyst aggregate, so Spark runs it with MAP-SIDE PARTIAL
  * aggregation: each task pre-reduces its partition to <= k rows per group
  * before the shuffle. The window+row_number formulation (the correctness
  * oracle) must shuffle and sort EVERY candidate row; at 100 TB of scored
  * pairs this aggregate shuffles k rows per (task, group) instead.
  *
  * Ties break deterministically: higher score first, then smaller id.
  */
case class TopKByScore(
    score: Expression, payload: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with TernaryLike[Expression] with ImplicitCastInputTypes {

  // analysis-time contract: score coerces to double, payload to long, k to
  // int — without this, update()'s asInstanceOf throws at runtime instead
  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, LongType, IntegerType)

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()
  require(kExpr.foldable, "k must be a literal")

  // head of the queue = WORST element (smallest score; ties -> largest id)
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by(t => (-t._1, t._2))

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null)
      offer(buf, (s.asInstanceOf[Double], p.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
                    e: (Double, Long)): Unit =
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.compare(e, buf.head) < 0) { // e better than worst
      buf.dequeue(); buf.enqueue(e)
    }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy(t => (-t._1, t._2))
    new GenericArrayData(sorted.map(t => InternalRow(t._1, t._2)))
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, p) => bb.putDouble(s); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((bb.getDouble, bb.getLong)))
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def first: Expression = score
  override def second: Expression = payload
  override def third: Expression = kExpr

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKByScore =
    copy(score = newFirst, payload = newSecond, kExpr = newThird)
  override def prettyName: String = "top_k_by_score"
}

object TopKByScore {
  /** Column API: `top_k_by_score(score, id, k)` as an aggregate Column. */
  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    GraftColumns.column(
      TopKByScore(GraftColumns.expression(score),
        GraftColumns.expression(id), Literal(k)).toAggregateExpression())
}
