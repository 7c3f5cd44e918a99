package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Bounded top-N as a true aggregate function: `topn_agg(ord, payload,
  * n)` inside `groupBy().agg(...)` keeps an O(n) min-heap per group and
  * returns the payloads of the n largest `ord` values, descending.
  *
  * This is the reference's heap accumulation re-expressed as a Catalyst
  * `TypedImperativeAggregate` — `MinMaxPriorityQueue.orderedBy(reverse)
  * .maximumSize(topSize)` (reference TopN.java:117-118) becomes the
  * buffer, with one decisive upgrade: Spark plans it with PARTIAL
  * aggregation (`ObjectHashAggregate` partial → final), so every task
  * pre-reduces its partitions to n rows per group before the shuffle.
  * The reference had no combiner at all — every record crossed its
  * shuffle to one reducer (TopN.java:92-95).
  *
  * Ordering semantics match the operator form: descending by `ord`,
  * NULL ranks below every non-NULL value (kept only if the heap never
  * fills); ties are broken arbitrarily (reference quirk — its e2e test
  * uses set equality for exactly this reason, TopNTest.java:124-125).
  */
case class TopNAggExpr(
    ord: Expression,
    payload: Expression,
    n: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopNAggBuffer] with BinaryLike[Expression] {

  require(n >= 1 && n <= 1024 * 1024, // MAX_TOP parity, TopNConfig.java:34
    s"n must be in [1, ${1024 * 1024}], got $n")

  override def left: Expression = ord
  override def right: Expression = payload

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ord.dataType match {
      case IntegerType | LongType | FloatType | DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"topn_agg ordering column must be int/long/float/double, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(payload.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topn_agg"

  /** Null-smallest descending order on the 4 supported numeric types. */
  private[graft] lazy val ordOrdering: Ordering[Any] = {
    val base: Ordering[Any] = ord.dataType match {
      case IntegerType => Ordering.Int.asInstanceOf[Ordering[Any]]
      case LongType => Ordering.Long.asInstanceOf[Ordering[Any]]
      case FloatType => Ordering.Float.TotalOrdering.asInstanceOf[Ordering[Any]]
      case DoubleType => Ordering.Double.TotalOrdering.asInstanceOf[Ordering[Any]]
      case other => throw new IllegalStateException(s"unsupported ord type $other")
    }
    (a: Any, b: Any) =>
      if (a == null && b == null) 0
      else if (a == null) -1
      else if (b == null) 1
      else base.compare(a, b)
  }

  @transient private lazy val payloadProj =
    UnsafeProjection.create(Array(payload.dataType))

  override def createAggregationBuffer(): TopNAggBuffer =
    new TopNAggBuffer(n, ordOrdering)

  override def update(buffer: TopNAggBuffer, input: InternalRow): TopNAggBuffer = {
    val o = ord.eval(input)
    if (buffer.wouldAccept(o)) {
      val p = payloadProj(InternalRow(payload.eval(input))).copy()
      buffer.insert(o, p)
    }
    buffer
  }

  override def merge(buffer: TopNAggBuffer, other: TopNAggBuffer): TopNAggBuffer = {
    other.entries.foreach { case (o, p) =>
      if (buffer.wouldAccept(o)) buffer.insert(o, p)
    }
    buffer
  }

  // Non-destructive: window frames evaluate the same buffer once per
  // output row, so eval must not drain the heap.
  override def eval(buffer: TopNAggBuffer): Any =
    new GenericArrayData(
      buffer.sortedDescending().map(_._2.get(0, payload.dataType)))

  override def serialize(buffer: TopNAggBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val items = buffer.entries
    out.writeInt(items.size)
    items.foreach { case (o, row) =>
      if (o == null) out.writeByte(0)
      else {
        out.writeByte(1)
        ord.dataType match {
          case IntegerType => out.writeInt(o.asInstanceOf[Int])
          case LongType => out.writeLong(o.asInstanceOf[Long])
          case FloatType => out.writeFloat(o.asInstanceOf[Float])
          case DoubleType => out.writeDouble(o.asInstanceOf[Double])
          case other => throw new IllegalStateException(s"unsupported $other")
        }
      }
      val bytes = row.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): TopNAggBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val buffer = createAggregationBuffer()
    val count = in.readInt()
    var i = 0
    while (i < count) {
      val o: Any =
        if (in.readByte() == 0) null
        else ord.dataType match {
          case IntegerType => in.readInt()
          case LongType => in.readLong()
          case FloatType => in.readFloat()
          case DoubleType => in.readDouble()
          case other => throw new IllegalStateException(s"unsupported $other")
        }
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      val row = new UnsafeRow(1)
      row.pointTo(bytes, len)
      buffer.insert(o, row)
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopNAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopNAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopNAggExpr =
    copy(ord = newLeft, payload = newRight)
}

/** O(n) bounded min-heap buffer: head is the smallest kept entry and is
  * evicted when a larger one arrives on a full heap.
  */
final class TopNAggBuffer(n: Int, ordering: Ordering[Any]) {
  private val heap =
    mutable.PriorityQueue.empty[(Any, UnsafeRow)](
      Ordering.by[(Any, UnsafeRow), Any](_._1)(ordering).reverse)

  def wouldAccept(o: Any): Boolean =
    heap.size < n || ordering.compare(o, heap.head._1) > 0

  def insert(o: Any, row: UnsafeRow): Unit = {
    if (heap.size < n) heap.enqueue((o, row))
    else if (ordering.compare(o, heap.head._1) > 0) {
      heap.dequeue()
      heap.enqueue((o, row))
    }
  }

  def entries: Seq[(Any, UnsafeRow)] = heap.toSeq

  /** Descending by ord without mutating the heap. */
  def sortedDescending(): Array[(Any, UnsafeRow)] =
    heap.toArray.sortBy(_._1)(ordering.reverse)
}

/** Column builder for the aggregate. */
object TopNAgg {
  def apply(ord: Column, payload: Column, n: Int): Column =
    ExpressionUtils.column(
      TopNAggExpr(ExpressionUtils.expression(ord), ExpressionUtils.expression(payload), n)
        .toAggregateExpression())
}
