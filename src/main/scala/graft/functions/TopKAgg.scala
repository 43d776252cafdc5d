package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Aggregation-based top-K per group: keeps the K best (ord desc, id asc)
  * pairs in a bounded heap per aggregation buffer. Because it is an
  * aggregate, Spark runs it with PARTIAL/FINAL modes — each map task keeps
  * at most K candidates per group and only those merge across the shuffle.
  * The window-function formulation (`row_number` over a partition) must
  * instead shuffle and sort EVERY row of every group; for top-3-of-millions
  * at 100 TB that is the difference between K rows and the whole table on
  * the wire.
  *
  * Input: struct<ord: double, id: bigint>. Output: array of the K best
  * structs, best first.
  */
case class TopKPairsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  // PriorityQueue dequeues its LARGEST element; make "largest" mean the
  // WORST kept pair (lowest ord, then highest id) so exceeding K pops it.
  private def heapOrdering: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (ord, id) => (-ord, id) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](heapOrdering)

  override def update(buffer: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        buffer.enqueue((row.getDouble(0), row.getLong(1)))
        if (buffer.size > k) buffer.dequeue()
      }
    }
    buffer
  }

  override def merge(buffer: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { p =>
      buffer.enqueue(p)
      if (buffer.size > k) buffer.dequeue()
    }
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buffer.toArray.sortBy { case (ord, id) => (-ord, id) }
    new GenericArrayData(sorted.map { case (ord, id) =>
      InternalRow(ord, id)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    buffer.foreach { case (ord, id) => bb.putDouble(ord); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) { q.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    q
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes() = {
    child.dataType match {
      case StructType(Array(a, b)) if a.dataType == DoubleType && b.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_pairs requires struct<double, bigint>, got $other")
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKPairsAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "top_k_pairs"
}

object TopKAgg {
  /** Column API: top-K (ord desc, id asc) pairs per group as an aggregate. */
  def topKPairs(ordAndId: Column, k: Int): Column =
    GraftShims.toColumn(TopKPairsAgg(GraftShims.toExpression(ordAndId), k)
      .toAggregateExpression())
}
