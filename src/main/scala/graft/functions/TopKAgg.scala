package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
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
  * Input: struct<ord: double, id: T> for any orderable atomic T (numeric,
  * string, date/timestamp, binary) — ids keep their source type end-to-end,
  * so string-keyed corpora never hit an ANSI cast. Output: array of the K
  * best structs, best first. Rows with a null ord or id are skipped.
  */
case class TopKPairsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Any)]] {

  private lazy val idType: DataType =
    child.dataType.asInstanceOf[StructType](1).dataType
  private lazy val idOrdering: Ordering[Any] = GraftShims.orderingFor(idType)

  // PriorityQueue dequeues its LARGEST element; make "largest" mean the
  // WORST kept pair (lowest ord, then highest id) so exceeding K pops it.
  private def heapOrdering: Ordering[(Double, Any)] = new Ordering[(Double, Any)] {
    override def compare(x: (Double, Any), y: (Double, Any)): Int = {
      val c = java.lang.Double.compare(y._1, x._1)
      if (c != 0) c else idOrdering.compare(x._2, y._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Any)] =
    mutable.PriorityQueue.empty[(Double, Any)](heapOrdering)

  override def update(buffer: mutable.PriorityQueue[(Double, Any)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Any)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        // Copy the id: unsafe-backed values (UTF8String, binary) share the
        // scan's buffers, which are reused across rows.
        buffer.enqueue((row.getDouble(0), InternalRow.copyValue(row.get(1, idType))))
        if (buffer.size > k) buffer.dequeue()
      }
    }
    buffer
  }

  override def merge(buffer: mutable.PriorityQueue[(Double, Any)],
                     other: mutable.PriorityQueue[(Double, Any)]): mutable.PriorityQueue[(Double, Any)] = {
    other.foreach { p =>
      buffer.enqueue(p)
      if (buffer.size > k) buffer.dequeue()
    }
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[(Double, Any)]): Any = {
    // heapOrdering's maximum is the WORST pair, so ascending = best first.
    val sorted = buffer.toArray.sorted(heapOrdering)
    new GenericArrayData(sorted.map { case (ord, id) =>
      InternalRow(ord, id)
    }.asInstanceOf[Array[Any]])
  }

  // Pairs travel the shuffle as length-prefixed UnsafeRows — fixed-width ids
  // cost 2 words, variable-width ids their bytes; no Java serialization.
  @transient private lazy val serProj = UnsafeProjection.create(Array(DoubleType, idType))

  override def serialize(buffer: mutable.PriorityQueue[(Double, Any)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buffer.size * 24)
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (ord, id) =>
      val row = serProj(InternalRow(ord, id))
      out.writeInt(row.getSizeInBytes)
      out.write(row.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Any)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    val row = new UnsafeRow(2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val buf = new Array[Byte](len)
      bb.get(buf)
      row.pointTo(buf, len)
      q.enqueue((row.getDouble(0), InternalRow.copyValue(row.get(1, idType))))
      i += 1
    }
    q
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", DoubleType), StructField("id", idType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes() = {
    child.dataType match {
      case StructType(Array(a, b)) if a.dataType == DoubleType &&
          org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(b.dataType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_pairs requires struct<double, orderable>, got $other")
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
