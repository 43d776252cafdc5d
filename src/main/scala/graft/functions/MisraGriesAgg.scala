package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a distributed aggregate: each
  * aggregation buffer keeps at most `capacity` (item, count) counters, so a
  * 100 TB stream summarizes into `capacity` rows per map task and only those
  * merge across the shuffle — the exact groupBy it replaces would shuffle
  * the full item stream.
  *
  * Guarantee (Misra-Gries '82; merge step per Agarwal et al., "Mergeable
  * Summaries", PODS'12): after any sequence of updates and merges totalling
  * n items, every item with true frequency > n / (capacity + 1) is present
  * in the sketch, and each kept counter undercounts its item's true
  * frequency by at most n / (capacity + 1). The candidate set may include
  * false positives — callers needing exact heavy hitters re-count the
  * candidates in a second pass (see TextAnalysis.heavyHitters) and the
  * result is then EXACT and deterministic regardless of partitioning.
  *
  * Output: array<struct<item string, est bigint>>, estimated count
  * descending then item ascending (deterministic for a given final buffer).
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, "misra_gries capacity must be positive")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buffer: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buffer.get(item) match {
        case Some(c) => buffer.update(item, c + 1)
        case None if buffer.size < capacity => buffer.update(item, 1L)
        case None =>
          // decrement-all: drains one "vote" from every tracked item
          val dead = mutable.ArrayBuffer.empty[String]
          buffer.foreach { case (k, c) =>
            if (c == 1L) dead += k else buffer.update(k, c - 1)
          }
          dead.foreach(buffer.remove)
      }
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) =>
      buffer.update(k, buffer.getOrElse(k, 0L) + c)
    }
    if (buffer.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything and drop
      // the non-positive remainder — the mergeable-summaries reduction
      val counts = buffer.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      buffer.foreach { case (k, c) =>
        if (c - d <= 0L) dead += k else buffer.update(k, c - d)
      }
      dead.foreach(buffer.remove)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    val sorted = buffer.toArray.sortBy { case (item, est) => (-est, item) }
    new GenericArrayData(sorted.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buffer.size * 24)
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, c) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    m
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType), StructField("est", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes() = {
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"misra_gries requires a string column, got $other")
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "misra_gries"
}

object MisraGriesAgg {
  /** Column API: Misra-Gries frequent-items candidates per group. */
  def misraGries(item: Column, capacity: Int): Column =
    GraftShims.toColumn(MisraGriesAgg(GraftShims.toExpression(item), capacity)
      .toAggregateExpression())
}
