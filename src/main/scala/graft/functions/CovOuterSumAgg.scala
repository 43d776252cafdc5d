package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fixed-buffer outer-product sums for the component-covariance matrix —
  * the HIGH-DIM path of `Similarity.embeddingCovariance`: the explode
  * formulation materializes O(d²) rows per vector through codegen, which
  * is the right trade at embedding dims 64-256 but pure row churn at
  * dim ≥ ~1024; this aggregate does the same O(d²) arithmetic per row
  * into ONE reusable buffer per task, and only the buffer (d(d+1)/2
  * entries × 4 lanes) crosses the shuffle — the same mergeable-summary
  * algebra as [[MisraGriesAgg]], sized by dimension instead of capacity.
  *
  * BIT-IDENTICAL to the explode path by construction, on the explode
  * path's own numeric domain: per-pair lanes (n, Σxy, Σx, Σy) accumulate
  * the SAME DECIMAL(28,12)-rounded terms Spark's `sum(cast(... as
  * decimal(28,12)))` accumulates (scale-12 unscaled integers;
  * `BigDecimal.valueOf(double).setScale(12, HALF_UP)` is exactly Spark's
  * double→decimal cast), addition is exact and order-independent, and
  * eval reproduces the final double arithmetic (`round(sxy/n −
  * (sx/n)(sy/n), 6) + 0.0`, with Spark's own BigDecimal-based HALF_UP
  * rounding). Domain caveat: DECIMAL(28,12) carries 16 integral digits,
  * so a term |x_i·x_j| ≥ 1e16 makes the explode path FAIL LOUDLY under
  * ANSI mode while this aggregate — uncapped integer arithmetic — still
  * returns the exact answer; the paths never silently disagree, one
  * simply has the wider domain. Ragged corpora match too: the
  * per-pair count/sum lanes reproduce the explode path's group
  * membership (a vector contributes to pair (i, j) iff it has a j-th
  * element). The hot path is pure long adds (`Math.addExact`); a lane
  * that overflows ±2^63 unscaled (≈ 9.2e6 vector-pairs of unit-scale
  * values per TASK-level partial, far more corpus rows) promotes to a
  * BigInteger side lane, so the result stays exact at any scale.
  *
  * Triangle indexing is column-major — idx(i, j) = j(j+1)/2 + i for
  * i ≤ j — which is append-only in j, so the buffer grows to the longest
  * vector actually seen and needs no dimension argument.
  *
  * Output: array<struct<i int, j int, n_vecs long, cov double, mean
  * double>> over the pairs with at least one contribution, i ≤ j, ordered
  * (j, i). `mean` is round(Σx_i / n, 6) of the pair's FIRST component —
  * on the diagonal (i, i) that is exactly the column mean the PCA
  * centering step needs, with the same decimal-sum discipline a separate
  * posexplode/groupBy means pass would use; emitting it here lets
  * `pcaTrain` train from ONE corpus pass instead of two (the covariance
  * consumers simply don't select it, so the oracle schema is unchanged).
  */
case class CovOuterSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CovOuterSumAgg.Buf] {

  import CovOuterSumAgg._

  override def createAggregationBuffer(): Buf = new Buf

  override def update(buffer: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val len = arr.numElements()
      if (len > 0) {
        buffer.ensure(len)
        // per-element scale-12 terms, rounded once (mirrors casting the
        // element itself to DECIMAL(28,12) in the explode formulation)
        val el = new Array[Double](len)
        val elScaled = new Array[BigInteger](len)
        var i = 0
        while (i < len) {
          // null elements cannot occur in array<double> built from the
          // float embeddings; a null here would also have poisoned the
          // explode path's sums, so fail loudly instead of diverging
          require(!arr.isNullAt(i), "cov_outer_sum: null vector element")
          el(i) = arr.getDouble(i)
          elScaled(i) = scaled12(el(i))
          i += 1
        }
        var j = 0
        while (j < len) {
          val base = j * (j + 1) / 2
          var k = 0
          while (k <= j) {
            val idx = base + k
            buffer.cnt(idx) += 1
            buffer.add(LaneXY, idx, scaled12(el(k) * el(j)))
            buffer.add(LaneX, idx, elScaled(k))
            buffer.add(LaneY, idx, elScaled(j))
            k += 1
          }
          j += 1
        }
      }
    }
    buffer
  }

  override def merge(buffer: Buf, other: Buf): Buf = {
    buffer.ensure(other.dim)
    var idx = 0
    while (idx < other.pairs) {
      buffer.cnt(idx) += other.cnt(idx)
      var lane = 0
      while (lane < 3) {
        buffer.addLong(lane, idx, other.lo(lane)(idx))
        if (other.hi(lane) != null && other.hi(lane)(idx) != null)
          buffer.addBig(lane, idx, other.hi(lane)(idx))
        lane += 1
      }
      idx += 1
    }
    buffer
  }

  override def eval(buffer: Buf): Any = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
    var j = 0
    while (j < buffer.dim) {
      val base = j * (j + 1) / 2
      var i = 0
      while (i <= j) {
        val idx = base + i
        val n = buffer.cnt(idx)
        if (n > 0) {
          val sxy = toDouble12(buffer.total(LaneXY, idx))
          val sx = toDouble12(buffer.total(LaneX, idx))
          val sy = toDouble12(buffer.total(LaneY, idx))
          val cov = round6(sxy / n - (sx / n) * (sy / n)) + 0.0
          rows += InternalRow(i, j, n, cov, round6(sx / n) + 0.0)
        }
        i += 1
      }
      j += 1
    }
    new GenericArrayData(rows.toArray)
  }

  override def serialize(buffer: Buf): Array[Byte] = {
    // size hint clamped: pairs*40 overflows Int past dim ~10k; the stream
    // still grows correctly, this only pre-sizes the first allocation
    val bos = new ByteArrayOutputStream(
      math.min(16L + buffer.pairs.toLong * 40L, 1L << 26).toInt)
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.dim)
    var idx = 0
    while (idx < buffer.pairs) {
      out.writeLong(buffer.cnt(idx))
      var lane = 0
      while (lane < 3) {
        out.writeLong(buffer.lo(lane)(idx))
        val big = if (buffer.hi(lane) == null) null else buffer.hi(lane)(idx)
        if (big == null) out.writeInt(0)
        else {
          val b = big.toByteArray
          out.writeInt(b.length)
          out.write(b)
        }
        lane += 1
      }
      idx += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new Buf
    buf.ensure(in.readInt())
    var idx = 0
    while (idx < buf.pairs) {
      buf.cnt(idx) = in.readLong()
      var lane = 0
      while (lane < 3) {
        buf.lo(lane)(idx) = in.readLong()
        val blen = in.readInt()
        if (blen > 0) {
          val b = new Array[Byte](blen)
          in.readFully(b)
          buf.addBig(lane, idx, new BigInteger(b))
        }
        lane += 1
      }
      idx += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType), StructField("j", IntegerType),
      StructField("n_vecs", LongType), StructField("cov", DoubleType),
      StructField("mean", DoubleType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cov_outer_sum requires array<double>, got $other")
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CovOuterSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovOuterSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CovOuterSumAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "cov_outer_sum"
}

object CovOuterSumAgg {

  private val LaneXY = 0
  private val LaneX = 1
  private val LaneY = 2

  /** Scale-12 unscaled value of Spark's double→DECIMAL(28,12) cast. */
  private def scaled12(v: Double): BigInteger =
    JBigDecimal.valueOf(v).setScale(12, RoundingMode.HALF_UP).unscaledValue()

  /** Decimal(scale 12) → double, as Spark's Decimal.toDouble. */
  private def toDouble12(unscaled: BigInteger): Double =
    new JBigDecimal(unscaled, 12).doubleValue()

  /** Spark's Round(double, 6): BigDecimal HALF_UP at scale 6. */
  private def round6(v: Double): Double =
    JBigDecimal.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue()

  /** Mutable triangle buffer: per-pair count plus three scale-12 sum
    * lanes, each a hot long lane with a lazily-allocated BigInteger
    * overflow lane. Column-major triangle indexing (append-only in j)
    * lets the buffer grow to the longest vector seen. */
  final class Buf {
    var dim: Int = 0
    var pairs: Int = 0
    var cnt: Array[Long] = Array.emptyLongArray
    val lo: Array[Array[Long]] = Array(Array.emptyLongArray, Array.emptyLongArray, Array.emptyLongArray)
    val hi: Array[Array[BigInteger]] = new Array[Array[BigInteger]](3)

    def ensure(newDim: Int): Unit = if (newDim > dim) {
      // Long arithmetic + explicit ceiling: past dim 65535 the Int
      // triangle size d(d+1)/2 overflows and would die as an opaque
      // NegativeArraySizeException; fail loudly with the real limit
      // instead (already ~68 GB of hot lanes at the bound — far past any
      // embedding width this aggregate is for).
      val longPairs = newDim.toLong * (newDim + 1L) / 2L
      require(longPairs <= Int.MaxValue,
        s"cov_outer_sum: vector dimension $newDim exceeds the supported " +
          s"maximum 65535 (triangle buffer of $longPairs pairs cannot be " +
          "indexed); reduce the embedding dimension or project first")
      val newPairs = longPairs.toInt
      cnt = java.util.Arrays.copyOf(cnt, newPairs)
      var lane = 0
      while (lane < 3) {
        lo(lane) = java.util.Arrays.copyOf(lo(lane), newPairs)
        if (hi(lane) != null) hi(lane) = java.util.Arrays.copyOf(hi(lane), newPairs)
        lane += 1
      }
      dim = newDim
      pairs = newPairs
    }

    def add(lane: Int, idx: Int, term: BigInteger): Unit =
      if (term.bitLength() < 63) addLong(lane, idx, term.longValueExact())
      else addBig(lane, idx, term)

    def addLong(lane: Int, idx: Int, v: Long): Unit =
      try lo(lane)(idx) = Math.addExact(lo(lane)(idx), v)
      catch {
        case _: ArithmeticException =>
          addBig(lane, idx, BigInteger.valueOf(lo(lane)(idx)))
          lo(lane)(idx) = v
      }

    def addBig(lane: Int, idx: Int, v: BigInteger): Unit = {
      if (hi(lane) == null) hi(lane) = new Array[BigInteger](pairs)
      val cur = hi(lane)(idx)
      hi(lane)(idx) = if (cur == null) v else cur.add(v)
    }

    def total(lane: Int, idx: Int): BigInteger = {
      val l = BigInteger.valueOf(lo(lane)(idx))
      val b = if (hi(lane) == null) null else hi(lane)(idx)
      if (b == null) l else b.add(l)
    }
  }

  /** Column API: the full covariance-matrix summary of an array<double>
    * column in one fixed-buffer aggregate. */
  def covOuterSum(vec: Column): Column =
    GraftShims.toColumn(CovOuterSumAgg(GraftShims.toExpression(vec))
      .toAggregateExpression())
}
