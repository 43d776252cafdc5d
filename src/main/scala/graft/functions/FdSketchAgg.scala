package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Frequent Directions matrix sketch (Liberty, KDD 2013; Ghashami,
  * Liberty, Phillips & Woodruff, SIAM J. Comput. 2016) — the
  * DETERMINISTIC mergeable low-rank summary of a row stream: a sketch B
  * of at most `ell` rows with the two-sided guarantee
  * 0 ⪯ AᵀA − BᵀB  and  ‖AᵀA − BᵀB‖₂ ≤ ‖A‖F² / ell.
  *
  * This is the path to covariance/PCA at embedding widths the exact
  * tiers cannot reach: [[CovOuterSumAgg]] carries a d(d+1)/2 triangle
  * buffer (quadratic in dimension — `Similarity.pcaTrain` gates at
  * dim 8192), while this buffer is 2·ell·d doubles (LINEAR in d), and
  * BᵀB approximates the uncentered second-moment matrix with the
  * spectral bound above — exactly what a top-k subspace needs, since
  * any direction x has xᵀAᵀAx − ‖A‖F²/ell ≤ xᵀBᵀBx ≤ xᵀAᵀAx.
  *
  * Algebra (the mergeable-summaries shape shared with [[MisraGriesAgg]]
  * and [[TopKPairsAgg]]): each partition folds its rows into a local
  * buffer of up to 2·ell rows; when the buffer fills it SHRINKS — SVD
  * via a Jacobi eigendecomposition of the SMALL 2ell×2ell Gram matrix
  * BBᵀ (never anything d-sized beyond the rows themselves), subtract
  * δ = σ_ell² from every squared singular value, rebuild the surviving
  * ≤ ell−1 rows in the right singular basis. merge() inserts the other
  * buffer's rows through the same insert/shrink loop — the Ghashami et
  * al. merge theorem says the bound SURVIVES arbitrary merge trees, so
  * partial aggregation is exactly the paper's distributed setting. The
  * RESULT depends on the partition/merge order (unlike the CMS/HLL
  * families there is no canonical fixed point), so the sketch is
  * spec-verified against its ERROR BOUND and PROPERTIES, not oracled
  * row-for-row — the reason this row is tests-only by construction.
  *
  * eval() shrinks once more to ≤ ell rows and emits them with their
  * squared norms, strongest direction first.
  * Output: array<struct<norm2 double, row array<double>>>. */
case class FdSketchAgg(
    child: Expression,
    ell: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FdSketchAgg.Buf] {

  import FdSketchAgg._

  require(ell >= 2 && ell <= 512,
    s"fd_sketch needs 2 <= ell <= 512 (buffer is 2*ell*d doubles), got $ell")

  override def createAggregationBuffer(): Buf = new Buf(ell)

  override def update(buffer: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val len = arr.numElements()
      if (len > 0) {
        val row = new Array[Double](len)
        var i = 0
        while (i < len) {
          require(!arr.isNullAt(i), "fd_sketch: null vector element")
          row(i) = arr.getDouble(i)
          i += 1
        }
        buffer.insert(row)
      }
    }
    buffer
  }

  override def merge(buffer: Buf, other: Buf): Buf = {
    var i = 0
    while (i < other.used) {
      buffer.insert(other.rows(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: Buf): Any = {
    buffer.shrinkTo(ell)
    val out = new Array[Any](buffer.used)
    var i = 0
    while (i < buffer.used) {
      val r = buffer.rows(i)
      var n2 = 0.0
      var j = 0
      while (j < r.length) { n2 += r(j) * r(j); j += 1 }
      out(i) = InternalRow(n2, new GenericArrayData(r.clone()))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Buf): Array[Byte] = {
    val dim = if (buffer.used == 0) 0 else buffer.rows(0).length
    val bos = new ByteArrayOutputStream(16 + buffer.used * dim * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.ell)
    out.writeInt(buffer.used)
    var i = 0
    while (i < buffer.used) {
      val r = buffer.rows(i)
      out.writeInt(r.length)
      var j = 0
      while (j < r.length) { out.writeDouble(r(j)); j += 1 }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new Buf(in.readInt())
    val used = in.readInt()
    var i = 0
    while (i < used) {
      val len = in.readInt()
      val r = new Array[Double](len)
      var j = 0
      while (j < len) { r(j) = in.readDouble(); j += 1 }
      buf.insertRaw(r) // already-shrunk rows: no re-shrink mid-restore
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("norm2", DoubleType),
      StructField("row", ArrayType(DoubleType, containsNull = false)))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fd_sketch requires array<double>, got $other")
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FdSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FdSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FdSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "fd_sketch"
}

object FdSketchAgg {

  /** Mutable FD buffer: up to 2·ell live rows; a full buffer shrinks to
    * ≤ ell−1 rows through the Gram-matrix SVD. */
  final class Buf(val ell: Int) {
    var rows: Array[Array[Double]] = new Array[Array[Double]](2 * ell)
    var used: Int = 0

    def insert(row: Array[Double]): Unit = {
      if (used == rows.length) shrinkTo(ell)
      insertRaw(row)
    }

    private[FdSketchAgg] def insertRaw(row: Array[Double]): Unit = {
      // ragged protection: FD needs one fixed width; pad shorter rows
      // (absent trailing components read 0, matching a ragged corpus's
      // zero-extension) and grow existing rows when a wider one arrives
      if (used > 0 && row.length != rows(0).length) {
        val w = math.max(row.length, rows(0).length)
        if (rows(0).length < w) {
          var i = 0
          while (i < used) { rows(i) = java.util.Arrays.copyOf(rows(i), w); i += 1 }
        }
        rows(used) = java.util.Arrays.copyOf(row, w)
      } else rows(used) = row
      used += 1
    }

    /** Shrink the buffer to at most `target` rows (FD deflation with
      * δ = σ_target²). No-op when already small enough. */
    def shrinkTo(target: Int): Unit = {
      if (used <= target) return
      val r = used
      val d = rows(0).length
      // small Gram matrix G = B·Bᵀ (r×r, r <= 2*ell)
      val g = Array.ofDim[Double](r, r)
      var i = 0
      while (i < r) {
        var j = i
        while (j < r) {
          var s = 0.0
          var k = 0
          val a = rows(i); val b = rows(j)
          while (k < d) { s += a(k) * b(k); k += 1 }
          g(i)(j) = s; g(j)(i) = s
          j += 1
        }
        i += 1
      }
      val (lambda, u) = jacobiEigen(g) // descending eigenvalues, column vectors
      val delta = if (target - 1 < r) math.max(lambda(target - 1), 0.0) else 0.0
      val kept = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      var k = 0
      while (k < math.min(target, r)) {
        val lam = lambda(k)
        val scaled = lam - delta
        if (scaled > 1e-12 && lam > 1e-12) {
          // row'_k = sqrt((λ_k − δ)/λ_k) · (u_kᵀ B)
          val f = math.sqrt(scaled / lam)
          val nr = new Array[Double](d)
          var j = 0
          while (j < r) {
            val w = u(j)(k)
            if (w != 0.0) {
              val src = rows(j)
              var c = 0
              while (c < d) { nr(c) += w * src(c); c += 1 }
            }
            j += 1
          }
          var c = 0
          while (c < d) { nr(c) *= f; c += 1 }
          kept += nr
        }
        k += 1
      }
      java.util.Arrays.fill(rows.asInstanceOf[Array[AnyRef]], null)
      used = 0
      kept.foreach { nr => rows(used) = nr; used += 1 }
    }
  }

  /** Cyclic Jacobi eigendecomposition of a small symmetric matrix —
    * deterministic sweep order, values returned DESCENDING with their
    * column eigenvectors. Sized for the 2·ell ≤ 1024 Gram matrices this
    * file builds; the d-sized work never comes near it. */
  private[graft] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = Array.tabulate(n, n)((i, j) => a0(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var frob2 = 0.0
    var fi = 0
    while (fi < n) {
      var fj = 0
      while (fj < n) { frob2 += a(fi)(fj) * a(fi)(fj); fj += 1 }
      fi += 1
    }
    val tol = 1e-26 * math.max(frob2, Double.MinPositiveValue)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > tol) {
      off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          off += apq * apq
          if (apq != 0.0 && apq * apq > tol / (n.toDouble * n)) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // sign convention must be +1 at theta == 0 (equal diagonals
            // need the full 45-degree rotation; signum(0) = 0 would skip it)
            val sg = if (theta >= 0.0) 1.0 else -1.0
            val t = sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => -a(i)(i))
    val lambda = order.map(i => a(i)(i)).toArray
    val u = Array.tabulate(n, n)((r, c) => v(r)(order(c)))
    (lambda, u)
  }

  /** Column API: the FD sketch of an array<double> column. */
  def fdSketch(vec: Column, ell: Int): Column =
    GraftShims.toColumn(FdSketchAgg(GraftShims.toExpression(vec), ell)
      .toAggregateExpression())
}
