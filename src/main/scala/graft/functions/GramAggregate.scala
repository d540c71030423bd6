package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Second-moment (Gram) accumulator over a vector column — the ONE
  * aggregation PCA/covariance needs at 100 TB: every partition
  * collapses to `1 + d + d(d+1)/2` doubles (count, per-dim sums,
  * upper-triangular ΣxᵢxⱼT) before the shuffle, merges are flat
  * vector adds, and only that fixed-size state ever reaches the
  * driver — no row blowup (the posexplode-pairs alternative shuffles
  * d² rows PER INPUT ROW), no driver collect of data.
  *
  * Buffer layout (also the emitted array<double>):
  * `[n, s_0..s_{d-1}, ss_00, ss_01, .., ss_0(d-1), ss_11, ..]` —
  * upper triangle row-major. Null vectors skip; a vector of the
  * wrong length is an error (upstream schema bug, not data noise).
  */
object GramAggregate {

  case class GramMatrix(
      child: Expression,
      dim: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0
  ) extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {
    require(dim >= 1, s"dim must be >= 1, got $dim")

    private val len = 1 + dim + dim * (dim + 1) / 2

    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "gram_matrix"

    private lazy val elemIsFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def createAggregationBuffer(): Array[Double] = new Array[Double](len)

    override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
      val v = child.eval(input)
      if (v == null) return buf
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      require(d == dim, s"gram_matrix(dim=$dim) got a vector of length $d")
      val xs = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        xs(i) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      buf(0) += 1.0
      i = 0
      var off = 1 + dim
      while (i < dim) {
        buf(1 + i) += xs(i)
        var j = i
        while (j < dim) {
          buf(off) += xs(i) * xs(j)
          off += 1; j += 1
        }
        i += 1
      }
      buf
    }

    override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
      var i = 0
      while (i < len) { b1(i) += b2(i); i += 1 }
      b1
    }

    override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

    override def serialize(buf: Array[Double]): Array[Byte] = {
      val bb = ByteBuffer.allocate(len * 8)
      var i = 0
      while (i < len) { bb.putDouble(buf(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Double] = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new Array[Double](len)
      var i = 0
      while (i < len) { buf(i) = bb.getDouble; i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrix =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): GramMatrix =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): GramMatrix =
      copy(child = newChild)
  }

  /** Gram/second-moment state of vector column `c` (length `dim`). */
  def gramMatrix(c: Column, dim: Int): Column =
    ColumnBridge.column(GramMatrix(ColumnBridge.expression(c), dim).toAggregateExpression())
}
