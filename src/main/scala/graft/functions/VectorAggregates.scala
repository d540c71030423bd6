package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Element-wise vector mean as a custom `TypedImperativeAggregate`
  * — per-group embedding centroids in ONE pass.
  *
  * The built-in alternative (`posexplode` → groupBy (key, dim) →
  * avg → re-collect) multiplies the shuffle by the vector
  * dimensionality (64-d embeddings → 64× rows). This aggregate
  * keeps a single running (sums, count) buffer per group: map-side
  * partial aggregation reduces every partition to one buffer per
  * group BEFORE the shuffle, so the exchanged bytes are
  * O(groups·dim), independent of row count — the shape that
  * survives 100 TB.
  */
object VectorAggregates {

  /** buffer = sums(dim) :+ count */
  case class VecMean(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0
  ) extends TypedImperativeAggregate[Array[Double]] {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = true
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "vec_mean"

    private lazy val elemIsFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def createAggregationBuffer(): Array[Double] = Array.empty[Double]

    override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
      val v = child.eval(input)
      if (v == null) return buffer
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val buf = if (buffer.isEmpty) new Array[Double](n + 1) else buffer
      require(buf.length == n + 1, s"inconsistent vector dimension: ${buf.length - 1} vs $n")
      var i = 0
      while (i < n) {
        buf(i) += (if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        i += 1
      }
      buf(n) += 1
      buf
    }

    override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
      if (b1.isEmpty) return b2
      if (b2.isEmpty) return b1
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

    override def eval(buffer: Array[Double]): Any = {
      if (buffer.isEmpty || buffer.last == 0) return null
      val n = buffer.length - 1
      val count = buffer(n)
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = buffer(i) / count; i += 1 }
      new GenericArrayData(out)
    }

    override def serialize(buffer: Array[Double]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + buffer.length * 8)
      bb.putInt(buffer.length)
      buffer.foreach(bb.putDouble)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Double] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      Array.fill(n)(bb.getDouble)
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): VecMean =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): VecMean =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VecMean =
      copy(child = newChildren.head)
  }

  def vecMean(vec: Column): Column =
    ColumnBridge.column(VecMean(ColumnBridge.expression(vec)).toAggregateExpression())
}
