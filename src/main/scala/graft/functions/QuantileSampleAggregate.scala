package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded bottom-k-by-rank VALUE sample as a custom aggregate — the
  * state kernel of [[graft.operators.SketchOps.quantileSampleSketch]].
  *
  * Keeps the k (rank, value) pairs with the SMALLEST ranks per
  * group, where rank is a row-unique md5-derived 52-bit integer:
  * the kept values are a uniform row sample whose selection is a
  * pure function of the data (no RNG, no partition-order
  * dependence), so the sketch is bit-identical across engines,
  * partitionings and merge orders — a semilattice (bottom-k of a
  * union = bottom-k of the bottom-k's), which is what makes shard
  * sketches mergeable after the fact.
  *
  * The window formulation (`row_number() over (order by rank)` then
  * `rn <= k`) shuffles and sorts EVERY row; this buffer caps the
  * exchange at groups·k entries per map task with map-side partial
  * aggregation — the shape that survives a 100 TB value column. The
  * same bounded buffer works as streaming aggregation state
  * (per-window quantile sketches).
  *
  * Ordering: rank ASC, then value ASC (deterministic ties, though
  * ranks are row-unique by construction).
  */
object QuantileSampleAggregate {

  /** buffer entries = (rank, value), kept sorted, at most k. */
  case class BottomKSample(
      rank: Expression,
      value: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0
  ) extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Double)]] {
    require(k >= 1, "k must be >= 1")

    override def children: Seq[Expression] = Seq(rank, value)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("r", LongType, nullable = false),
        StructField("v", DoubleType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "bottom_k_sample"

    override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Double)] =
      mutable.ArrayBuffer.empty[(Long, Double)]

    // insertion point under (rank asc, value asc)
    private def insert(buf: mutable.ArrayBuffer[(Long, Double)], r: Long, v: Double): Unit = {
      if (buf.length == k) {
        val (lr, lv) = buf.last
        if (r > lr || (r == lr && v >= lv)) return
      }
      var lo = 0
      var hi = buf.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        val (mr, mv) = buf(mid)
        if (mr < r || (mr == r && mv <= v)) lo = mid + 1 else hi = mid
      }
      buf.insert(lo, (r, v))
      if (buf.length > k) buf.remove(buf.length - 1)
    }

    override def update(buf: mutable.ArrayBuffer[(Long, Double)], input: InternalRow): mutable.ArrayBuffer[(Long, Double)] = {
      val r = rank.eval(input)
      val v = value.eval(input)
      if (r != null && v != null) insert(buf, r.asInstanceOf[Long], v.asInstanceOf[Double])
      buf
    }

    override def merge(b1: mutable.ArrayBuffer[(Long, Double)], b2: mutable.ArrayBuffer[(Long, Double)]): mutable.ArrayBuffer[(Long, Double)] = {
      b2.foreach { case (r, v) => insert(b1, r, v) }
      b1
    }

    override def eval(buf: mutable.ArrayBuffer[(Long, Double)]): Any =
      new GenericArrayData(buf.map { case (r, v) =>
        new GenericInternalRow(Array[Any](r, v))
      }.toArray[Any])

    override def serialize(buf: mutable.ArrayBuffer[(Long, Double)]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + buf.length * 16)
      bb.putInt(buf.length)
      buf.foreach { case (r, v) => bb.putLong(r); bb.putDouble(v) }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Double)] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new mutable.ArrayBuffer[(Long, Double)](n)
      var i = 0
      while (i < n) { buf += ((bb.getLong, bb.getDouble)); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BottomKSample =
      copy(rank = newChildren(0), value = newChildren(1))
  }

  /** array<struct<r,v>> of the k smallest-ranked (ties by value asc)
    * rows per group, sorted by (r, v).
    */
  def bottomKSample(rank: Column, value: Column, k: Int): Column =
    ColumnBridge.column(
      BottomKSample(ColumnBridge.expression(rank), ColumnBridge.expression(value), k)
        .toAggregateExpression())
}
