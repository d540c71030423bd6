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

/** Bounded per-group top-k as a custom aggregate.
  *
  * The window formulation (`row_number() over (partition by g order
  * by score desc)` then `rank <= k`) shuffles and sorts EVERY
  * scored row. This aggregate keeps a bounded k-entry buffer per
  * group with map-side partial aggregation, so the exchange carries
  * at most groups·k entries per map task and nothing is globally
  * sorted — the shape that survives a 100 TB scored table. This is
  * also the streaming-friendly shape: the same bounded buffer works
  * as state in a streaming aggregation.
  *
  * Ordering: score DESC, then id ASC (deterministic ties) — the
  * same total order as the window formulation it replaces, so
  * results are byte-identical.
  */
object TopKAggregate {

  /** buffer entries = (score, id), kept sorted, at most k. */
  case class TopK(
      score: Expression,
      id: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0
  ) extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Long)]] {
    require(k >= 1, "k must be >= 1")

    override def children: Seq[Expression] = Seq(score, id)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("score", DoubleType, nullable = false),
        StructField("id", LongType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "top_k"

    override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Long)] =
      mutable.ArrayBuffer.empty[(Double, Long)]

    // insertion point under (score desc, id asc)
    private def insert(buf: mutable.ArrayBuffer[(Double, Long)], s: Double, i: Long): Unit = {
      if (buf.length == k) {
        val (ls, li) = buf.last
        if (s < ls || (s == ls && i >= li)) return
      }
      var lo = 0
      var hi = buf.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        val (ms, mi) = buf(mid)
        if (ms > s || (ms == s && mi < i)) lo = mid + 1 else hi = mid
      }
      buf.insert(lo, (s, i))
      if (buf.length > k) buf.remove(buf.length - 1)
    }

    override def update(buf: mutable.ArrayBuffer[(Double, Long)], input: InternalRow): mutable.ArrayBuffer[(Double, Long)] = {
      val s = score.eval(input)
      val i = id.eval(input)
      if (s != null && i != null) insert(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
      buf
    }

    override def merge(b1: mutable.ArrayBuffer[(Double, Long)], b2: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
      b2.foreach { case (s, i) => insert(b1, s, i) }
      b1
    }

    override def eval(buf: mutable.ArrayBuffer[(Double, Long)]): Any =
      new GenericArrayData(buf.map { case (s, i) =>
        new GenericInternalRow(Array[Any](s, i))
      }.toArray[Any])

    override def serialize(buf: mutable.ArrayBuffer[(Double, Long)]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + buf.length * 16)
      bb.putInt(buf.length)
      buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Long)] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new mutable.ArrayBuffer[(Double, Long)](n)
      var i = 0
      while (i < n) { buf += ((bb.getDouble, bb.getLong)); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): TopK =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopK =
      copy(score = newChildren(0), id = newChildren(1))
  }

  /** array<struct<score,id>> of the k highest-scored (ties by id
    * asc) rows per group.
    */
  def topK(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopK(ColumnBridge.expression(score), ColumnBridge.expression(id), k).toAggregateExpression())
}
