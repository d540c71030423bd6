package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-group heavy hitters (frequent items) via the SpaceSaving
  * summary (Metwally et al., "Efficient computation of frequent and
  * top-k elements in data streams").
  *
  * The exact formulation (`groupBy(group, item).count` then a top-k
  * window) shuffles one row per DISTINCT (group, item) — at 100 TB a
  * high-cardinality item column makes that intermediate bigger than
  * the answer by orders of magnitude. This aggregate keeps a BOUNDED
  * `capacity`-entry summary per group with map-side partial
  * aggregation, so the exchange carries at most groups·capacity
  * entries regardless of item cardinality.
  *
  * Guarantees (standard SpaceSaving): estimated count ≥ true count,
  * and estimate − err ≤ true count; any item with true count >
  * N/capacity is guaranteed present. When per-group distinct items ≤
  * capacity no eviction or trim ever fires and counts are EXACT —
  * that is the oracle-checkable regime the driver query runs in;
  * size `capacity` above the expected distinct count when exactness
  * matters. Merge sums per-item counts and errors and keeps the
  * `capacity` largest (mergeable-summaries style); a merge-trim
  * folds the largest trimmed estimate into every survivor's err, so
  * estimate − err ≤ true count holds in the distributed (post-merge)
  * case too, not just per-partition.
  *
  * Output: array<struct<item, cnt, err>> sorted by (cnt DESC, item
  * ASC) — a deterministic total order — truncated to `k`.
  */
object HeavyHittersAggregate {

  /** Bounded summary: a min-heap of (count) over `capacity` slots
    * plus an item→slot index, so increment/evict are O(log m) —
    * never the O(m) min-scan the naive HashMap version pays per
    * eviction.
    */
  final class Summary(val capacity: Int) {
    val items = new Array[String](capacity)
    val counts = new Array[Long](capacity)
    val errs = new Array[Long](capacity)
    var size = 0
    val pos = new mutable.HashMap[String, Int]

    private def less(a: Int, b: Int): Boolean = counts(a) < counts(b)

    private def swap(a: Int, b: Int): Unit = {
      val ti = items(a); val tc = counts(a); val te = errs(a)
      items(a) = items(b); counts(a) = counts(b); errs(a) = errs(b)
      items(b) = ti; counts(b) = tc; errs(b) = te
      pos(items(a)) = a
      pos(items(b)) = b
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0 && less(i, (i - 1) >> 1)) { swap(i, (i - 1) >> 1); i = (i - 1) >> 1 }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < size && less(l, m)) m = l
        if (r < size && less(r, m)) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }

    def add(item: String, count: Long, err: Long): Unit = pos.get(item) match {
      case Some(i) =>
        counts(i) += count
        errs(i) += err
        siftDown(i)
      case None if size < capacity =>
        val i = size
        items(i) = item; counts(i) = count; errs(i) = err
        pos(item) = i
        size += 1
        siftUp(i)
      case None =>
        // SpaceSaving eviction: the new item inherits the min slot's
        // count as its error bound
        val evictedCount = counts(0)
        pos.remove(items(0))
        items(0) = item
        errs(0) = evictedCount + err
        counts(0) = evictedCount + count
        pos(item) = 0
        siftDown(0)
    }

    def entries: IndexedSeq[(String, Long, Long)] =
      (0 until size).map(i => (items(i), counts(i), errs(i)))
  }

  case class HeavyHitters(
      item: Expression,
      capacity: Int,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0
  ) extends TypedImperativeAggregate[Summary] with ImplicitCastInputTypes {
    require(capacity >= 1, "capacity must be >= 1")
    require(k >= 1 && k <= capacity, "k must be in [1, capacity]")

    override def children: Seq[Expression] = Seq(item)
    // analysis inserts a cast for any castable item type (longs,
    // dates, ...) instead of a runtime ClassCastException. Return
    // type inferred: AbstractDataType is private[sql], but
    // Seq[DataType] satisfies the covariant override.
    override def inputTypes = Seq(StringType)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("item", StringType, nullable = false),
        StructField("cnt", LongType, nullable = false),
        StructField("err", LongType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "heavy_hitters"

    override def createAggregationBuffer(): Summary = new Summary(capacity)

    override def update(buf: Summary, input: InternalRow): Summary = {
      val v = item.eval(input)
      if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L, 0L)
      buf
    }

    override def merge(b1: Summary, b2: Summary): Summary = {
      if (b2.size == 0) return b1
      if (b1.size == 0) return b2
      // mergeable-summaries combine: sum counts/errs per item, keep
      // the capacity largest (ties: item asc, matching eval's order)
      val combined = new mutable.HashMap[String, (Long, Long)]
      b1.entries.foreach { case (it, c, e) => combined(it) = (c, e) }
      b2.entries.foreach { case (it, c, e) =>
        val (c0, e0) = combined.getOrElse(it, (0L, 0L))
        combined(it) = (c0 + c, e0 + e)
      }
      val sorted = combined.toIndexedSeq
        .map { case (it, (c, e)) => (it, c, e) }
        .sortBy { case (it, c, _) => (-c, it) }
      val kept = sorted.take(b1.capacity)
      // merge-trim absorbs the discarded mass into the survivors'
      // error (mergeable-summaries style): any trimmed item's true
      // count is ≤ the largest trimmed estimate, so widening every
      // survivor's err by it keeps est − err ≤ true count valid
      // across merges instead of silently lapsing after the first
      // trim
      val trimSlack = if (sorted.length > b1.capacity) sorted(b1.capacity)._2 else 0L
      val out = new Summary(b1.capacity)
      kept.foreach { case (it, c, e) => out.add(it, c, e + trimSlack) }
      out
    }

    override def eval(buf: Summary): Any = {
      val top = buf.entries.sortBy { case (it, c, _) => (-c, it) }.take(k)
      new GenericArrayData(top.map { case (it, c, e) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(it), c, e))
      }.toArray[Any])
    }

    override def serialize(buf: Summary): Array[Byte] = {
      val entryBytes = buf.entries.map { case (it, c, e) =>
        (it.getBytes(StandardCharsets.UTF_8), c, e)
      }
      val bb = ByteBuffer.allocate(8 + entryBytes.map(_._1.length + 20).sum)
      bb.putInt(buf.capacity)
      bb.putInt(entryBytes.length)
      entryBytes.foreach { case (b, c, e) =>
        bb.putInt(b.length); bb.put(b); bb.putLong(c); bb.putLong(e)
      }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Summary = {
      val bb = ByteBuffer.wrap(bytes)
      val cap = bb.getInt
      val n = bb.getInt
      val buf = new Summary(cap)
      var i = 0
      while (i < n) {
        val len = bb.getInt
        val b = new Array[Byte](len)
        bb.get(b)
        buf.add(new String(b, StandardCharsets.UTF_8), bb.getLong, bb.getLong)
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HeavyHitters =
      copy(item = newChildren(0))
  }

  /** array<struct<item,cnt,err>> of the k most frequent item values
    * per group (cnt desc, item asc), from a bounded
    * `capacity`-entry SpaceSaving summary.
    */
  def heavyHitters(item: Column, capacity: Int, k: Int): Column =
    ColumnBridge.column(
      HeavyHitters(ColumnBridge.expression(item), capacity, k).toAggregateExpression())
}
