package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bucket-local pair enumeration for the dedup/similarity family.
  *
  * The r1 shape for every bucketed candidate join was: bucket-size
  * groupBy → left-semi prune → two-branch self-join on the bucket
  * key → filter. That is 3-4 full-table shuffles. The r2 shape is
  * ONE shuffle: `groupBy(bucket).agg(cappedCollectList(...))`
  * followed by a pair-emitting [[Generator]] that fuses the verify
  * predicate (hamming / cosine / length filter) into the bucket
  * scan — only verified pairs are ever materialized as rows.
  *
  * Memory safety at 100 TB: [[CappedCollectList]] never buffers more
  * than `cap` elements per group (degenerate buckets — empty docs,
  * boilerplate — overflow the cap and are dropped by the caller's
  * `size(m) <= maxBucket` filter, the standard LSH skew guard), so
  * a 100M-row pathological bucket costs cap elements of memory, not
  * an OOM. The quadratic pair scan is bounded by cap² per bucket —
  * the same bound the join shape had, paid in a tight loop instead
  * of a shuffle.
  */
object PairGenerators {

  /** collect_list that stops collecting at `cap` elements per
    * group. Callers pass cap = maxBucket+1 and filter
    * `size(m) <= maxBucket`: a group whose true size exceeds the
    * cap always surfaces with exactly cap elements (partials cap
    * individually, merges re-cap), so the filter sees it and drops
    * it — identical semantics to the count-then-semi-join prune,
    * without the extra aggregation + join.
    */
  case class CappedCollectList(
      child: Expression,
      cap: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0
  ) extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]] {
    require(cap >= 1, "cap must be >= 1")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
    override def prettyName: String = "capped_collect_list"

    override def createAggregationBuffer(): mutable.ArrayBuffer[Any] = mutable.ArrayBuffer.empty[Any]

    override def update(buf: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
      if (buf.length < cap) {
        val v = child.eval(input)
        if (v != null) buf += InternalRow.copyValue(v)
      }
      buf
    }

    override def merge(b1: mutable.ArrayBuffer[Any], b2: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
      var i = 0
      while (b1.length < cap && i < b2.length) { b1 += b2(i); i += 1 }
      b1
    }

    override def eval(buf: mutable.ArrayBuffer[Any]): Any = new GenericArrayData(buf.toArray)

    // element-wise UnsafeRow framing; instance-cached projection
    // (the same pattern Spark's own Collect aggregate uses) — with
    // high-cardinality groups serialize runs per group, so a
    // per-call create would hammer the codegen cache
    @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))

    override def serialize(buf: mutable.ArrayBuffer[Any]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val d = new DataOutputStream(out)
      d.writeInt(buf.length)
      val row = new GenericInternalRow(1)
      buf.foreach { v =>
        row.update(0, v)
        val bytes = proj(row).getBytes
        d.writeInt(bytes.length)
        d.write(bytes)
      }
      d.flush()
      out.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new mutable.ArrayBuffer[Any](n)
      val ur = new UnsafeRow(1)
      var i = 0
      while (i < n) {
        val len = bb.getInt
        val arr = new Array[Byte](len)
        bb.get(arr)
        ur.pointTo(arr, len)
        buf += InternalRow.copyValue(ur.get(0, child.dataType))
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectList =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectList =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CappedCollectList =
      copy(child = newChildren.head)
  }

  /** collect_set that stops collecting at `cap` DISTINCT elements
    * per group — the set twin of [[CappedCollectList]] for inputs
    * that repeat within a group (co-occurrence baskets, event
    * streams). Same sentinel contract: a group whose true distinct
    * size exceeds the cap always surfaces with exactly cap elements
    * (if a merged buffer is under cap, every partial was absorbed
    * whole, i.e. the buffer IS the full distinct set), so callers
    * pass cap = maxGroupSize+1 and filter `size(m) <= maxGroupSize`.
    * Memory per group is O(cap) regardless of group size or
    * duplication factor.
    */
  case class CappedCollectSet(
      child: Expression,
      cap: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0
  ) extends TypedImperativeAggregate[mutable.LinkedHashSet[Any]] {
    require(cap >= 1, "cap must be >= 1")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
    override def prettyName: String = "capped_collect_set"

    override def createAggregationBuffer(): mutable.LinkedHashSet[Any] = mutable.LinkedHashSet.empty[Any]

    override def update(buf: mutable.LinkedHashSet[Any], input: InternalRow): mutable.LinkedHashSet[Any] = {
      if (buf.size < cap) {
        val v = child.eval(input)
        if (v != null) buf += InternalRow.copyValue(v)
      }
      buf
    }

    override def merge(b1: mutable.LinkedHashSet[Any], b2: mutable.LinkedHashSet[Any]): mutable.LinkedHashSet[Any] = {
      val it = b2.iterator
      while (b1.size < cap && it.hasNext) b1 += it.next()
      b1
    }

    override def eval(buf: mutable.LinkedHashSet[Any]): Any = new GenericArrayData(buf.toArray)

    @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))

    override def serialize(buf: mutable.LinkedHashSet[Any]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val d = new DataOutputStream(out)
      d.writeInt(buf.size)
      val row = new GenericInternalRow(1)
      buf.foreach { v =>
        row.update(0, v)
        val bytes = proj(row).getBytes
        d.writeInt(bytes.length)
        d.write(bytes)
      }
      d.flush()
      out.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): mutable.LinkedHashSet[Any] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = mutable.LinkedHashSet.empty[Any]
      val ur = new UnsafeRow(1)
      var i = 0
      while (i < n) {
        val len = bb.getInt
        val arr = new Array[Byte](len)
        bb.get(arr)
        ur.pointTo(arr, len)
        buf += InternalRow.copyValue(ur.get(0, child.dataType))
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectSet =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectSet =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CappedCollectSet =
      copy(child = newChildren.head)
  }

  /** (id_a, id_b, hamming) for every member pair within
    * `maxHamming`; input array<struct<id: long, sig: long>>.
    */
  case class HammingPairs(child: Expression, maxHamming: Int)
      extends UnaryExpression
      with Generator
      with CodegenFallback {
    override def elementSchema: StructType = StructType(Seq(
      StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false),
      StructField("hamming", IntegerType, nullable = false)))
    override def prettyName: String = "hamming_pairs"
    override protected def withNewChildInternal(newChild: Expression): HammingPairs = copy(child = newChild)

    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val arr = child.eval(input).asInstanceOf[ArrayData]
      if (arr == null) return Iterator.empty
      val n = arr.numElements()
      if (n < 2) return Iterator.empty
      val ids = new Array[Long](n)
      val sigs = new Array[Long](n)
      var i = 0
      while (i < n) {
        val r = arr.getStruct(i, 2)
        ids(i) = r.getLong(0); sigs(i) = r.getLong(1)
        i += 1
      }
      val out = mutable.ArrayBuffer.empty[InternalRow]
      i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          val h = java.lang.Long.bitCount(sigs(i) ^ sigs(j))
          if (h <= maxHamming && ids(i) != ids(j)) {
            val (a, b) = if (ids(i) < ids(j)) (ids(i), ids(j)) else (ids(j), ids(i))
            out += new GenericInternalRow(Array[Any](a, b, h))
          }
          j += 1
        }
        i += 1
      }
      out
    }
  }

  /** (id_a, id_b, cosine) for every member pair with cosine >=
    * threshold; input array<struct<id: long, v: array<float|double>>>.
    * Norms are computed once per member, not per pair.
    */
  case class CosinePairs(child: Expression, threshold: Double)
      extends UnaryExpression
      with Generator
      with CodegenFallback {
    override def elementSchema: StructType = StructType(Seq(
      StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false),
      StructField("cosine", DoubleType, nullable = false)))
    override def prettyName: String = "cosine_pairs"
    override protected def withNewChildInternal(newChild: Expression): CosinePairs = copy(child = newChild)

    private lazy val elemIsFloat = {
      val st = child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
      st.fields(1).dataType.asInstanceOf[ArrayType].elementType == FloatType
    }

    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val arr = child.eval(input).asInstanceOf[ArrayData]
      if (arr == null) return Iterator.empty
      val n = arr.numElements()
      if (n < 2) return Iterator.empty
      val ids = new Array[Long](n)
      val vecs = new Array[Array[Double]](n)
      val norms = new Array[Double](n)
      var i = 0
      while (i < n) {
        val r = arr.getStruct(i, 2)
        ids(i) = r.getLong(0)
        val v = r.getArray(1)
        val d = v.numElements()
        val xs = new Array[Double](d)
        var k = 0
        var nn = 0.0
        while (k < d) {
          val x = if (elemIsFloat) v.getFloat(k).toDouble else v.getDouble(k)
          xs(k) = x; nn += x * x
          k += 1
        }
        vecs(i) = xs; norms(i) = math.sqrt(nn)
        i += 1
      }
      val out = mutable.ArrayBuffer.empty[InternalRow]
      i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          if (ids(i) != ids(j)) {
            val xi = vecs(i); val xj = vecs(j)
            val d = math.min(xi.length, xj.length)
            var dot = 0.0
            var k = 0
            while (k < d) { dot += xi(k) * xj(k); k += 1 }
            val cos = dot / (norms(i) * norms(j))
            if (cos >= threshold) {
              val (a, b) = if (ids(i) < ids(j)) (ids(i), ids(j)) else (ids(j), ids(i))
              out += new GenericInternalRow(Array[Any](a, b, cos))
            }
          }
          j += 1
        }
        i += 1
      }
      out
    }
  }

  /** (id_a, id_b) for every member pair; input array<long>. */
  case class IdPairs(child: Expression)
      extends UnaryExpression
      with Generator
      with CodegenFallback {
    override def elementSchema: StructType = StructType(Seq(
      StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false)))
    override def prettyName: String = "id_pairs"
    override protected def withNewChildInternal(newChild: Expression): IdPairs = copy(child = newChild)

    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val arr = child.eval(input).asInstanceOf[ArrayData]
      if (arr == null) return Iterator.empty
      val n = arr.numElements()
      if (n < 2) return Iterator.empty
      val ids = arr.toLongArray()
      val out = mutable.ArrayBuffer.empty[InternalRow]
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          if (ids(i) != ids(j)) {
            val (a, b) = if (ids(i) < ids(j)) (ids(i), ids(j)) else (ids(j), ids(i))
            out += new GenericInternalRow(Array[Any](a, b))
          }
          j += 1
        }
        i += 1
      }
      out
    }
  }

  /** (id_a, id_b) for member pairs passing the PPJoin length filter
    * t·len_b <= len_a && t·len_a <= len_b; input
    * array<struct<id: long, len: int>>.
    */
  case class IdLenPairs(child: Expression, threshold: Double)
      extends UnaryExpression
      with Generator
      with CodegenFallback {
    override def elementSchema: StructType = StructType(Seq(
      StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false)))
    override def prettyName: String = "id_len_pairs"
    override protected def withNewChildInternal(newChild: Expression): IdLenPairs = copy(child = newChild)

    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val arr = child.eval(input).asInstanceOf[ArrayData]
      if (arr == null) return Iterator.empty
      val n = arr.numElements()
      if (n < 2) return Iterator.empty
      val ids = new Array[Long](n)
      val lens = new Array[Int](n)
      var i = 0
      while (i < n) {
        val r = arr.getStruct(i, 2)
        ids(i) = r.getLong(0); lens(i) = r.getInt(1)
        i += 1
      }
      val out = mutable.ArrayBuffer.empty[InternalRow]
      i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          if (ids(i) != ids(j) &&
            lens(i) >= threshold * lens(j) && lens(j) >= threshold * lens(i)) {
            val (a, b) = if (ids(i) < ids(j)) (ids(i), ids(j)) else (ids(j), ids(i))
            out += new GenericInternalRow(Array[Any](a, b))
          }
          j += 1
        }
        i += 1
      }
      out
    }
  }

  // ---- Column wrappers ----------------------------------------------------

  def cappedCollectList(e: Column, cap: Int): Column =
    ColumnBridge.column(CappedCollectList(ColumnBridge.expression(e), cap).toAggregateExpression())

  def cappedCollectSet(e: Column, cap: Int): Column =
    ColumnBridge.column(CappedCollectSet(ColumnBridge.expression(e), cap).toAggregateExpression())

  def hammingPairs(members: Column, maxHamming: Int): Column =
    ColumnBridge.column(HammingPairs(ColumnBridge.expression(members), maxHamming))

  def cosinePairs(members: Column, threshold: Double): Column =
    ColumnBridge.column(CosinePairs(ColumnBridge.expression(members), threshold))

  def idPairs(members: Column): Column =
    ColumnBridge.column(IdPairs(ColumnBridge.expression(members)))

  def idLenPairs(members: Column, threshold: Double): Column =
    ColumnBridge.column(IdLenPairs(ColumnBridge.expression(members), threshold))
}
