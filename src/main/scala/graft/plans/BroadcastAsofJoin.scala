package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Broadcast as-of join as a full custom operator:
  * `LogicalPlan` node → planner `Strategy` → `SparkPlan`.
  *
  * Motivation: [[graft.operators.AsofJoinOps.asofBackward]] (the
  * compositional union+window form) must SHUFFLE BOTH SIDES by key.
  * When the right side is dimension-sized (price histories, config
  * timelines — thousands to low millions of rows), the optimal plan
  * is the one Spark cannot express with built-ins: broadcast the
  * right side as per-key time-sorted arrays and stream the fact
  * side through a binary search per row — ZERO shuffle, zero sort
  * of the fact table. This is whole-operator semantics (a new join
  * type), hence preference rung (c): logical node + strategy +
  * physical node, registered via
  * `SparkSessionExtensions.injectPlannerStrategy`.
  *
  * Semantics match `asofBackward`: for each left row, the right row
  * with the greatest rightTime <= leftTime within the same key;
  * payload columns null when no such row. Inclusive at equality.
  */
object BroadcastAsofJoin {

  final case class AsofNode(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKey: Attribute,
      leftTime: Attribute,
      rightKey: Attribute,
      rightTime: Attribute,
      rightPayload: Seq[Attribute]
  ) extends BinaryNode {
    override def output: Seq[Attribute] = left.output ++ rightPayload.map(_.withNullability(true))
    override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsofNode =
      copy(left = l, right = r)
  }

  object AsofStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsofNode(l, r, lk, lt, rk, rt, payload) =>
        AsofExec(planLater(l), planLater(r), lk, lt, rk, rt, payload) :: Nil
      case _ => Nil
    }
  }

  /** Spec of how to turn the broadcast build-side rows into the
    * asof lookup index: key → (sorted times, payload rows).
    */
  final case class AsofIndexSpec(
      keyOrd: Int,
      timeOrd: Int,
      payloadOrds: Seq[Int],
      keyType: DataType,
      timeType: DataType,
      payloadTypes: Seq[DataType]
  ) extends Serializable {
    def build(rows: Array[InternalRow]): java.util.HashMap[Any, (Array[Long], Array[Array[Any]])] = {
      val byKey = new java.util.HashMap[Any, (Array[Long], Array[Array[Any]])]()
      val grouped = rows.iterator
        .filterNot(r => r.isNullAt(keyOrd) || r.isNullAt(timeOrd))
        .map { r =>
          val k = InternalRow.copyValue(r.get(keyOrd, keyType))
          val t = AsofExec.timeAsLong(r.get(timeOrd, timeType))
          val p = payloadOrds.zip(payloadTypes).map { case (o, dt) =>
            if (r.isNullAt(o)) null else InternalRow.copyValue(r.get(o, dt))
          }.toArray
          (k, t, p)
        }
        .toSeq
        .groupBy(_._1)
      grouped.foreach { case (k, rs) =>
        val sorted = rs.sortBy(_._2)
        byKey.put(k, (sorted.map(_._2).toArray, sorted.map(_._3).toArray))
      }
      byKey
    }
  }

  object AsofExec {
    private[plans] def timeAsLong(v: Any): Long = v match {
      case l: java.lang.Long    => l
      case i: java.lang.Integer => i.toLong
      case other                => throw new IllegalArgumentException(s"unsupported time type ${other.getClass}")
    }

    /** Per-executor memo of built indexes, keyed by (broadcast id,
      * index spec) — ReuseExchange can hand the SAME broadcast id to
      * two AsofExec nodes with different key/time/payload specs
      * (identical build side, different join columns), so the spec
      * must be part of the key. The index is built once per
      * executor per spec (not per task). Bounded LRU; entries are
      * tiny relative to the broadcast rows themselves, which the
      * BlockManager already manages.
      */
    private val indexCache =
      new java.util.LinkedHashMap[(Long, AsofIndexSpec), java.util.HashMap[Any, (Array[Long], Array[Array[Any]])]](
        16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(Long, AsofIndexSpec), java.util.HashMap[Any, (Array[Long], Array[Array[Any]])]]): Boolean =
          size() > 32
      }

    private[plans] def indexFor(
        bcastId: Long,
        rows: => Array[InternalRow],
        spec: AsofIndexSpec): java.util.HashMap[Any, (Array[Long], Array[Array[Any]])] =
      indexCache.synchronized {
        val key = (bcastId, spec)
        val hit = indexCache.get(key)
        if (hit != null) hit
        else {
          val built = spec.build(rows)
          indexCache.put(key, built)
          built
        }
      }
  }

  final case class AsofExec(
      left: SparkPlan,
      right: SparkPlan,
      leftKey: Attribute,
      leftTime: Attribute,
      rightKey: Attribute,
      rightTime: Attribute,
      rightPayload: Seq[Attribute]
  ) extends BinaryExecNode {
    override def output: Seq[Attribute] = left.output ++ rightPayload.map(_.withNullability(true))
    override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsofExec =
      copy(left = l, right = r)

    private lazy val indexSpec: AsofIndexSpec = {
      val rOut = right.output
      val rKeyOrd = rOut.indexWhere(_.exprId == rightKey.exprId)
      val rTimeOrd = rOut.indexWhere(_.exprId == rightTime.exprId)
      val payloadOrds = rightPayload.map(p => rOut.indexWhere(_.exprId == p.exprId))
      require(rKeyOrd >= 0 && rTimeOrd >= 0 && payloadOrds.forall(_ >= 0), "unresolved asof attributes")
      AsofIndexSpec(rKeyOrd, rTimeOrd, payloadOrds, rightKey.dataType, rightTime.dataType,
        rightPayload.map(_.dataType))
    }

    // EnsureRequirements inserts BroadcastExchangeExec(IdentityBroadcastMode,
    // right) — Spark's own exchange, so AQE sizes it against the
    // broadcast limits, the collect runs on the exchange thread
    // pool, and ReuseExchange dedups identical build sides across
    // the plan. The per-key sorted index is built from the
    // broadcast rows once per EXECUTOR (memoized), not per task.
    override def requiredChildDistribution: Seq[Distribution] =
      Seq(UnspecifiedDistribution,
        BroadcastDistribution(org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode))

    override protected def doExecute(): RDD[InternalRow] = {
      val bcast = right.executeBroadcast[Array[InternalRow]]()
      val spec = indexSpec

      // ---- stream side ----
      val lOut = left.output
      val lKeyOrd = lOut.indexWhere(_.exprId == leftKey.exprId)
      val lTimeOrd = lOut.indexWhere(_.exprId == leftTime.exprId)
      require(lKeyOrd >= 0 && lTimeOrd >= 0, "unresolved asof left attributes")
      val lKeyType = leftKey.dataType
      val lTimeType = leftTime.dataType
      val nLeft = lOut.size
      val nPay = rightPayload.size
      val outAttrs = output

      left.execute().mapPartitions({ iter =>
        val lookup = AsofExec.indexFor(bcast.id, bcast.value, spec)
        val proj = UnsafeProjection.create(outAttrs.map(_.dataType).toArray)
        val joined = new GenericInternalRow(nLeft + nPay)
        iter.map { row =>
          var i = 0
          while (i < nLeft) { joined.update(i, row.get(i, lOut(i).dataType)); i += 1 }
          var matched: Array[Any] = null
          if (!row.isNullAt(lKeyOrd) && !row.isNullAt(lTimeOrd)) {
            val entry = lookup.get(row.get(lKeyOrd, lKeyType))
            if (entry != null) {
              val t = timeAsLong(row.get(lTimeOrd, lTimeType))
              val idx = floorIndex(entry._1, t)
              if (idx >= 0) matched = entry._2(idx)
            }
          }
          var j = 0
          while (j < nPay) {
            joined.update(nLeft + j, if (matched == null) null else matched(j))
            j += 1
          }
          proj(joined)
        }
      }, preservesPartitioning = true)
    }

    /** greatest index with times(i) <= t, or -1 */
    private def floorIndex(times: Array[Long], t: Long): Int = {
      var lo = 0; var hi = times.length - 1; var ans = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (times(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
      }
      ans
    }

    private def timeAsLong(v: Any): Long = AsofExec.timeAsLong(v)
  }

  /** API: `asofBroadcast(left, right, key, leftTime, rightTime,
    * payload)` — same signature family as AsofJoinOps. Time columns
    * must be timestamp (micros long internally) or integral.
    */
  def asofBroadcast(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String]
  ): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = ColumnBridge.logicalPlan(left)
    val rPlan = ColumnBridge.logicalPlan(right)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(s"no column $name"))
    val lt = attr(lPlan, leftTime)
    val rt = attr(rPlan, rightTime)
    // The physical comparison is on RAW internal longs (timestamp =
    // micros, date = days, integrals = verbatim) — a DateType side
    // against a TimestampType side would silently compare days to
    // micros and "match" garbage. Require one unit family; callers
    // with mixed types cast explicitly (date → timestamp) first.
    def family(dt: DataType): String = dt match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => "timestamp (µs)"
      case org.apache.spark.sql.types.DateType => "date (days)"
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType => "integral"
      case other =>
        throw new IllegalArgumentException(s"unsupported asof time type $other for $leftTime/$rightTime")
    }
    val (lf, rf) = (family(lt.dataType), family(rt.dataType))
    require(lf == rf,
      s"asof time columns must share a unit family: $leftTime is ${lt.dataType} [$lf], " +
        s"$rightTime is ${rt.dataType} [$rf] — cast one side first (e.g. date → timestamp)")
    val node = AsofNode(
      lPlan, rPlan,
      attr(lPlan, key), lt,
      attr(rPlan, key), rt,
      rightPayload.map(attr(rPlan, _))
    )
    ColumnBridge.ofRows(spark, node)
  }

  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotently add the strategy to an existing session (the
    * extensions path does this at build time for new sessions).
    */
  def ensureStrategy(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ AsofStrategy
    }
}
