package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the most
  * recent right row with rightTime <= leftTime, per key.
  *
  * Spark-first composition, NOT a range cross join: tag both
  * sides, UNION them, and carry right-side payloads forward with
  * `last_value(ignoreNulls)` over a (key, time) window. Cost is one
  * hash shuffle of |L|+|R| rows and a per-key sort — the same shape
  * as any windowed aggregation, so it scales to 100 TB the way a
  * range join (O(|L|·|R|) within key) cannot. Skewed keys are
  * AQE-splittable because the window partitions by key only.
  */
object AsofJoinOps {

  /** @param rightPayload right columns to carry (must not collide with left)
    * @param toleranceSeconds when set, a match only counts within
    *        `leftTime − rightTime ≤ tolerance` — the "most recent
    *        quote, but no staler than N" form every trading/telemetry
    *        as-of needs; beyond-tolerance rows keep the left side
    *        with null payload (still a LEFT join). Requires
    *        timestamp time columns. The gate is a per-row predicate
    *        on the carried right time AFTER the window fill — no
    *        extra shuffle.
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      toleranceSeconds: Option[Long] = None
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightPayload.forall(right.columns.contains), "missing right payload columns")
    require(rightPayload.intersect(leftCols).isEmpty, "right payload collides with left columns")
    // "__rt" is the tolerance-gate struct field riding alongside the
    // payload; a payload column by that name would make getField
    // ambiguous and the tolerance comparison wrong.
    require(!rightPayload.contains("__rt"), "right payload column name \"__rt\" is reserved")
    toleranceSeconds.foreach { tol =>
      require(tol > 0, s"tolerance must be positive, got $tol")
      require(left.schema(leftTime).dataType.typeName == "timestamp" &&
        right.schema(rightTime).dataType.typeName == "timestamp",
        "toleranceSeconds requires timestamp time columns")
    }
    if (rightPayload.isEmpty) return left

    // The payload travels as ONE struct so the most recent right ROW
    // wins as a unit — including its null members. Filling each
    // column independently would skip a matched row's null in favor
    // of an older non-null value and could mix values from
    // different right rows. The struct is non-null on every right
    // row (even when all members are null), so last(ignoreNulls)
    // means "last right row", exactly BroadcastAsofJoin's semantics.
    // The right event time rides along as `__rt` for the tolerance
    // gate.
    val payloadType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c).copy(name = c)) :+
        org.apache.spark.sql.types.StructField("__rt", right.schema(rightTime).dataType))

    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1)) // left sorts after right at equal time → inclusive (<=)
      .withColumn("__p", lit(null).cast(payloadType))

    val r = right
      .select((key +: rightTime +: rightPayload).distinct.map(col): _*)
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__p", struct(rightPayload.map(col) :+ col(rightTime).as("__rt"): _*))
    val rAligned = leftCols.filterNot(c => c == key).foldLeft(r)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val cols = leftCols ++ Seq("__p", "__t", "__side")
    val unioned = l.select(cols.map(col): _*).unionByName(rAligned.select(cols.map(col): _*))

    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned.withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    val gated = toleranceSeconds match {
      case Some(tol) => filled.withColumn("__p",
        when(unix_micros(col("__t").cast("timestamp")) -
          unix_micros(col("__p").getField("__rt")) <= tol * 1000000L, col("__p")))
      case None => filled
    }
    val unpacked = rightPayload.foldLeft(gated)((d, c) => d.withColumn(c, col("__p").getField(c)))
    unpacked.filter(col("__side") === 1).drop("__p", "__t", "__side")
  }
}
