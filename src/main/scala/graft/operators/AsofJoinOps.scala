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

  /** @param rightPayload right columns to carry (must not collide with left) */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightPayload.forall(right.columns.contains), "missing right payload columns")
    require(rightPayload.intersect(leftCols).isEmpty, "right payload collides with left columns")

    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1)) // left sorts after right at equal time → inclusive (<=)
    val lAligned = rightPayload.foldLeft(l)((d, c) => d.withColumn(c, lit(null).cast(right.schema(c).dataType)))

    val r = right
      .select((key +: rightTime +: rightPayload).distinct.map(col): _*)
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
    val rAligned = leftCols.filterNot(c => c == key).foldLeft(r)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val unioned = lAligned.select((leftCols ++ rightPayload ++ Seq("__t", "__side")).map(col): _*)
      .unionByName(rAligned.select((leftCols ++ rightPayload ++ Seq("__t", "__side")).map(col): _*))

    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = rightPayload.foldLeft(unioned)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    filled.filter(col("__side") === 1).drop("__t", "__side")
  }
}
