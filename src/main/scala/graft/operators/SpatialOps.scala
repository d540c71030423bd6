package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Planar spatial joins by uniform grid bucketing — "what's within
  * distance r" as a linear-shuffle HASH equi-join, never the naive
  * all-pairs scan (reference point-radius queries; same binning idea
  * as [[RangeJoinOps]], lifted to two dimensions).
  *
  * Cell side = `radius`, so any pair within `radius` differs by at
  * most one cell per axis: the right side expands to its 3×3 cell
  * neighborhood (a fixed 9× row fan-out — bounded, unlike a pair
  * fan-out), the join is a plain equi-join on the cell id, and an
  * exact `dx²+dy² ≤ r²` filter verifies candidates. Shuffle volume
  * is 9·|right| + |left| rows; candidate volume is bounded by local
  * point density, not |left|·|right|.
  *
  * Skew contract: a dense cell (urban-core clustering) is one hot
  * join key — a plain equi-join, so AQE's skew-join split applies;
  * for pathological single-cell density reduce `radius` (cells
  * shrink quadratically) or pre-aggregate the dense side.
  */
object SpatialOps {

  /** Join `left` points to all `right` points within `radius`
    * (Euclidean, inclusive). Both frames carry `xCol`/`yCol`;
    * `leftOut`/`rightOut` name the payload columns to keep (must be
    * disjoint). Emits `dist2` = squared distance — exact double
    * arithmetic, no square root (monotone in distance; callers
    * needing the metric take `sqrt` themselves).
    */
  def radiusJoin(
      left: DataFrame,
      right: DataFrame,
      xCol: String,
      yCol: String,
      radius: Double,
      leftOut: Seq[String],
      rightOut: Seq[String]
  ): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    require(leftOut.intersect(rightOut).isEmpty,
      s"output columns must be disjoint, both sides have ${leftOut.intersect(rightOut)}")
    def cellOf(c: Column): Column = floor(c / radius).cast("long")
    val l = left
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(leftOut.map(col) ++ Seq(
        col(xCol).as("__lx"), col(yCol).as("__ly"),
        cellOf(col(xCol)).as("__cx"), cellOf(col(yCol)).as("__cy")): _*)
    val neighborhood = typedlit((-1L to 1L).flatMap(dx => (-1L to 1L).map(dy => (dx, dy))))
    val r = right
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(rightOut.map(col) ++ Seq(
        col(xCol).as("__rx"), col(yCol).as("__ry"),
        cellOf(col(xCol)).as("__bx"), cellOf(col(yCol)).as("__by")): _*)
      .withColumn("__o", explode(neighborhood))
      .select(rightOut.map(col) ++ Seq(col("__rx"), col("__ry"),
        (col("__bx") + col("__o._1")).as("__cx"),
        (col("__by") + col("__o._2")).as("__cy")): _*)
    val dx = col("__lx") - col("__rx")
    val dy = col("__ly") - col("__ry")
    l.join(r, Seq("__cx", "__cy"))
      .withColumn("dist2", dx * dx + dy * dy)
      .filter(col("dist2") <= lit(radius * radius))
      .select((leftOut ++ rightOut).map(col) :+ col("dist2"): _*)
  }
}
