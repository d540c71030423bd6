package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range joins — the non-equi join family Spark plans as a
  * BroadcastNestedLoopJoin (or worse, a CartesianProduct) when
  * written as a theta join. Re-expressed as an EQUI join on bin ids:
  * each interval explodes to the ⌈span/binWidth⌉ bins it covers,
  * each point maps to exactly ONE bin, and the residual range
  * predicate is verified inside the hash join. Shuffle volume is
  * O(|intervals| · avgSpan/binWidth + |points|) small rows — never
  * the O(n·m) pair space a nested-loop join scans — and both sides
  * hash-partition on the bin key, so the join parallelizes across
  * the cluster like any equi join (AQE can still broadcast the
  * exploded interval side when it is small).
  *
  * Reference semantics: plain SQL `point BETWEEN lo AND hi` /
  * interval-overlap predicates (the oracle replays them verbatim in
  * DuckDB); the binning is invisible in the result.
  *
  * binWidth is the scale knob: set it near the TYPICAL interval
  * span. Too small → long intervals fan out to many bins (the
  * replication factor is span/binWidth); too large → many false
  * candidates share a bin and the residual filter does the work.
  * Both degrade gracefully; neither changes the result.
  *
  * Streaming: `pointInInterval` works unchanged with a STREAMING
  * point side against a static interval table (a stream-static
  * equi-join — with `broadcastIntervals` the stream is enriched in
  * place with zero shuffle and no state store), the
  * "tag live events with their containing windows" ingestion shape.
  */
object RangeJoinOps {

  private val PBin = "__graft_pbin"
  private val IBin = "__graft_ibin"
  private val LBin = "__graft_lbin"
  private val RBin = "__graft_rbin"

  /** Bin id of a coordinate: floor(x / binWidth) as a long.
    * Timestamps/dates participate via their numeric cast (seconds),
    * matching the comparison the residual predicate performs.
    */
  private def binOf(c: Column, binWidth: Double): Column =
    floor(c.cast("double") / lit(binWidth)).cast("long")

  /** One row per bin the [startCol, endCol] interval covers
    * (inverted and null-bounded intervals drop, matching SQL range
    * predicates on them).
    */
  private def explodeBins(df: DataFrame, startCol: String, endCol: String, binWidth: Double, binName: String): DataFrame =
    df.filter(col(startCol) <= col(endCol))
      .withColumn(binName, explode(sequence(binOf(col(startCol), binWidth), binOf(col(endCol), binWidth))))

  /** Inner join of `points` rows to every `intervals` row whose
    * [startCol, endCol] (inclusive both ends) contains the point.
    * Output carries all columns of both inputs (names must be
    * disjoint). Each qualifying pair appears exactly once: a point
    * has exactly one bin, so no post-join dedup is needed.
    *
    * Set `broadcastIntervals` when the interval side is dimension-
    * sized — the exploded intervals ship once per executor and the
    * point side is scanned in place with ZERO shuffle.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Double,
      broadcastIntervals: Boolean = false
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    requireDisjoint(points, intervals)
    val binned = explodeBins(intervals, startCol, endCol, binWidth, IBin)
    val right = if (broadcastIntervals) broadcast(binned) else binned
    points
      .withColumn(PBin, binOf(col(pointCol), binWidth))
      .join(
        right,
        col(PBin) === col(IBin) &&
          col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop(PBin, IBin)
  }

  /** Inner join of interval pairs that OVERLAP (share at least one
    * coordinate, closed ends): lStart ≤ rEnd AND rStart ≤ lEnd.
    * Both sides explode to covered bins; a pair is emitted only
    * from the first bin both sides share — floor(max(lStart,
    * rStart)/binWidth), a bin both intervals necessarily cover when
    * they overlap — so each qualifying pair appears exactly once.
    */
  def intervalOverlap(
      left: DataFrame,
      lStartCol: String,
      lEndCol: String,
      right: DataFrame,
      rStartCol: String,
      rEndCol: String,
      binWidth: Double,
      broadcastRight: Boolean = false
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    requireDisjoint(left, right)
    val lb = explodeBins(left, lStartCol, lEndCol, binWidth, LBin)
    val rb0 = explodeBins(right, rStartCol, rEndCol, binWidth, RBin)
    val rb = if (broadcastRight) broadcast(rb0) else rb0
    lb.join(
        rb,
        col(LBin) === col(RBin) &&
          col(lStartCol) <= col(rEndCol) && col(rStartCol) <= col(lEndCol) &&
          col(LBin) === binOf(greatest(col(lStartCol), col(rStartCol)), binWidth))
      .drop(LBin, RBin)
  }

  private def requireDisjoint(a: DataFrame, b: DataFrame): Unit = {
    val overlap = a.columns.toSet.intersect(b.columns.toSet)
    require(overlap.isEmpty, s"column names must be disjoint across sides; shared: ${overlap.mkString(", ")}")
  }
}
