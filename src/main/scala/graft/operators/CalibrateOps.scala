package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Score-trustworthiness operators: isotonic (PAV) calibration of a
  * classifier/quality score against observed outcomes, and
  * split-conformal prediction intervals for a point regressor.
  *
  * Both close the loop on the curation stack's scored frames
  * ([[ClassifierOps]], [[QualityOps]], LM perplexity): a gate like
  * "keep docs with P(good) ≥ 0.8" is only meaningful if 0.8 is a
  * CALIBRATED probability, and a filter on a predicted quantity
  * needs a finite-sample error band, not a point guess.
  *
  * Reference scope note: biosets delegates calibration/uncertainty
  * to sklearn on collected pandas frames (calibration_curve /
  * IsotonicRegression); at 100 TB both must be distributed
  * aggregations with a bounded driver step.
  *
  * Scale shape (both ops): the row frame is touched by ONE
  * map-side-combinable aggregation (plus one 1-row bounds pass for
  * the binner); everything past that operates on a frame bounded by
  * `bins` / |groups| / |distinct residuals|, never by row count.
  */
object CalibrateOps {

  // true BIGINT floor division (Column./ is double division — a
  // 53-bit mantissa would misbin wide cent ranges); positive
  // operands only here, so truncating ≡ floor ≡ SQL `div`
  private def idiv(num: Column, den: Column): Column =
    ColumnBridge.column(new IntegralDivide(
      ColumnBridge.expression(num), ColumnBridge.expression(den))).cast("long")

  /** Fitted isotonic calibration: the integer score range observed
    * at fit time plus the per-bin monotone rate table.
    *
    * `table` columns: `bin` (0-based grid cell, only non-empty
    * cells), `n`, `pos` (exact longs), `rate_raw = pos/n`,
    * `rate_iso` (the PAV fit — non-decreasing in `bin`).
    */
  final case class IsotonicModel(lo: Long, hi: Long, bins: Int, table: DataFrame) {

    /** Score → calibrated probability via the fitted step function:
      * compute the row's grid cell (clamped to the observed range)
      * and broadcast-join the ≤`bins`-row table; rows landing in a
      * cell that was empty at fit time take the nearest LOWER
      * non-empty cell's rate (the step function is right-continuous
      * piecewise-constant), or the first cell's rate below it.
      * The row side never shuffles.
      */
    def apply(df: DataFrame, scoreCentsCol: String, outCol: String = "p_cal"): DataFrame = {
      val span = hi - lo + 1
      val clamped = greatest(lit(lo), least(lit(hi), col(scoreCentsCol).cast("long")))
      val cell = idiv((clamped - lit(lo)) * lit(bins.toLong), lit(span))
      // dense bin → rate lookup with lower-neighbor fill, built from
      // the bounded table (≤ bins rows; last(ignoreNulls) scan)
      val w = Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val spark = df.sparkSession
      import spark.implicits._
      val dense = (0 until bins).toDF("bin")
        .join(broadcast(table.select(col("bin"), col("rate_iso"))), Seq("bin"), "left")
        .select(col("bin"), last(col("rate_iso"), ignoreNulls = true).over(w).as("r"))
        .select(col("bin"), coalesce(col("r"),
          first(col("r"), ignoreNulls = true).over(
            Window.orderBy(col("bin")).rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing))).as(outCol))
      df.withColumn("__cell", cell)
        .join(broadcast(dense.withColumnRenamed("bin", "__cell")), Seq("__cell"), "left")
        .drop("__cell")
    }
  }

  /** Isotonic calibration of an integer score against a 0/1 outcome
    * via pool-adjacent-violators (Barlow et al. 1972; the
    * calibration method of Zadrozny & Elkan 2002): bucket the score
    * onto an equal-width integer grid, count (n, positives) per
    * cell, and fit the monotone non-decreasing rate curve that
    * minimizes weighted squared error.
    *
    * Engine-determinism: the grid is pure integer arithmetic
    * (`(score−lo)·bins div (hi−lo+1)`), the PAV pools compare block
    * means by BigInt cross-multiplication (no float drift, no Long
    * overflow at any row count), and each emitted rate is ONE double
    * division of exact longs — so the whole fit replays in ANSI SQL
    * through the minimax identity
    * `iso(i) = max_{j≤i} min_{k≥i} mean(y[j..k])`
    * (correct rounding is monotone, so min/max over the correctly
    * rounded quotients equals the quotient of the rational
    * min/max — the SQL replay is exact, not approximate).
    *
    * Scale: one 1-row min/max aggregation + one map-side-combinable
    * groupBy(cell) collapsing any row count to ≤`bins` rows; the
    * PAV stack runs driver-side over that bounded frame (same
    * bounded-dictionary pattern as the classifier/dictionary fits).
    *
    * @param scoreCentsCol integral score column (e.g. exact cents);
    *                      callers with double scores snap them to a
    *                      grid first — calibration only ever needs
    *                      score RANKS, and integers replay exactly
    * @param labelCol      0/1 outcome (nulls dropped with the row)
    */
  def isotonicCalibrate(
      df: DataFrame,
      scoreCentsCol: String,
      labelCol: String,
      bins: Int = 64
  ): IsotonicModel = {
    require(bins >= 2 && bins <= 4096, s"bins must be in [2, 4096], got $bins")
    val base = df
      .filter(col(scoreCentsCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCentsCol).cast("long").as("s"), col(labelCol).cast("long").as("y"))
    val bounds = base.agg(min(col("s")).as("lo"), max(col("s")).as("hi")).head()
    require(!bounds.isNullAt(0), "isotonicCalibrate: no non-null (score, label) rows")
    val lo = bounds.getLong(0)
    val hi = bounds.getLong(1)
    val span = hi - lo + 1
    val cell = idiv((col("s") - lit(lo)) * lit(bins.toLong), lit(span)).as("bin")
    val grid = base.select(cell, col("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      .orderBy("bin")
      .collect() // bounded: ≤ bins rows by construction
    // PAV: maintain a stack of pooled blocks; a new cell pools
    // backward while the previous block's mean exceeds the new one.
    // Means compared exactly: pos_a/n_a > pos_b/n_b ⇔
    // pos_a·n_b > pos_b·n_a (BigInt — immune to overflow at any n).
    final case class Block(pos: BigInt, n: BigInt, cells: List[(Long, Long, Long)])
    val stack = scala.collection.mutable.ArrayBuffer.empty[Block]
    grid.foreach { r =>
      val (b, n, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
      var cur = Block(BigInt(p), BigInt(n), List((b, n, p)))
      while (stack.nonEmpty && stack.last.pos * cur.n > cur.pos * stack.last.n) {
        val prev = stack.remove(stack.length - 1)
        cur = Block(prev.pos + cur.pos, prev.n + cur.n, prev.cells ++ cur.cells)
      }
      stack += cur
    }
    val spark = df.sparkSession
    val rows = stack.toSeq.flatMap { blk =>
      val iso = blk.pos.toDouble / blk.n.toDouble
      blk.cells.map { case (b, n, p) =>
        Row(b, n, p, p.toDouble / n.toDouble, iso)
      }
    }
    val schema = StructType(Seq(
      StructField("bin", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("pos", LongType, nullable = false),
      StructField("rate_raw", DoubleType, nullable = false),
      StructField("rate_iso", DoubleType, nullable = false)))
    IsotonicModel(lo, hi, bins,
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema))
  }

  /** Split-conformal prediction intervals (Papadopoulos 2002, Lei
    * et al. 2018) per group: on the calibration split, take the
    * k-th smallest absolute residual with `k = ⌈(n_cal+1)(1−α)⌉`;
    * `ŷ ± q_hat` then covers the truth with probability ≥ 1−α on
    * exchangeable data — a FINITE-SAMPLE guarantee needing no model
    * assumptions, which is exactly what a curation gate on a
    * predicted quantity needs. The emitted `coverage` is the
    * empirical check on the held-out split.
    *
    * Output per group: (grp, n_cal, q_hat, n_test, covered,
    * coverage). `q_hat` is NULL when k > n_cal (the honest interval
    * is infinite — too few calibration rows for this α).
    *
    * Scale: residuals are scan-stage arithmetic; the k-th order
    * statistic comes from the distinct-residual frame (groupBy
    * (grp, r) counts + one cumulative window — aggregator memory is
    * distinct values, not rows, the same trade as the exact-quantile
    * machinery in [[StatsOps.groupQuantileExact]]); the per-group
    * q_hat frame broadcasts back, so the test side never shuffles.
    *
    * @param isCalCol boolean column marking the calibration split
    *                 (a deterministic hash bucket keeps it
    *                 engine-replayable)
    */
  def splitConformal(
      df: DataFrame,
      groupCol: String,
      labelCol: String,
      predCol: String,
      alpha: Double,
      isCalCol: String
  ): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val scored = df
      .filter(col(labelCol).isNotNull && col(predCol).isNotNull && col(isCalCol).isNotNull)
      .select(col(groupCol).as("grp"), col(isCalCol).as("is_cal"),
        abs(col(labelCol).cast("double") - col(predCol).cast("double")).as("r"))
    val cal = scored.filter(col("is_cal"))
    // distinct-residual frame: counts per (grp, r), cumulative rank
    val counts = cal.groupBy(col("grp"), col("r")).agg(count(lit(1)).as("c"))
    val grpW = Window.partitionBy(col("grp"))
    val cumW = grpW.orderBy(col("r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = counts.select(col("grp"), col("r"), col("c"),
      sum(col("c")).over(cumW).as("cumc"),
      sum(col("c")).over(grpW).as("n_cal"))
    val k = ceil((col("n_cal") + lit(1L)).cast("double") * lit(1.0 - alpha)).cast("long")
    val qhat = staged
      .withColumn("k", k)
      .groupBy(col("grp"))
      .agg(
        first(col("n_cal")).as("n_cal"),
        min(when(col("cumc") >= col("k"), col("r"))).as("q_hat_raw"),
        first(col("k")).as("k"))
      .select(col("grp"), col("n_cal"),
        when(col("k") <= col("n_cal"), col("q_hat_raw")).as("q_hat"))
    val test = scored.filter(!col("is_cal"))
    test
      .join(broadcast(qhat), Seq("grp"), "inner")
      .groupBy(col("grp"))
      .agg(
        first(col("n_cal")).as("n_cal"),
        first(col("q_hat")).as("q_hat"),
        count(lit(1)).as("n_test"),
        sum(when(col("r") <= col("q_hat"), 1L).otherwise(0L)).as("covered"))
      .select(col("grp"), col("n_cal"), col("q_hat"), col("n_test"),
        when(col("q_hat").isNotNull, col("covered")).as("covered"),
        when(col("q_hat").isNotNull,
          col("covered").cast("double") / col("n_test").cast("double")).as("coverage"))
  }
}
