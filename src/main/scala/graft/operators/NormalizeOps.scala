package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-sample / per-feature normalizations used in omics
  * preprocessing (the reference's typed columns — Abundance,
  * Expression, PeakIntensity (features/omics.py) — exist to feed
  * exactly these).
  *
  * All operators run on the LONG format (sample, feature, value):
  * that is the shape that scales, and window functions give
  * Catalyst a single hash-partition per group key. Where the whole
  * normalization is per-group, the alternative two-pass
  * groupBy+broadcast-join is used automatically by AQE when group
  * cardinality is small — windows keep it one shuffle either way.
  */
object NormalizeOps {

  /** Total-sum scaling (relative abundance): x / Σ_group(x). */
  def tss(df: DataFrame, groupCol: String, valueCol: String, outputCol: String = "tss"): DataFrame = {
    val w = Window.partitionBy(groupCol)
    df.withColumn(outputCol, col(valueCol) / sum(valueCol).over(w))
  }

  /** Centered log-ratio: ln(x) − mean_group(ln(x)). Zeros handled by
    * a pseudocount (standard practice; the reference's
    * `zero_as_missing` path instead nulls them — see
    * [[FilterOps.zeroAsMissing]]).
    */
  def clr(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      pseudocount: Double = 0.0,
      outputCol: String = "clr"
  ): DataFrame = {
    val lx = log(col(valueCol) + lit(pseudocount))
    val w = Window.partitionBy(groupCol)
    df.withColumn(outputCol, lx - avg(lx).over(w))
  }

  /** Per-feature z-score: (x − μ)/σ; σ=0 groups → null (nullif both
    * here and in any SQL oracle).
    */
  def zscore(df: DataFrame, featureCol: String, valueCol: String, outputCol: String = "zscore"): DataFrame = {
    val w = Window.partitionBy(featureCol)
    val sd = stddev_samp(col(valueCol)).over(w)
    df.withColumn(outputCol, (col(valueCol) - avg(valueCol).over(w)) / nullif(sd, lit(0.0)))
  }

  /** Per-feature min-max to [0,1]; constant groups → null. */
  def minmax(df: DataFrame, featureCol: String, valueCol: String, outputCol: String = "minmax"): DataFrame = {
    val w = Window.partitionBy(featureCol)
    val mn = min(col(valueCol)).over(w)
    val mx = max(col(valueCol)).over(w)
    df.withColumn(outputCol, (col(valueCol) - mn) / nullif(mx - mn, lit(0.0)))
  }

  def log1pCol(df: DataFrame, valueCol: String, outputCol: String = "log1p"): DataFrame =
    df.withColumn(outputCol, log1p(col(valueCol)))

  /** Presence/absence binarization (x>0 → 1). */
  def presence(df: DataFrame, valueCol: String, outputCol: String = "present"): DataFrame =
    df.withColumn(outputCol, (col(valueCol) > 0).cast("int"))

  /** Quantile normalization: force every sample onto the common
    * (cross-sample mean) distribution — the classic microarray /
    * RNA-seq batch normalization (Bolstad et al. 2003; public
    * method). Each value is replaced by the mean, across samples,
    * of the values holding the same within-sample rank.
    *
    * Ranks use `row_number` ordered by (value, tieCol) so ties are
    * deterministic and every engine agrees on the cut (classic QN
    * averages tied ranks; the row_number variant is the
    * deterministic choice that stays exactly reproducible at any
    * parallelism). Samples of unequal size contribute to exactly
    * the ranks they have — a rank's reference value is the mean
    * over the samples that reach it.
    *
    * Shape: one window shuffle by sample (rank), one
    * map-side-combinable groupBy(rank) (reference distribution —
    * at most max-sample-size rows), one sort-merge join back on
    * rank. No driver-side state; the reference distribution never
    * materializes beyond a rank-keyed frame.
    */
  def quantileNormalize(
      df: DataFrame,
      sampleCol: String,
      valueCol: String,
      tieCol: String,
      outputCol: String = "qnorm"
  ): DataFrame = {
    val w = Window.partitionBy(sampleCol).orderBy(col(valueCol), col(tieCol))
    val ranked = df.withColumn("__qn_rank", row_number().over(w))
    val reference = ranked
      .groupBy(col("__qn_rank"))
      .agg(avg(col(valueCol)).as(outputCol))
    ranked.join(reference, "__qn_rank").drop("__qn_rank")
  }

  private def nullif(c: Column, v: Column): Column = when(c === v, lit(null)).otherwise(c)

  /** Moro (1995) inverse-normal CDF coefficients — shared by the
    * Column expression and the SQL oracle generator so both engines
    * evaluate the IDENTICAL Horner chains.
    */
  private[graft] val MoroA = Seq(2.50662823884, -18.61500062529, 41.39119773534, -25.44106049637)
  private[graft] val MoroB = Seq(-8.47351093090, 23.08336743743, -21.06224101826, 3.13082909833)
  private[graft] val MoroC = Seq(0.3374754822726147, 0.9761690190917186, 0.1607979714918209,
    0.0276438810333863, 0.0038405729373609, 0.0003951896511919, 0.0000321767881768,
    0.0000002888167364, 0.0000003960315187)

  /** Φ⁻¹(u) via Moro's Beasley-Springer refinement: a rational
    * central region (|u−½| ≤ 0.42) + a ln(−ln) Chebyshev tail —
    * elementary operations only, so any engine replays it. */
  private def probit(u: Column): Column = {
    val y = u - lit(0.5)
    def hornerChain(cs: Seq[Double], x: Column): Column =
      cs.init.foldRight(lit(cs.last): Column)((c, acc) => lit(c) + x * acc)
    val r = y * y
    val central = y * hornerChain(MoroA, r) /
      (lit(1.0) + r * hornerChain(MoroB, r))
    val rTail = when(y > 0, lit(1.0) - u).otherwise(u)
    val s = log(-log(rTail))
    val tail = hornerChain(MoroC, s)
    when(abs(y) <= lit(0.42), central)
      .otherwise(when(y >= 0, tail).otherwise(-tail))
  }

  /** Rank-based inverse normal transform per feature (Blom 1958
    * offsets + Moro probit — the GWAS/omics normalization that
    * makes ANY continuous phenotype or abundance profile exactly
    * standard-normal by construction, immune to outliers and
    * skew where [[zscore]] is not): each value maps to
    * Φ⁻¹((rank − 0.375)/(n + 0.25)), ties sharing the average
    * rank.
    *
    * Scale shape: ONE window shuffle partitioned by feature (the
    * feature axis is the parallel axis — every 100 TB omics matrix
    * is wide in features, bounded per feature in samples); the
    * probit is pure scan-stage arithmetic (rational central region
    * + ln(−ln) tail, no special functions), snapped to the 1e-9
    * grid for engine-stable replay.
    */
  def inverseNormalTransform(
      df: DataFrame,
      featureCol: String,
      valueCol: String,
      outputCol: String = "int_value"
  ): DataFrame = {
    val wRank = Window.partitionBy(col(featureCol)).orderBy(col(valueCol))
    val wTies = Window.partitionBy(col(featureCol), col(valueCol))
    val wAll = Window.partitionBy(col(featureCol))
    val base = df.filter(col(valueCol).isNotNull)
    val rAvg = rank().over(wRank).cast("double") +
      (count(lit(1)).over(wTies).cast("double") - 1.0) / 2.0
    val p = (rAvg - lit(0.375)) /
      (count(lit(1)).over(wAll).cast("double") + lit(0.25))
    base.withColumn(outputCol,
      floor(probit(p) * lit(1e9) + lit(0.5)) / lit(1e9))
  }
}
