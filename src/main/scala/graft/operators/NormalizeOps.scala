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
}
