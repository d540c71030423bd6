package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Missing-data policies and feature filtering.
  *
  * Reference knobs reproduced: `zero_as_missing` (biodata.py:183 —
  * zeros in sparse omics tables mean "not measured", not "zero"),
  * plus the prevalence filtering every abundance workflow applies
  * before modeling.
  */
object FilterOps {

  /** Replace zeros with null in `valueCol` (zero_as_missing). */
  def zeroAsMissing(df: DataFrame, valueCol: String): DataFrame =
    df.withColumn(valueCol, when(col(valueCol) === 0, lit(null)).otherwise(col(valueCol)))

  /** Impute nulls with the per-group mean (group = feature,
    * typically). One window shuffle; avg ignores nulls.
    */
  def imputeGroupMean(df: DataFrame, groupCol: String, valueCol: String, outputCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol)
    df.withColumn(outputCol, coalesce(col(valueCol), avg(col(valueCol)).over(w)))
  }

  /** Keep features observed (value non-null / >0) in at least
    * `minFraction` of all samples. Long-format input
    * (sample, feature, value).
    *
    * Scale shape: one partial-aggregated groupBy over features
    * (output = #features rows, tiny) then a broadcast semi-join
    * back onto the fact table — the fact side never shuffles.
    */
  def prevalenceFilter(
      df: DataFrame,
      sampleCol: String,
      featureCol: String,
      valueCol: String,
      minFraction: Double,
      exact: Boolean = false
  ): DataFrame = {
    val observed = df.filter(col(valueCol).isNotNull && col(valueCol) =!= 0)
    val totalAgg = if (exact) countDistinct(col(sampleCol)) else approx_count_distinct(sampleCol)
    // total rides the SAME plan as a broadcast 1-row cross join —
    // no separate driver-side count job / extra scan action
    val total = observed.select(totalAgg.as("__total"))
    val kept = observed
      .groupBy(featureCol)
      .agg(countDistinct(sampleCol).as("__nsamp"))
      .crossJoin(broadcast(total))
      .filter(col("__nsamp") >= lit(minFraction) * greatest(col("__total"), lit(1L)))
      .select(featureCol)
    df.join(broadcast(kept), Seq(featureCol), "left_semi")
  }

  /** Drop samples whose fraction of missing feature values exceeds
    * `maxMissing` (reference `drop_samples` semantics).
    */
  def dropSparseSamples(
      df: DataFrame,
      sampleCol: String,
      valueCol: String,
      maxMissing: Double
  ): DataFrame = {
    val kept = df
      .groupBy(sampleCol)
      .agg((sum(when(col(valueCol).isNull, 1).otherwise(0)) / count(lit(1))).as("__miss"))
      .filter(col("__miss") <= maxMissing)
      .select(sampleCol)
    df.join(broadcast(kept), Seq(sampleCol), "left_semi")
  }
}
