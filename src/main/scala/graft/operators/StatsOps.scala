package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Descriptive statistics + grouped aggregation surface
  * (reference: HF `Dataset` unique/summary paths the Bioset class
  * re-exports, arrow_dataset.py:26).
  *
  * All pure partial-aggregation shapes: map-side combine reduces
  * each of N input partitions to #groups rows before the single
  * shuffle.
  */
object StatsOps {

  /** Grouped summary of one value column. */
  def summarize(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(valueCol).as("sum"),
        avg(valueCol).as("mean"),
        min(valueCol).as("min"),
        max(valueCol).as("max"),
        stddev_samp(col(valueCol)).as("stddev")
      )

  /** describe() across several numeric columns → long table
    * (column, n, mean, min, max, stddev). One pass over the data.
    */
  def describeAll(df: DataFrame, valueCols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = valueCols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        avg(col(c)).as(s"${c}__mean"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        stddev_samp(col(c)).as(s"${c}__stddev")
      )
    }
    val onerow = df.agg(aggs.head, aggs.tail: _*)
    val stacked = valueCols
      .map(c => s"'$c', `${c}__n`, `${c}__mean`, `${c}__min`, `${c}__max`, `${c}__stddev`")
      .mkString(", ")
    onerow.select(
      expr(s"stack(${valueCols.size}, $stacked) as (column, n, mean, min, max, stddev)")
    )
  }

  /** value_counts: frequency of each value, most frequent first. */
  def valueCounts(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c)).agg(count(lit(1)).as("count")).orderBy(col("count").desc, col(c))

  /** Top-k rows per group by `orderCol` descending, ties broken by
    * `tieBreak` ascending (deterministic). Single window shuffle;
    * with a pushed `k` this is the rank-pushdown pattern AQE/Catalyst
    * optimize via `WindowGroupLimit` in Spark 3.5+ (top-k per group
    * never materializes full partitions).
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: String, tieBreak: String, k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(orderCol).desc, col(tieBreak))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Hierarchical rollup: re-aggregate a long fact table after a
    * broadcast join to a (feature → level) mapping — e.g. OTU →
    * genus/phylum taxonomy rollup.
    */
  def rollup(
      fact: DataFrame,
      mapping: DataFrame,
      featureCol: String,
      levelCol: String,
      sampleCol: String,
      valueCol: String
  ): DataFrame =
    fact
      .join(broadcast(mapping.select(featureCol, levelCol)), Seq(featureCol))
      .groupBy(col(sampleCol), col(levelCol))
      .agg(sum(valueCol).as(valueCol))
}
