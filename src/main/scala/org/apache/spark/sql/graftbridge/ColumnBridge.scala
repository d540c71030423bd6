package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression conversion
  * (Spark 4 wraps Columns in ColumnNodes; classic-mode plans still
  * speak Expression). Lives under org.apache.spark.sql for access.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def logicalPlan(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Rebuild `df` over its own (already-materialized) InternalRow
    * RDD WITHOUT the inherited size statistics.
    *
    * Why this exists: `localCheckpoint` cuts RDD lineage but COPIES
    * the source plan's estimated stats into the new LogicalRDD, and
    * Catalyst's size-only join estimate MULTIPLIES child sizes — so
    * an iterative operator that checkpoints a frame built from
    * several joins per round snowballs the inherited `sizeInBytes`
    * BigInt: its DIGIT COUNT grows geometrically with total round
    * count, and past ~10 stacked rounds the driver burns minutes in
    * BigInteger.multiply inside stats visitors (found via thread
    * dump in the r11 multi-level Louvain work: ToomCook3 frames
    * under SizeInBytesOnlyStatsPlanVisitor.visitJoin). Bounded-round
    * operators (PageRank's 3, kCore's semi-joins) never reach the
    * blow-up; LEVEL-STACKED loops do. Calling this at the loop's
    * checkpoint boundaries resets the estimate to the session
    * default (conservative: no broadcast by size), which the
    * explicit broadcast hints and AQE runtime sizes make moot.
    * Zero recompute and zero row-format conversion: the checkpointed
    * Dataset's `toRdd` IS the materialized RDD.
    */
  def dropInheritedStats(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
