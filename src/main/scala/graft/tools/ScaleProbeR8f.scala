package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators._

/** Round-8 wave-11/12 probes:
  *
  *   1. inverseNormalTransform at 20M values / 2000 features — the
  *      feature-partitioned window axis at width.
  *   2. seasonalDecompose at 10M rows / 100k keys — three window
  *      frames + two tiny joins.
  *   3. spearmanMatrix at 40 features × 100k entities — the F²
  *      pair blowup (780 pairs) over a 4M-row ranked frame.
  *   4. temporalSplit at 50M rows — one percentile agg + a scan.
  *
  * Run: `sbt "runMain graft.tools.ScaleProbeR8f"`. Findings →
  * SCALEPROBE_r08.md.
  */
object ScaleProbeR8f {

  private def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    bigInt(spark)
    bigDecompose(spark)
    bigSpearman(spark)
    bigTemporalSplit(spark)
    spark.stop()
  }

  def bigInt(spark: SparkSession): Unit = {
    val df = spark.range(20000000L).select(
      (col("id") % 2000L).as("f"),
      pmod(col("id") * 2654435761L, lit(100000L)).cast("double").as("v"))
    val n = time("inverseNormalTransform 20M values / 2000 features") {
      NormalizeOps.inverseNormalTransform(df, "f", "v").count()
    }
    println(s"[probe]   rows: $n")
  }

  def bigDecompose(spark: SparkSession): Unit = {
    val df = spark.range(10000000L).select(
      (col("id") % 100000L).as("k"), (col("id") / 100000L).cast("long").as("i"),
      (pmod(col("id") * 48271L, lit(1000L)).cast("double") / 10.0).as("v"))
    val n = time("seasonalDecompose 10M rows / 100k keys / m=7") {
      DriftOps.seasonalDecompose(df, Seq("k"), Seq("i"), "v", 7).count()
    }
    println(s"[probe]   rows: $n")
  }

  def bigSpearman(spark: SparkSession): Unit = {
    val df = spark.range(4000000L).select(
      (col("id") % 100000L).as("e"),
      (col("id") / 100000L).cast("long").cast("string").as("f"),
      pmod(col("id") * 40503L, lit(5000L)).cast("double").as("v"))
    val n = time("spearmanMatrix 40 features x 100k entities (780 pairs)") {
      StatsOps.spearmanMatrix(df, "e", "f", "v").count()
    }
    println(s"[probe]   pairs: $n")
  }

  def bigTemporalSplit(spark: SparkSession): Unit = {
    val df = spark.range(50000000L).select(col("id"),
      (lit(1700000000L) + pmod(col("id") * 2654435761L, lit(86400L * 365L))).cast("timestamp").as("ts"))
    val r = time("temporalSplit 50M rows (minute-granularity cutoff)") {
      SplitOps.temporalSplit(df, "ts", 0.1, granularitySeconds = 60L).groupBy("split").count().collect()
    }
    println(s"[probe]   ${r.map(x => x.getString(0) + "=" + x.getLong(1)).mkString(" ")}")
  }
}
