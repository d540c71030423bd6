package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators._

/** Round-8 wave-4/5/6 probes — the new operators against their worst
  * plausible shapes:
  *
  *   1. approxQuantilesBinned at 50M rows / 8 groups / 4096 bins —
  *      the whole point of the binned CDF is that the shuffle after
  *      map-side combine is ≤ groups·bins rows no matter the input;
  *      measure both passes and a skewed-group variant (one group
  *      holds half the rows — partial aggregation should make skew
  *      invisible).
  *   2. kaplanMeier at 10M subjects / day-granular durations — the
  *      distinct-duration contract: 10M subjects collapse to ≤ ~3k
  *      duration rows per cohort before any window or collect runs.
  *   3. ndcgAtK + rankMetrics at 10M rows / 1M ranking groups — two
  *      per-group window sorts at high group cardinality (the
  *      healthy window shape: many small partitions).
  *   4. degreeAssortativity on a 10M-edge graph with a 1e6-degree
  *      hub — the degree join under worst-case key skew (AQE skew
  *      handling) plus map-side-combined six-sum collapse.
  *
  * Run: `sbt "runMain graft.tools.ScaleProbeR8d"`. Findings →
  * SCALEPROBE_r08.md.
  */
object ScaleProbeR8d {

  private def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    bigQuantiles(spark)
    bigKaplanMeier(spark)
    bigRankMetrics(spark)
    hubAssortativity(spark)
    spark.stop()
  }

  /** 50M rows, 8 groups; then a skewed variant where group 0 holds
    * half the rows. */
  def bigQuantiles(spark: SparkSession): Unit = {
    val df = spark.range(50000000L).select(
      (col("id") % 8).cast("string").as("g"),
      (pmod(col("id") * 2654435761L, lit(1000000L)).cast("double") / 100.0).as("v"))
    val q = time("approxQuantilesBinned 50M x 8 groups, 4096 bins") {
      StatsOps.approxQuantilesBinned(df, Seq("g"), "v",
        Seq(0.5, 0.9, 0.99, 0.999), bins = 4096).collect()
    }
    println(s"[probe]   rows out: ${q.length} (8 groups x 4 probs)")
    val skew = spark.range(50000000L).select(
      when(col("id") % 2 === 0, "hot").otherwise((col("id") % 8).cast("string")).as("g"),
      (pmod(col("id") * 48271L, lit(1000000L)).cast("double") / 100.0).as("v"))
    val qs = time("approxQuantilesBinned 50M skewed (one group = half the rows)") {
      StatsOps.approxQuantilesBinned(skew, Seq("g"), "v", Seq(0.5, 0.99), bins = 4096).collect()
    }
    println(s"[probe]   rows out: ${qs.length}")
  }

  /** 10M subjects, durations 0..3650 days, 12 cohorts. */
  def bigKaplanMeier(spark: SparkSession): Unit = {
    val subj = spark.range(10000000L).select(
      (col("id") % 12).cast("string").as("cohort"),
      pmod(col("id") * 40503L, lit(3650L)).as("dur"),
      (col("id") % 3 =!= 0).cast("long").as("ev"))
    val km = time("kaplanMeier 10M subjects / 3650 distinct durations / 12 cohorts") {
      FunnelOps.kaplanMeier(subj, Seq("cohort"), "dur", "ev").collect()
    }
    println(s"[probe]   curve rows: ${km.length} (<= 12 x 3650)")
    val mono = km.groupBy(_.getString(0)).forall { case (_, rows) =>
      val s = rows.sortBy(_.getLong(1)).map(_.getDouble(5))
      s.zip(s.drop(1)).forall { case (a, b) => a >= b }
    }
    println(s"[probe]   survival monotone per cohort: $mono")
  }

  /** 10M events, 1M ranking groups of ~10 — the many-small-windows
    * shape both rank metrics share. */
  def bigRankMetrics(spark: SparkSession): Unit = {
    val df = spark.range(10000000L).select(
      (col("id") % 1000000L).as("g"),
      col("id").as("item"),
      pmod(col("id") * 2654435761L, lit(1000L)).cast("double").as("neg_score"),
      (pmod(col("id") * 7L, lit(5L)) === 0).cast("int").as("rel"))
    val n1 = time("ndcgAtK 10M rows / 1M groups, k=5") {
      EvalOps.ndcgAtK(df, Seq("g"), Seq("neg_score", "item"), "rel", 5).count()
    }
    val n2 = time("rankMetrics 10M rows / 1M groups, k=5") {
      EvalOps.rankMetrics(df, Seq("g"), Seq("neg_score", "item"), "rel", 5).count()
    }
    println(s"[probe]   groups: ndcg=$n1 rank=$n2")
  }

  /** 9M background edges over 997 warm dsts + 1M edges into one hub
    * (the ScaleProbeR8 pagerank shape) — endpoint-degree joins under
    * maximal key skew. */
  def hubAssortativity(spark: SparkSession): Unit = {
    val hub = spark.range(1000000L).select(
      (col("id") + 1000L).cast("string").as("src"), lit("0").as("dst"))
    val bg = spark.range(9000000L).select(
      (pmod(col("id") * 2654435761L, lit(1000000L)) + 1000L).cast("string").as("src"),
      (pmod(col("id") * 40503L, lit(997L)) + 1L).cast("string").as("dst"))
    val edges = hub.unionByName(bg)
    val r = time("degreeAssortativity 10M edges / 1e6-degree hub") {
      GraphOps.degreeAssortativity(edges).collect().head
    }
    println(s"[probe]   n_pairs=${r.getLong(0)} r=${r.get(1)} (hub-spoke => strongly negative)")
  }
}
