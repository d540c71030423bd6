package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators._

/** Round-8 session-2 probes — the operators added this session,
  * measured against their worst plausible shapes:
  *
  *   1. containmentPairs on a dup-heavy corpus (20k docs in 20-copy
  *      clusters): the container-side FULL inverted index meets a
  *      rarest-first prefix — candidate count must stay near the
  *      true pair count, not |prefix|×|postings|.
  *   2. stripBoilerplate at 1M lines with 50%-boilerplate docs —
  *      the (group, line) count shuffle's hot keys ARE the
  *      boilerplate; partial aggregation must collapse them
  *      map-side.
  *   3. hits on the 10M-edge power-law graph (1e6-degree hub) —
  *      the same partial-agg discipline as the pageRank probe, for
  *      both half-steps.
  *   4. associationRules with one 100k-item degenerate basket —
  *      the cap must drop it at O(cap) memory while 50k sane
  *      baskets mine normally.
  *   5. auc on 10M rows / 100 distinct scores — the distinct-value
  *      frame must collapse to ≤ groups·100 rows before any window.
  *   6. interArrivalStats with one 2M-event hot user — a keyed
  *      window sorts the hot key inside ONE partition by
  *      construction; measure what that costs at this shape.
  *
  * Run: `sbt "runMain graft.tools.ScaleProbeR8b"`. Findings →
  * SCALEPROBE_r08.md.
  */
object ScaleProbeR8b {

  private def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    dupHeavyContainment(spark)
    boilerplateAtScale(spark)
    hubHits(spark)
    degenerateBasketRules(spark)
    coarseScoreAuc(spark)
    hotKeyInterArrival(spark)
    spark.stop()
  }

  /** 20k docs = 1k distinct texts × 20 copies; every doc also
    * appears as a half-length snippet → true containment pairs are
    * dense. Worst shape for the inverted index: massive duplicate
    * shingle sets.
    */
  def dupHeavyContainment(spark: SparkSession): Unit = {
    import spark.implicits._
    val docs = spark.range(0, 20000).select(col("id"),
      concat_ws(" ", (0 until 30).map(j =>
        concat(lit("w"), ((col("id") % 1000) * 31 + j) % 7919)): _*).as("body"))
    val out = time("containmentPairs 20k docs, 20-copy clusters (t=0.9)") {
      val p = DedupOps.containmentPairs(docs.toDF(), "id", "body", 3, 0.9)
      p.count()
    }
    println(s"[probe] containment pairs found: $out")
  }

  /** 100k docs × 10 lines; 5 lines per doc are the source's shared
    * boilerplate (hot (group, line) keys at 100k count each).
    */
  def boilerplateAtScale(spark: SparkSession): Unit = {
    import spark.implicits._
    val docs = spark.range(0, 100000).select(col("id"),
      lit("src").as("source"),
      concat_ws("\n",
        (0 until 5).map(j => concat(lit(s"BOILER $j line "), lit(j))) ++
          (0 until 5).map(j => concat(lit(s"unique $j of "), col("id"))): _*).as("body"))
    val n = time("stripBoilerplate 100k docs / 1M lines / 50% boilerplate") {
      TextOps.stripBoilerplate(docs.toDF(), "id", "body", Seq("source"), 1000)
        .filter(col("text_clean").contains("BOILER")).count()
    }
    println(s"[probe] docs still containing boilerplate: $n (must be 0)")
  }

  /** The r8a power-law graph, through HITS: 1M spokes → hub 0 plus
    * 9M background edges over 997 warm authorities.
    */
  def hubHits(spark: SparkSession): Unit = {
    val hub = spark.range(1, 1000001).select(col("id").as("src"), lit(0L).as("dst"))
    val bg = spark.range(1, 9000001)
      .select((col("id") % 1000000 + 1).as("src"), (col("id") % 997 + 1).as("dst"))
    val edges = hub.unionByName(bg)
    val top = time("hits 10M edges / 1e6-degree hub (2 iters)") {
      GraphOps.hits(edges, iters = 2)
        .orderBy(desc("auth")).limit(3).collect()
    }
    println(s"[probe] top authorities: ${top.map(r => s"${r.get(0)}:${r.getDouble(2)}").mkString(", ")}")
  }

  /** 50k sane baskets of 5 items + ONE basket holding 100k distinct
    * items (5e9 potential pairs — must be dropped by the cap, not
    * enumerated).
    */
  def degenerateBasketRules(spark: SparkSession): Unit = {
    val sane = spark.range(0, 250000)
      .select((col("id") % 50000).as("b"),
        ((col("id") % 50000) * 7 % 50 + (col("id") / 50000) * 13 % 50 + 1000000).as("i"))
    val degenerate = spark.range(0, 100000)
      .select(lit(-1L).as("b"), col("id").as("i"))
    val rules = time("associationRules 50k baskets + one 100k-item degenerate basket") {
      MiningOps.associationRules(sane.unionByName(degenerate), "b", "i",
        minSupport = 100L, minConfidence = 0.05, maxBasketSize = 100).count()
    }
    println(s"[probe] rules mined: $rules")
  }

  /** 10M rows, 5 groups, 100 distinct integer scores: the
    * distinct-score frame is 500 rows — the windows and final agg
    * must run on THAT, never the row frame.
    */
  def coarseScoreAuc(spark: SparkSession): Unit = {
    val rows = spark.range(0, 10000000).select(
      (col("id") % 5).cast("string").as("g"),
      (col("id") % 2).cast("int").as("y"),
      ((col("id") * 2654435761L) % 100).cast("double").as("s"))
    val out = time("auc 10M rows / 100 distinct scores / 5 groups") {
      graft.operators.EvalOps.auc(rows, "y", "s", Seq("g")).collect()
    }
    println(s"[probe] aucs: ${out.map(r => f"${r.getString(0)}:${r.getDouble(3)}%.4f").mkString(", ")}")
  }

  /** 3M events: 1M users × 1 event (no gaps) + one user with 2M
    * events — the keyed window's single-partition sort on the hot
    * key, measured.
    */
  def hotKeyInterArrival(spark: SparkSession): Unit = {
    val singles = spark.range(0, 1000000).select(
      col("id").as("user"), col("id").as("eid"),
      (col("id") * 1000000L).as("us"), lit("a").as("t"))
    val hot = spark.range(0, 2000000).select(
      lit(-1L).as("user"), col("id").as("eid"),
      (col("id") * 500000L).as("us"), lit("a").as("t"))
    val ev = singles.unionByName(hot)
      .withColumn("ts", expr("timestamp_micros(us)"))
    val out = time("interArrivalStats 3M events / one 2M-event hot user") {
      SequenceOps.interArrivalStats(ev, "user", Seq("ts", "eid"), "ts", Seq("t")).collect()
    }
    println(s"[probe] stats: ${out.mkString("; ")}")
  }
}
