package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.GraphOps

/** Round-8 adversarial graph probes — the operators are
  * formulation-correct on paper (degree orientation, map-side
  * combine, O(log n) contraction); these runs MEASURE them against
  * the adversarial shapes a 100 TB graph actually contains:
  *
  *   1. PageRank on a 10M-edge power-law graph with a 10⁶-in-degree
  *      hub — the groupBy(dst) hot key that kills naive formulations
  *      (partial aggregation must collapse the hub's contributions
  *      map-side: the hub should cost ≤ one row per shuffle
  *      partition, not 10⁶ rows into one reducer).
  *   2. connectedComponents on a 5M-edge star (worst-case large-star
  *      fan) and a 1M-node chain (worst-case diameter — must finish
  *      in O(log n) rounds, not 10⁶).
  *   3. labelPropagation on the star's hub (argmax window over the
  *      hub's neighbor-label frame — the skew goes through a count
  *      groupBy first, so the window sees ≤ distinct labels).
  *   4. coOccurrenceEdges with one 1M-row degenerate basket — the
  *      heavy-basket cap must hold memory at O(cap) and emit
  *      nothing for the basket while the overflow report names it.
  *
  * Run: `sbt "runMain graft.tools.ScaleProbeR8"`. Findings →
  * SCALEPROBE_r08.md.
  */
object ScaleProbeR8 {

  private def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    powerLawPageRank(spark)
    starAndChainComponents(spark)
    hubLabelPropagation(spark)
    degenerateBasket(spark)
    spark.stop()
  }

  /** 10M directed edges: 1M distinct nodes each point at hub 0
    * (in-degree 10⁶), plus 9M edges i → (i mod 997) over the same
    * node ids (997 moderately hot nodes, ~9k in-degree each).
    */
  def powerLawPageRank(spark: SparkSession): Unit = {
    import spark.implicits._
    val hub = spark.range(1, 1000001).select(col("id").as("src"), lit(0L).as("dst"))
    val bg = spark.range(1, 9000001)
      .select((col("id") % 1000000 + 1).as("src"), (col("id") % 997 + 1).as("dst"))
    val edges = hub.unionByName(bg)
    val ranks = time("pageRank 10M edges / 1e6-degree hub (3 iters)") {
      val r = GraphOps.pageRank(edges, iters = 3)
      r.count()
      r
    }
    val top = ranks.orderBy(col("rank").desc).limit(3).as[(Long, Double)].collect()
    println(s"[probe] top ranks: ${top.mkString(", ")}")
    val mass = ranks.agg(sum("rank")).head().getDouble(0)
    println(f"[probe] total mass: $mass%.6f (want ~1)")
    require(top.head._1 == 0L, "hub must dominate")
  }

  /** Star: node 0 — 1..5M (5M edges, the large-star worst fan).
    * Chain: 0-1-2-…-1M (diameter 10⁶ — O(log n) contraction or bust).
    */
  def starAndChainComponents(spark: SparkSession): Unit = {
    val star = spark.range(1, 5000001).select(lit(0L).as("src"), col("id").as("dst"))
    val nStar = time("connectedComponents star 5M") {
      GraphOps.connectedComponents(star).filter(col("component") === 0L).count()
    }
    println(s"[probe] star labeled: $nStar (want 5000001)")
    require(nStar == 5000001L, s"star CC wrong: $nStar")
    val chain = spark.range(0, 1000000).select(col("id").as("src"), (col("id") + 1).as("dst"))
    val nChain = time("connectedComponents chain 1M (diameter 1e6)") {
      GraphOps.connectedComponents(chain, maxIter = 50)
        .filter(col("component") === 0L).count()
    }
    println(s"[probe] chain labeled: $nChain (want 1000001)")
    require(nChain == 1000001L, s"chain CC wrong: $nChain")
  }

  /** LPA rounds on the 5M-star: the hub's neighbor frame is 5M rows
    * into groupBy(node, label) — map-side combine must collapse it
    * before the shuffle, and the argmax window sees ≤ distinct
    * labels per node.
    */
  def hubLabelPropagation(spark: SparkSession): Unit = {
    val star = spark.range(1, 5000001).select(lit(0L).as("src"), col("id").as("dst"))
    val labels = time("labelPropagation star 5M (2 iters)") {
      val l = GraphOps.labelPropagation(star, iters = 2)
      l.count()
      l
    }
    val hubLabel = labels.filter(col("node") === 0L).head().getLong(1)
    println(s"[probe] hub label after 2 sync rounds: $hubLabel")
  }

  /** One group with 1M duplicate-heavy items (200k distinct), cap
    * 1000: the capped set buffer must hold O(cap) memory, emit no
    * pairs, and the overflow report must name the basket with the
    * exact distinct count.
    */
  def degenerateBasket(spark: SparkSession): Unit = {
    val df = spark.range(0, 1000000)
      .select(lit(1L).as("g"), (col("id") % 200000).as("item"))
      .unionByName(spark.range(0, 10).select(lit(2L).as("g"), col("id").as("item")))
    val edges = time("coOccurrenceEdges 1M-row degenerate basket (cap 1000)") {
      GraphOps.coOccurrenceEdges(df, "g", "item", maxGroupSize = 1000)
    }
    val n = edges.count()
    println(s"[probe] edges emitted: $n (want 45 — only the sane basket)")
    require(n == 45, s"cap failed: $n")
    val rep = GraphOps.coOccurrenceOverflowReport(df, "g", "item", 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    println(s"[probe] overflow report: $rep (want (1, 200000, lost-pairs))")
    require(rep == List((1L, 200000L, 200000L * 199999L / 2)), s"report wrong: $rep")
  }
}
