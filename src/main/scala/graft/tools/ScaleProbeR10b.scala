package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.GraphOps

/** Round-10 graph fallback-path probes. The r10 rank/triangle work
  * added cost-based fast paths (node-frame broadcasts under the 4M
  * ceilings, packed single-long close keys); the FALLBACK branches
  * are the 100 TB shapes and must stay correct and skew-safe:
  *
  *   1. pageRank on a 6M-node graph — ABOVE DegreeBroadcastMaxNodes,
  *      so every per-round rank join takes the shuffle path (the
  *      node frame moves to the cached edge partitioning, the edge
  *      frame never re-shuffles). Hub in-degree 10⁶ exercises the
  *      map-side combine under the fallback.
  *   2. triangleCounts on a 6M-edge graph — ABOVE
  *      TriangleBroadcastMaxEdges with packable int ids, so the
  *      close join runs as a SHUFFLE join on the packed single-long
  *      key (the new key representation under the old join
  *      strategy); counts cross-checked against a ring construction
  *      with a known exact answer.
  *   3. hitsOn on the 6M-node graph — fallback builds the second,
  *      dst-partitioned edge copy; L1 invariants checked.
  *
  * Run: `sbt "runMain graft.tools.ScaleProbeR10b"`. Findings →
  * SCALEPROBE_r10.md §8.
  */
object ScaleProbeR10b {

  private def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    bigNodePageRank(spark)
    bigEdgeTriangles(spark)
    bigNodeHits(spark)
    spark.stop()
  }

  /** 6M nodes (> 4M broadcast ceiling): 5M spokes → hub 0 plus 7M
    * background edges over 6M ids — per-round rank joins MUST take
    * the shuffle fallback; the 5M-in-degree hub rides the map-side
    * combine exactly as in the broadcast path.
    */
  def bigNodePageRank(spark: SparkSession): Unit = {
    import spark.implicits._
    val hub = spark.range(1, 5000001).select(col("id").as("src"), lit(0L).as("dst"))
    val bg = spark.range(1, 7000001)
      .select((col("id") % 6000000 + 1).as("src"), (col("id") % 1009 + 1).as("dst"))
    val edges = hub.unionByName(bg)
    val ranks = time("pageRank 12M edges / 6M nodes (shuffle-fallback rounds, 3 iters)") {
      val r = GraphOps.pageRank(edges, iters = 3)
      r.count()
      r
    }
    val top = ranks.orderBy(col("rank").desc).limit(1).as[(Long, Double)].collect()
    val mass = ranks.agg(sum("rank")).head().getDouble(0)
    println(f"[probe] top=${top.head} total mass: $mass%.6f (want ~1)")
    require(top.head._1 == 0L, "hub must dominate under the fallback path")
    // pageRank snaps each rank to the 1e-9 grid per round; ~5M spoke
    // nodes carry an IDENTICAL rank, so their rounding errors add
    // coherently — worst case n*5e-10 ≈ 3e-3 per round (measured
    // 2.1e-3 here). The bound is the correlated-rounding envelope,
    // not a leak tolerance: dangling mass is redistributed exactly.
    require(math.abs(mass - 1.0) < 1e-2, s"mass drifted: $mass")
  }

  /** 6M-edge triangle graph with a KNOWN count: 2M disjoint
    * triangles (nodes 3k, 3k+1, 3k+2) — 6M edges total, above the
    * 4M close-broadcast ceiling, int ids packable. Every node must
    * come back with exactly 1 triangle through the packed-key
    * SHUFFLE close join.
    */
  def bigEdgeTriangles(spark: SparkSession): Unit = {
    val k = spark.range(0, 2000000)
    val edges = k.select((col("id") * 3).as("src"), (col("id") * 3 + 1).as("dst"))
      .unionByName(k.select((col("id") * 3 + 1).as("src"), (col("id") * 3 + 2).as("dst")))
      .unionByName(k.select((col("id") * 3).as("src"), (col("id") * 3 + 2).as("dst")))
    val tri = time("triangleCounts 6M edges (packed-key shuffle close join)") {
      val t = GraphOps.triangleCounts(edges)
      t.count()
      t
    }
    val nNodes = tri.count()
    val bad = tri.filter(col("triangles") =!= 1L).count()
    println(s"[probe] nodes in triangles: $nNodes (want 6000000), wrong counts: $bad")
    require(nNodes == 6000000L, s"node coverage wrong: $nNodes")
    require(bad == 0L, s"$bad nodes with wrong triangle count")
  }

  /** hitsOn above the node ceiling: the dst-partitioned second edge
    * copy materializes (fallback) and both L1 normalizations hold.
    */
  def bigNodeHits(spark: SparkSession): Unit = {
    val edges = spark.range(1, 5000001)
      .select(col("id").as("src"), (col("id") % 1013).as("dst"))
    val em = GraphOps.degreeEdgeFrame(edges)
    try {
      val h = time("hitsOn 5M edges / 5M nodes (fallback dst copy, 2 iters)") {
        val r = GraphOps.hitsOn(em, iters = 2)
        r.count()
        r
      }
      val sums = h.agg(sum("hub").as("sh"), sum("auth").as("sa")).head()
      println(f"[probe] hub mass ${sums.getDouble(0)}%.6f auth mass ${sums.getDouble(1)}%.6f (want ~1, ~1)")
      require(math.abs(sums.getDouble(0) - 1.0) < 1e-3, "hub mass drifted")
      require(math.abs(sums.getDouble(1) - 1.0) < 1e-3, "auth mass drifted")
    } finally em.unpersist()
  }
}
