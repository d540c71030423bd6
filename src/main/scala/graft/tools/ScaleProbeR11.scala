package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{DedupOps, GraphOps}

/** Round-11 scale probes:
  *
  * 1. Multi-level Louvain on a planted hierarchy at graph scale — a
  *    ring of 100k K3 (triangle) cliques bridged into a cycle
  *    (~400k edges): level 1 (identity-seeded
  *    refine) resolves cliques, the multi-level loop must merge
  *    adjacent cliques (the resolution-limit regime: m ≫ 8) and
  *    STRICTLY raise modularity, with bounded levels and no driver
  *    stats blow-up (the BigInteger snowball this round's
  *    `dropInheritedStats` fix closed — before the fix this shape
  *    hung the driver).
  *
  * 2. hammingOverflowReport at scrape scale: 2M constant-signature
  *    rows (one black-image class) + 1M spread across distinct
  *    signatures — the report must surface exactly 4 over-cap
  *    quarter buckets of 2M members with closed-form lost pairs,
  *    from one count-only shuffle.
  *
  * Run: `sbt "runMain graft.tools.ScaleProbeR11"`.
  */
object ScaleProbeR11 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    import spark.implicits._

    // ---- 1. multi-level Louvain at scale (the REGISTRY seeding:
    // LPA labels, like sharedLouvain) on the resolution-limit ring —
    // LPA + one-level refine resolves cliques (Q -> 3/4 − 1/m), the
    // multi-level loop must merge adjacent cliques toward the pair
    // optimum (7/8 − 2/m). Verified translation-invariant at k=20
    // (0.725 -> 0.7575), so the scale run exercises the same local
    // dynamics on 300k nodes WITHOUT the pre-fix driver stats
    // blow-up (this shape hung the driver before dropInheritedStats).
    val k = 100000L // cliques
    val t0 = System.nanoTime()
    val cliqueEdges = spark.range(0, k).select(col("id").as("c"))
      .select(col("c"), explode(expr(
        "array(struct(0 as a, 1 as b), struct(0 as a, 2 as b), struct(1 as a, 2 as b))")).as("p"))
      .select((col("c") * 10 + col("p.a")).as("src"), (col("c") * 10 + col("p.b")).as("dst"))
    val bridges = spark.range(0, k)
      .select((col("id") * 10 + 2).as("src"),
        (((col("id") + 1) % k) * 10).as("dst"))
    val g = GraphOps.canonicalize(cliqueEdges.unionByName(bridges))
    val lpa = GraphOps.labelPropagation(g, iters = 3)
    val one = GraphOps.louvainRefine(g, lpa, level1Rounds = 4,
      nodeCol = "node", labelCol = "label")
    val q1 = GraphOps.modularityTotal(one)
    val t1 = System.nanoTime()
    val multi = GraphOps.louvainLevels(g, lpa, roundsPerLevel = 4, maxLevels = 5,
      minGain = 0.0, nodeCol = "node", labelCol = "label")
    val qN = GraphOps.modularityTotal(multi)
    val nCommunities = multi.labels.select(col("community")).distinct().count()
    val t2 = System.nanoTime()
    println(f"[probe] louvain ring=${k}xK3 edges=${g.m} lpa+refine1=${(t1 - t0) / 1e9}%.1fs q1=$q1%.4f " +
      f"levels=${(t2 - t1) / 1e9}%.1fs qN=$qN%.4f communities=$nCommunities")
    require(qN > q1, s"multi-level must improve: $qN vs $q1")

    // ---- 2. hamming overflow telemetry at scale ----
    val t3 = System.nanoTime()
    val constSig = spark.range(0, 2000000L).select(col("id"), lit(0x5a5a5a5a5a5a5a5aL).as("sig"))
    val spread = spark.range(2000000L, 3000000L).select(col("id"), xxhash64(col("id")).as("sig"))
    val rep = DedupOps.hammingOverflowReport(
      constSig.unionByName(spread), "id", "sig", maxBucket = 1000)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
    val t4 = System.nanoTime()
    println(f"[probe] hammingOverflow 3M rows -> ${rep.length} over-cap buckets " +
      f"in ${(t4 - t3) / 1e9}%.1fs: ${rep.mkString(", ")}")
    // the constant class: 4 quarter buckets of 2M members each, plus
    // the ~15 spread rows whose random sig shares the hot 16-bit key
    // in that quarter (1M / 65536 ≈ 15 — they really are in the
    // bucket, so the exact count INCLUDES them); lost pairs stay the
    // closed form of the reported member count
    require(rep.length == 4 &&
      rep.forall(b => b._2 >= 2000000L && b._2 <= 2001000L && b._3 == b._2 * (b._2 - 1) / 2),
      s"unexpected report: ${rep.mkString(", ")}")

    spark.stop()
    println("[probe] ALL PROBES PASS")
  }
}
