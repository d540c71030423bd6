package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators._

/** Round-10 probes:
  *
  *   1. Batch ER at the r9 OOM boundary — 2M records / 676 blocks of
  *      ~3000 (≈3G candidate pairs) — UNDER the new `maxBlockSize`
  *      cap: every block exceeds the cap, so the pair join must
  *      complete in seconds with zero pairs and the overflow report
  *      must surface all 676 blocks (r9 recorded this exact shape
  *      OOMing the CC edge checkpoint without the cap).
  *   2. Same shape with SELECTIVE keys mixed in: capped blocks drop,
  *      selective blocks still match end-to-end through CC.
  *   3. Louvain contraction at 2M-edge scale: LPA-seeded refinement
  *      completes with bounded rounds; the contraction's big-frame
  *      cost is ONE und-mapped fold.
  *
  * Run: `sbt "runMain graft.tools.ScaleProbeR10"`. Findings →
  * SCALEPROBE_r10.md.
  */
object ScaleProbeR10 {

  private def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    cappedBoundaryEr(spark)
    cappedSelectiveEr(spark)
    louvainContractionScale(spark)
    spark.stop()
  }

  /** The r9 OOM shape, now bounded: 676 two-letter blocks x ~3000
    * members. With maxBlockSize=1000 every block drops wholesale —
    * the run must finish fast and report all 676.
    */
  def cappedBoundaryEr(spark: SparkSession): Unit = {
    val letters = "abcdefghijklmnopqrstuvwxyz"
    val df = spark.range(2000000L).select(
      col("id"),
      concat(
        // 676 non-selective block keys: (id % 676) -> two letters
        element_at(lit(letters.split("").map(_.toString)), (pmod(col("id"), lit(676L)) / 26L).cast("int") + 1),
        element_at(lit(letters.split("").map(_.toString)), pmod(pmod(col("id"), lit(676L)), lit(26L)).cast("int") + 1),
        lit(" entity "), (col("id") / 676L).cast("string")).as("name"))
    val pairs = time("capped ER boundary: 2M recs / 676 blocks of ~3000, cap=1000") {
      FuzzyJoinOps.fuzzyJoinJaro(
        df.select(col("id").as("id_a"), col("name").as("name_a")),
        df.select(col("id").as("id_b"), col("name").as("name_b")),
        "name_a", "name_b", minSim = 0.95, blockPrefix = 2, maxBlockSize = 1000)
        .filter(col("id_a") < col("id_b"))
        .count()
    }
    println(s"[probe]   pairs: $pairs (expected 0 — every block over cap)")
    val reported = time("overflow report over the same shape") {
      FuzzyJoinOps.jaroBlockOverflowReport(
        df.select(col("name").as("name_a")), df.select(col("name").as("name_b")),
        "name_a", "name_b", blockPrefix = 2, maxBlockSize = 1000).count()
    }
    println(s"[probe]   over-cap blocks: $reported (expected 676)")
  }

  /** Hot blocks under cap + selective tail that must still resolve. */
  def cappedSelectiveEr(spark: SparkSession): Unit = {
    val hot = spark.range(500000L).select(
      col("id"), concat(lit("xx hot "), (col("id") % 5L).cast("string")).as("name"))
    val sel = spark.range(1000L).select(
      (col("id") + 10000000L).as("id"),
      concat(lit("y"), (col("id") % 26L + 97L).cast("int").cast("char(1)"),
        lit(" firm "), (col("id") / 2L).cast("string")).as("name"))
    val df = hot.unionAll(sel)
    val resolved = time("capped ER selective tail: 0.5M hot-block + 1k selective") {
      val pairs = FuzzyJoinOps.fuzzyJoinJaro(
        df.select(col("id").as("id_a"), col("name").as("name_a")),
        df.select(col("id").as("id_b"), col("name").as("name_b")),
        "name_a", "name_b", minSim = 0.95, blockPrefix = 2, maxBlockSize = 10000)
        .filter(col("id_a") < col("id_b"))
      GraphOps.connectedComponents(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst"))).count()
    }
    println(s"[probe]   clustered endpoints: $resolved (selective families only)")
  }

  /** LPA-seeded Louvain contraction at synthetic 2M-edge scale. */
  def louvainContractionScale(spark: SparkSession): Unit = {
    // ring-of-cliques: 100k cliques of 6 (planted communities) plus
    // ring bridges — 1.6M edges
    val k = 6L
    val cliqueEdges = spark.range(100000L * k).select((col("id") / k).as("c"), pmod(col("id"), lit(k)).as("i"))
      .join(spark.range(k).select(col("id").as("j")), col("j") > col("i"))
      .select((col("c") * k + col("i")).as("src"), (col("c") * k + col("j")).as("dst"))
    val bridges = spark.range(100000L).select(
      (col("id") * k).as("src"), (pmod(col("id") + 1L, lit(100000L)) * k).as("dst"))
    val edges = cliqueEdges.unionAll(bridges)
    val q = time("louvain contraction: 100k cliques / 1.6M edges, LPA3 seed + 4 refine") {
      val g = GraphOps.canonicalize(edges)
      val lpa = GraphOps.labelPropagation(g, iters = 3)
      val r = GraphOps.louvainRefine(g, lpa, 4, "node", "label")
      GraphOps.modularityOfLouvain(r).agg(sum("q_contrib")).head.getDouble(0)
    }
    println(f"[probe]   modularity: $q%.4f (planted structure => high Q)")
  }
}
