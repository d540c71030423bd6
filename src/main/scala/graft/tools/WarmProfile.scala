package graft.tools

import graft.{GraftSession, SparkEntry}

/** Time each component of the session-shared graph build (the bench
  * `_shared_graph_build` line) — which stage of the co-order chain
  * (edges → canonical → LPA → Louvain) and the purchase side (edge
  * frame → fused ranks) owns the cost.
  *
  * Run: `sbt "runMain graft.tools.WarmProfile"`.
  */
object WarmProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def tms[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(s"[warmprof] $label ${(System.nanoTime() - t0) / 1000000} ms")
      r
    }
    val e = tms("coOrderEdges")(SparkEntry.sharedCoOrderEdges(spark, dir))
    println(s"[warmprof] nEdges=${e.count()}")
    tms("symGraph") { SparkEntry.sharedSymGraph(spark, dir); () }
    tms("lpa3") { SparkEntry.sharedLpa(spark, dir).count(); () }
    tms("louvainRefine") { SparkEntry.sharedLouvain(spark, dir).labels.count(); () }
    tms("purchaseEm") { SparkEntry.sharedPurchaseEm(spark, dir); () }
    tms("fusedRanks") { SparkEntry.sharedPurchaseRanks(spark, dir).count(); () }
    spark.stop()
  }
}
