package graft.tools

import graft.operators.GraphOps
import graft.sources.BioLoader
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase decomposition for the iterative-graph bench tail
  * (q_pagerank / q_ppr / q_hits): how much of the steady-state
  * per-query seconds is the edge-frame materialization vs the
  * per-round join/aggregate work vs fixed job-scheduling floor.
  * Steady-state discipline: a full discard pass first, then the
  * measured pass.
  */
object GraphPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    def edges(): DataFrame = {
      val li = BioLoader.load(spark, s"$sfDir/lineitem.parquet").select("l_orderkey", "l_suppkey")
      val ord = BioLoader.load(spark, s"$sfDir/orders.parquet").select("o_orderkey", "o_custkey")
      ord.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
    }

    // discard pass: page cache + codegen warm
    GraphOps.pageRank(edges(), iters = 3).count()
    GraphOps.hits(edges(), iters = 2).count()

    t("edge-frame build only (join+repartition+dedup+deg+persist+count)") {
      val em = edges().select(col("src"), col("dst"))
        .repartition(col("src"))
        .dropDuplicates(Seq("src", "dst"))
        .withColumn("deg", count(lit(1))
          .over(org.apache.spark.sql.expressions.Window.partitionBy(col("src"))).cast("double"))
        .persist()
      em.count()
      em.unpersist()
    }
    t("pageRank iters=1") { GraphOps.pageRank(edges(), iters = 1).count() }
    t("pageRank iters=3") { GraphOps.pageRank(edges(), iters = 3).count() }
    t("pageRank iters=6") { GraphOps.pageRank(edges(), iters = 6).count() }
    t("hits iters=1") { GraphOps.hits(edges(), iters = 1).count() }
    t("hits iters=2") { GraphOps.hits(edges(), iters = 2).count() }
    t("hits iters=4") { GraphOps.hits(edges(), iters = 4).count() }
    spark.stop()
  }
}
