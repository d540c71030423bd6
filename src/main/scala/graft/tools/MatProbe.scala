package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.LongAdder

/** Same-JVM alternating A/B for the MiningOps multi-consumer
  * materialization (`spark.graft.mining.materialize`) — see
  * [[TriWedgeProbe]] for why cross-run comparisons are invalid on
  * the reference host.
  *
  * Run: `sbt "runMain graft.tools.MatProbe <rounds>"`
  */
object MatProbe {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpu = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) cpu.add(t.taskMetrics.executorCpuTime)
    })
    val queries = Seq("q_rules", "q_item_sim", "q_link_pred")
    val settings = Seq("true", "false")
    def setBoth(s: String): Unit = {
      spark.conf.set("spark.graft.mining.materialize", s)
      spark.conf.set("spark.graft.graph.linkPredMaterialize", s)
    }
    // discard pass per (query, setting)
    for (q <- queries; s <- settings) {
      setBoth(s)
      SparkEntry.queries(q)(spark, sfDir).count()
    }
    (1 to rounds).foreach { r =>
      for (q <- queries; s <- settings) {
        setBoth(s)
        Thread.sleep(300); cpu.reset()
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"[matprobe] round=$r q=$q%-10s materialize=$s%-5s wall=$wall%6.2fs cpu=${cpu.sum / 1e9}%7.2fs")
      }
    }
    spark.stop()
  }
}
