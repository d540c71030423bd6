package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.LongAdder

/** Same-JVM alternating A/B for the triangle wedge-join variants —
  * the only comparison this host's 2-3x hypervisor oscillation
  * cannot corrupt: variants interleave within one session, so any
  * choke hits all variants' samples with equal probability.
  * Reports wall + summed task CPU per sample.
  *
  * Run: `sbt "runMain graft.tools.TriWedgeProbe <rounds>"`
  */
object TriWedgeProbe {
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
    val variants = Seq("e1e2", "self", "selfhash")
    val fn = SparkEntry.queries("q_triangles")
    // discard: shared graph build + codegen warm on every variant
    variants.foreach { v =>
      spark.conf.set("spark.graft.graph.triWedgeVariant", v)
      fn(spark, sfDir).count()
    }
    (1 to rounds).foreach { r =>
      variants.foreach { v =>
        spark.conf.set("spark.graft.graph.triWedgeVariant", v)
        Thread.sleep(300); cpu.reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"[triwedge] round=$r variant=$v%-8s wall=$wall%6.2fs cpu=${cpu.sum / 1e9}%7.2fs")
      }
    }
    spark.stop()
  }
}
