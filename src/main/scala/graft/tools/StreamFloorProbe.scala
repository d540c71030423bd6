package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Decompose the per-query streaming bench floor (~2-3 s × 16
  * registry q_stream_* queries): how much is query START (source
  * metadata log + state store init + codegen), the data batches,
  * the trailing QUIESCE wait (fixed 400 ms quiet-window today), and
  * STOP. Run twice per variant — the second run is the steady-state
  * shape the bench grades.
  *
  * Run: `sbt "runMain graft.tools.StreamFloorProbe"`.
  */
object StreamFloorProbe {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (pass <- 1 to 3) {
      phases(spark, dir, quietMs = 150, pass = s"p$pass-procTime", stateParts = 8)
    }
    for (pass <- 1 to 3) {
      availableNow(spark, dir, s"p$pass-availNow")
    }
    // tmpfs checkpoint variant: how much of the floor is checkpoint
    // file I/O (offset WAL, commit log, state delta files)?
    for (pass <- 1 to 3) {
      availableNow(spark, dir, s"p$pass-availNow-shm",
        ckpt = Some(s"/dev/shm/graft-floorprobe-$pass"))
    }
    // state-partition sweep ON tmpfs: with the I/O latency gone, is
    // the per-partition store/task overhead now visible?
    for (sp <- Seq(1, 2, 4, 16); pass <- 1 to 2) {
      availableNow(spark, dir, s"p$pass-shm-sp$sp",
        ckpt = Some(s"/dev/shm/graft-floorprobe-sp$sp-$pass"), stateParts = sp)
    }
    spark.stop()
  }

  /** Same shape driven by Trigger.AvailableNow: the engine plans all
    * available input, runs the trailing watermark batch, and
    * terminates — no quiesce heuristic. rows must match the
    * ProcessingTime variant (9115 = closed windows incl. eviction).
    */
  def availableNow(spark: SparkSession, dir: String, pass: String,
      ckpt: Option[String] = None, stateParts: Int = 8): Unit = {
    val t0 = t()
    val ev = spark.readStream
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, session_hint STRING")
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .select((col("ts") / 1000L).cast("timestamp").as("ts"), col("event_type"), col("user_id"))
    val agg = graft.streaming.EventStreams.withStatePartitions(spark, stateParts) {
      ev.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "3 days").as("w"), col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("nd"))
        .select(col("w.start").as("ws"), col("event_type"), col("nd"))
    }
    val name = "floorprobe" + java.lang.Long.toHexString(System.nanoTime())
    val t1 = t()
    val w0 = agg.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    // start INSIDE the scope: the query captures shuffle partitions
    // (= state partition count) at start, like the registry sites
    val q = graft.streaming.EventStreams.withStatePartitions(spark, stateParts) {
      ckpt.fold(w0)(c => w0.option("checkpointLocation", s"$c/$name")).start()
    }
    val t2 = t()
    q.awaitTermination()
    val t3 = t()
    val n = spark.table(name).count()
    println(s"[floor] $pass rows=$n build=${ms(t0, t1)} start=${ms(t1, t2)} " +
      s"await=${ms(t2, t3)} total=${ms(t0, t3)}")
    q.recentProgress.foreach { p =>
      println(s"[floor]   batch=${p.batchId} rows=${p.numInputRows} " +
        s"durations=${new java.util.TreeMap[String, java.lang.Long](p.durationMs)}")
    }
  }

  private def t(): Long = System.nanoTime()
  private def ms(a: Long, b: Long): Long = (b - a) / 1000000L

  /** The q_stream_hll shape: windowed stateful agg over the events
    * file source + a far-future pusher, 8 state partitions — the
    * modal registry streaming query.
    */
  def phases(spark: SparkSession, dir: String, quietMs: Long, pass: String, stateParts: Int = 8): Unit = {
    val t0 = t()
    val ev = spark.readStream
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, session_hint STRING")
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .select((col("ts") / 1000L).cast("timestamp").as("ts"), col("event_type"), col("user_id"))
    val agg = graft.streaming.EventStreams.withStatePartitions(spark, stateParts) {
      ev.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "3 days").as("w"), col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("nd"))
        .select(col("w.start").as("ws"), col("event_type"), col("nd"))
    }
    val name = "floorprobe" + java.lang.Long.toHexString(System.nanoTime())
    val t1 = t()
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    val t2 = t()
    q.processAllAvailable()
    val t3 = t()
    // the bench harness's quiet-window quiesce
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var lastSeen = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
    var quietSince = System.nanoTime()
    while (System.nanoTime() - quietSince < quietMs * 1000 * 1000 &&
        System.nanoTime() < deadline) {
      Thread.sleep(5)
      val b = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
      if (b != lastSeen) { lastSeen = b; quietSince = System.nanoTime() }
    }
    val t4 = t()
    q.stop()
    val t5 = t()
    val n = spark.table(name).count()
    println(s"[floor] $pass rows=$n build=${ms(t0, t1)} start=${ms(t1, t2)} " +
      s"process=${ms(t2, t3)} quiesce=${ms(t3, t4)} stop=${ms(t4, t5)} total=${ms(t0, t5)}")
    q.recentProgress.foreach { p =>
      val d = p.durationMs
      println(s"[floor]   batch=${p.batchId} rows=${p.numInputRows} " +
        s"durations=${new java.util.TreeMap[String, java.lang.Long](d)}")
    }
  }
}
