package graft.tools

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7c scale probes: this session's operators pushed past
  * driver scale, incl. their DOCUMENTED degenerate regimes.
  *
  * Run: `sbt "runMain graft.tools.ScaleProbeR7c /root/testdata/sf0.1"`
  * (idle machine; discard-first-run discipline applies).
  *
  *  1. rollingAgg on DENSE keys — the O(rows · rows-in-horizon)
  *     worst case the scaladoc warns about, vs a sparse-key control.
  *  2. funnel at 1M events / 100k users.
  *  3. CMS build over 10M items / 1M distinct vs exact counting.
  *  4. KS on 1M all-distinct continuous values (the documented
  *     distinct-value blowup) vs PSI's fixed bins on the same data.
  *  5. stream-stream interval join, 100k-event self-attribution.
  */
object ScaleProbeR7c {

  private def time[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- 1. rollingAgg: dense vs sparse keys, 1M rows ----
    // dense: 10 keys → ~3.6k rows per 1-hour horizon; sparse: 100k keys
    val evts = spark.range(1000000L).select(
      col("id").as("event_id"),
      (col("id") % 10).as("dense_key"),
      (col("id") % 100000).as("sparse_key"),
      timestamp_micros(lit(1700000000000000L) + col("id") * 100000L).as("ts"), // 10 rows/sec
      (col("id") % 997).cast("double").as("value"))
      .localCheckpoint(true)
    for (r <- 1 to 2) {
      time(s"rolling-sparse-1M-run$r") {
        StatsOps.rollingAgg(evts, Seq("sparse_key"), "ts", "value", "1 hour")
          .agg(sum("roll_cnt")).collect()
      }
      time(s"rolling-DENSE-1M-run$r") {
        StatsOps.rollingAgg(evts, Seq("dense_key"), "ts", "value", "1 hour")
          .agg(sum("roll_cnt")).collect()
      }
    }

    // ---- 2. funnel: 1M events, 100k users, 3 steps + noise ----
    val funnelEvts = spark.range(1000000L).select(
      (col("id") % 100000).as("user_id"),
      // type varies per (user, round): user stride 100000 ≡ 0 mod 5,
      // so fold the round index in or every user sees ONE type
      element_at(array(lit("view"), lit("click"), lit("buy"), lit("noise1"), lit("noise2")),
        (pmod(col("id") + expr("id div 100000"), lit(5)) + 1).cast("int")).as("event_type"),
      timestamp_micros(lit(1700000000000000L) + pmod(col("id") * 40503L, lit(1000000L)) * 1000000L).as("ts"))
      .localCheckpoint(true)
    for (r <- 1 to 2) time(s"funnel-1M-run$r") {
      val out = FunnelOps.funnel(funnelEvts, "user_id", "ts", "event_type",
        Seq("view", "click", "buy"))
      println("  reached histogram: " + out.groupBy("reached").count()
        .orderBy("reached").collect().mkString(" "))
    }

    // ---- 3. CMS: 10M items, 1M distinct, vs exact counting ----
    val big = spark.range(10000000L)
      .select((pmod(col("id") * 2654435761L, lit(1000000L))).cast("string").as("x"), lit("g").as("g"))
    for (r <- 1 to 2) {
      time(s"cms-build-10M-run$r") {
        val sk = SketchOps.cmsSketch(big, Seq("g"), "x")
        println("  sketch cells: " + sk.count()) // ≤ d·w = 8192
      }
      time(s"exact-count-10M-run$r") {
        big.groupBy("g", "x").count().count() // 1M result rows
      }
    }

    // ---- 4. KS distinct-value blowup vs PSI fixed bins, 1M rows ----
    val cont = spark.range(1000000L).select(
      lit("g").as("g"),
      (pmod(col("id") * 48271L, lit(2147483647L)).cast("double") / 2147483647.0).as("v"))
      .localCheckpoint(true)
    val contB = cont.select(col("g"), (col("v") * 0.97 + 0.015).as("v")).localCheckpoint(true)
    for (r <- 1 to 2) {
      time(s"ks-1M-alldistinct-run$r") {
        println("  D = " + DriftOps.ksStatistic(cont, contB, Seq("g"), "v").collect().head)
      }
      time(s"psi-1M-20bins-run$r") {
        println("  psi = " + DriftOps.psi(cont, contB, Seq("g"), "v", 0, 1, 20).collect().head)
      }
    }

    // ---- 5. stream-stream interval join on a 100k-event stream ----
    val dir = java.nio.file.Files.createTempDirectory("ssj_probe").toString
    spark.range(100000L).select(
      col("id").as("event_id"),
      (col("id") % 5000).as("user_id"),
      // type from the ROUND index (id div 5000): the user stride is
      // even, so id-parity would give each user a single type
      when(pmod(expr("id div 5000"), lit(2)) === 0, "view").otherwise("purchase").as("event_type"),
      // same-user events ~500 s apart → each view sees ~7 purchases
      // inside the 1 h lag; state carries ~5000 keys × horizon rows
      timestamp_micros(lit(1700000000000000L) + col("id") * 100000L).as("ts"))
      .write.mode("overwrite").parquet(dir)
    for (r <- 1 to 2) time(s"stream-interval-join-100k-run$r") {
      val src = spark.readStream
        .schema("event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP")
        .parquet(dir)
      val views = src.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("view_ts"))
      val purch = src.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("purchase_ts"))
      val joined = graft.streaming.EventStreams.streamIntervalJoin(
        views, "v_user", "view_ts", purch, "p_user", "purchase_ts",
        maxLag = "1 hour", watermark = "2 hours")
      val name = "ssjprobe" + r
      val q = joined.select("view_id", "purchase_id").writeStream
        .format("memory").queryName(name).outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)).start()
      try { q.processAllAvailable() } finally q.stop()
      println("  matches: " + spark.table(name).count())
    }

    spark.stop()
  }
}
