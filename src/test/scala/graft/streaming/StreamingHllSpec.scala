package graft.streaming

import graft.SparkSpec
import graft.operators.SketchOps
import org.apache.spark.sql.functions._

class StreamingHllSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1700000000000L // window-aligned enough: same answers both paths
  private def ts(ms: Long) = new java.sql.Timestamp(base + ms)

  private val rows = (1 to 500).map { i =>
    (ts(i % 3 * 3600L * 1000), s"t${i % 2}", (i % 97).toLong) // 2 types, 97 users, 2 windows (0h,1h,2h → 2h-tumble)
  }

  test("windowed registers: batch twin estimates exact-regime cardinalities") {
    val est = SketchOps.hllEstimateFromRegisters(
      SketchOps.hllRegistersWindowed(rows.toDF("ts", "event_type", "user_id"),
        "ts", Seq("event_type"), "user_id", windowLen = "2 hours"),
      Seq("window_start", "event_type"))
    // linear-counting regime: estimate within 5% of the true distinct count
    val checked = est.collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      val e = r.getAs[Double]("hll_est")
      assert(r.getAs[Long]("registers_hit") <= 97)
      assert(e > 40 && e < 110, s"estimate $e out of plausible range")
    }
  }

  test("streaming run emits exactly the batch registers; estimate matches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val batchRegs = SketchOps.hllRegistersWindowed(
      rows.toDF("ts", "event_type", "user_id"),
      "ts", Seq("event_type"), "user_id", windowLen = "2 hours")
      .collect().map(_.toSeq).toSet

    val ms = MemoryStream[(java.sql.Timestamp, String, Long)](spark)
    val regs = SketchOps.hllRegistersWindowed(
      ms.toDF().toDF("ts", "event_type", "user_id"),
      "ts", Seq("event_type"), "user_id", windowLen = "2 hours", watermark = "10 minutes")
    val q = regs.writeStream.format("memory").queryName("shll")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      ms.addData(rows: _*)
      q.processAllAvailable()
      // push the watermark past every real window
      ms.addData((ts(100L * 3600 * 1000), "zz", 1L))
      q.processAllAvailable()
      val got = spark.table("shll").filter(col("event_type") =!= "zz")
        .collect().map(_.toSeq).toSet
      assert(got == batchRegs, s"stream emitted ${got.size} rows, batch ${batchRegs.size}")
    } finally q.stop()
  }

  test("register frames are max-mergeable: union+re-max equals whole-set registers") {
    val (a, b) = rows.splitAt(250)
    def regs(rs: Seq[(java.sql.Timestamp, String, Long)]) =
      SketchOps.hllRegistersWindowed(rs.toDF("ts", "event_type", "user_id"),
        "ts", Seq("event_type"), "user_id", "2 hours")
    val merged = regs(a).unionByName(regs(b))
      .groupBy("window_start", "event_type", "reg_idx")
      .agg(max("max_rank").as("max_rank"))
    val whole = regs(rows)
    assert(merged.collect().map(_.toSeq).toSet == whole.collect().map(_.toSeq).toSet)
    // and the estimates agree exactly (same registers → same harmonic sum)
    val em = SketchOps.hllEstimateFromRegisters(merged, Seq("window_start", "event_type"))
    val ew = SketchOps.hllEstimateFromRegisters(whole, Seq("window_start", "event_type"))
    assert(em.collect().map(_.toSeq).toSet == ew.collect().map(_.toSeq).toSet)
  }
}
