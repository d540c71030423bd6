package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 wave-9 operators: rolling HLL actives, streaming OHLC
  * bars, period-over-period deltas.
  */
class Wave9OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("hllRollingDistinct: windows union the right days and track exact counts closely") {
    // day 1: users 1-50; day 2: users 26-75; day 3: users 200-209
    val rows =
      (1 to 50).map(u => (u.toLong, ts("2024-01-01 10:00:00"))) ++
      (26 to 75).map(u => (u.toLong, ts("2024-01-02 10:00:00"))) ++
      (200 to 209).map(u => (u.toLong, ts("2024-01-03 10:00:00")))
    val df = rows.toDF("user_id", "ts")
    val r = SketchOps.hllRollingDistinct(df, "ts", "user_id", Seq(1, 2), p = 12)
      .collect().map(x => x.getDate(0).toString -> (x.getDouble(1), x.getDouble(2))).toMap
    // linear-counting regime at these cardinalities: estimates within ~5%
    def close(est: Double, truth: Int) =
      math.abs(est - truth) <= math.max(2.0, truth * 0.05)
    assert(close(r("2024-01-01")._1, 50) && close(r("2024-01-01")._2, 50), r.toString)
    assert(close(r("2024-01-02")._1, 50) && close(r("2024-01-02")._2, 75), r.toString) // union dedups 26-50
    assert(close(r("2024-01-03")._1, 10) && close(r("2024-01-03")._2, 60), r.toString)
    // the 2-day window is register-max merged, never below its own day
    r.values.foreach { case (d1, d2) => assert(d2 >= d1 - 1e-6) }
  }

  test("hllRollingDistinct: report days clamp to observed days") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("user_id", "ts")
    val days = SketchOps.hllRollingDistinct(df, "ts", "user_id", Seq(1, 28)).collect()
    assert(days.length == 1 && days.head.getDate(0).toString == "2024-01-01")
  }

  test("ohlcBarsWindowed: batch twin equals ohlcBars on epoch-aligned buckets") {
    val df = Seq(
      (1L, ts("2024-01-01 01:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 23:00:00"), 2L, 30.0),
      (1L, ts("2024-01-02 05:00:00"), 3L, 20.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val a = SequenceOps.ohlcBars(df, Seq("user_id"), "ts", Seq("ts", "event_id"),
      "value", 86400L).collect().map(_.toSeq).toSet
    val b = SequenceOps.ohlcBarsWindowed(df, Seq("user_id"), "ts", Seq("ts", "event_id"),
      "value", "1 day")
      .select("user_id", "bucket_start", "n", "open", "high", "low", "close", "sum", "mean")
      .collect().map(_.toSeq).toSet
    // ohlcBars column order: keys, bucket_start, n, open, high, low, close, sum, mean
    assert(a == b, s"batch twin drift: $a vs $b")
  }

  test("ohlcBarsWindowed: streamed bars equal the batch twin") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val rows = (0 until 40).map { i =>
      (1L + i % 3, ts(f"2024-01-${1 + i % 5}%02d ${i % 24}%02d:00:00"), i.toLong, 10.0 + i)
    }
    val batch = SequenceOps.ohlcBarsWindowed(
      rows.toDF("user_id", "ts", "event_id", "value"),
      Seq("user_id"), "ts", Seq("ts", "event_id"), "value", "1 day")
      .collect().map(_.toSeq).toSet
    val ms = MemoryStream[(Long, java.sql.Timestamp, Long, Double)](spark)
    val bars = SequenceOps.ohlcBarsWindowed(
      ms.toDF().toDF("user_id", "ts", "event_id", "value"),
      // watermark longer than the fixture's 5-day span: shuffled
      // cross-batch arrival must never count as late here
      Seq("user_id"), "ts", Seq("ts", "event_id"), "value", "1 day", watermark = "6 days")
    val q = bars.writeStream.format("memory").queryName("w9bars")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      val (b1, b2) = new scala.util.Random(9).shuffle(rows).splitAt(20)
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
      ms.addData((99L, ts("2024-06-01 00:00:00"), -1L, 0.0)) // watermark pusher
      q.processAllAvailable()
      val got = spark.table("w9bars").filter(col("user_id") =!= 99L)
        .collect().map(_.toSeq).toSet
      assert(got == batch, s"stream ${got.size} vs batch ${batch.size}")
    } finally q.stop()
  }

  test("periodOverPeriod: weekly deltas and pct with gap visibility") {
    val df = Seq(
      ("a", ts("2024-01-01 10:00:00"), 10.0), ("a", ts("2024-01-02 10:00:00"), 10.0),
      ("a", ts("2024-01-08 10:00:00"), 30.0),  // next ISO week: 20 → 30
      ("a", ts("2024-01-22 10:00:00"), 15.0)   // gap week — prev is Jan 8's week
    ).toDF("k", "ts", "v")
    val r = SequenceOps.periodOverPeriod(df, Seq("k"), "ts", "v", "week")
      .orderBy("period").collect()
    assert(r.length == 3)
    assert(r(0).isNullAt(r(0).fieldIndex("prev_period")) &&
      r(0).isNullAt(r(0).fieldIndex("pct_change")))
    assert(r(1).getAs[Double]("delta") == 10.0 &&
      r(1).getAs[Double]("pct_change") == 0.5)
    assert(r(2).getAs[java.sql.Date]("prev_period").toString == "2024-01-08")
    assert(r(2).getAs[Double]("delta") == -15.0 &&
      r(2).getAs[Double]("pct_change") == -0.5)
  }
}
