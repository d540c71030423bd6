package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Batch Holt–Winters replay + streamed-equals-batch parity +
  * autocorrelation seasonality screens (wave-7 sequential ops).
  */
class StreamingHoltWintersSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1700000000000L
  private def ts(ms: Long) = new java.sql.Timestamp(base + ms)
  private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  // user 1: trend + period-4 seasonality (what HW exists for);
  // user 2: pure period-2 alternation (the ACF fixture)
  private val rows = (for {
    u <- Seq(1L, 2L)
    i <- 0 until 24
  } yield {
    val v = if (u == 1L) 10.0 + i * 1.5 + Seq(0.0, 4.0, -2.0, 1.0)(i % 4)
            else if (i % 2 == 0) 10.0 else 20.0
    (u, u * 1000 + i, ts(i * 60000L + u * 7), Some(v))
  })

  /** Plain-Scala replay of the documented recurrence. */
  private def replay(xs: Seq[Double], m: Int, a: Double, b0: Double, g: Double)
      : Seq[(Double, Double, Double, Option[Double])] = {
    var init = false; var l = 0.0; var b = 0.0; var i = 0L
    val s = Array.fill(m)(0.0)
    xs.map { x =>
      val idx = (i % m).toInt
      i += 1
      if (!init) { init = true; l = x; b = 0.0; (l, 0.0, 0.0, None) }
      else {
        val sHat = s(idx)
        val fc = snap9(l + b + sHat)
        val lN = snap9(a * (x - sHat) + (1.0 - a) * (l + b))
        b = snap9(b0 * (lN - l) + (1.0 - b0) * b)
        s(idx) = snap9(g * (x - lN) + (1.0 - g) * sHat)
        l = lN
        (l, b, s(idx), Some(fc))
      }
    }
  }

  test("holtWinters matches the plain-Scala replay and learns the planted season") {
    val df = rows.filter(_._1 == 1L)
      .map { case (u, e, t, v) => (u, e, t, v.get) }
      .toDF("user_id", "event_id", "ts", "value")
    val got = graft.operators.DriftOps
      .holtWinters(df, Seq("user_id"), Seq("ts", "event_id"), "value", 4, 0.5, 0.25, 0.125)
      .orderBy("event_id")
      .select("level", "trend", "seasonal", "forecast")
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val want = replay(rows.filter(_._1 == 1L).map(_._4.get), 4, 0.5, 0.25, 0.125)
    assert(got.toSeq == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
    // late-series: trend near the planted 1.5/step, one-step error small
    val lastTrend = got.last._2
    assert(math.abs(lastTrend - 1.5) < 0.5, s"trend=$lastTrend")
    val lateErr = rows.filter(_._1 == 1L).map(_._4.get).drop(20).zip(got.drop(20))
      .map { case (x, (_, _, _, Some(f))) => math.abs(x - f); case _ => 0.0 }
    assert(lateErr.max < 4.0, s"late one-step errors: $lateErr")
  }

  test("holtWinters: null values emit nulls and leave state untouched") {
    val df = Seq(
      (1L, 1L, ts(0), Some(10.0)), (1L, 2L, ts(60000), None: Option[Double]),
      (1L, 3L, ts(120000), Some(14.0))
    ).toDF("user_id", "event_id", "ts", "value")
    val out = graft.operators.DriftOps
      .holtWinters(df, Seq("user_id"), Seq("ts", "event_id"), "value", 4, 0.5, 0.25, 0.125)
      .orderBy("event_id").select("level", "forecast").collect()
    assert(out(0).getDouble(0) == 10.0 && out(0).isNullAt(1))
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    // row 3 updates from the row-1 state as if row 2 never happened:
    // i=1 → slot 1 (sHat=0), forecast = l + b + 0 = 10
    assert(out(2).getDouble(1) == 10.0)
  }

  test("streamed Holt-Winters equals the batch scan row-for-row, shuffled arrival") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      val batch = EventStreams.streamingHoltWinters(
        rows.toDF("user_id", "event_id", "ts", "value"), 4, 0.5, 0.25, 0.125)
        .collect().map(_.toSeq).toSet
      val ms = MemoryStream[(Long, Long, java.sql.Timestamp, Option[Double])](spark)
      val hw = EventStreams.streamingHoltWinters(
        ms.toDF().toDF("user_id", "event_id", "ts", "value"), 4, 0.5, 0.25, 0.125,
        watermark = "2 hours")
      val q = hw.writeStream.format("memory").queryName("shw")
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      try {
        val (b1, restRows) = new scala.util.Random(77).shuffle(rows).splitAt(16)
        val (b2, b3) = restRows.splitAt(16)
        ms.addData(b1: _*); q.processAllAvailable()
        ms.addData(b2: _*); q.processAllAvailable()
        ms.addData(b3: _*); q.processAllAvailable()
        ms.addData((99L, -1L, ts(100L * 3600 * 1000), None))
        q.processAllAvailable()
        val got = spark.table("shw").filter(col("user_id") =!= 99L)
          .collect().map(_.toSeq).toSet
        assert(got == batch,
          s"stream ${got.size} vs batch ${batch.size}; diff=${(got -- batch).take(3)} / ${(batch -- got).take(3)}")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("autocorrelation: period-2 alternation gives acf(2)=1, acf(1)=-1") {
    val df = rows.filter(_._1 == 2L).map { case (u, e, t, v) => (u, e, t, v.get) }
      .toDF("user_id", "event_id", "ts", "value")
    val acf = graft.operators.SequenceOps
      .autocorrelation(df, Seq("user_id"), Seq("ts", "event_id"), "value", maxLag = 4)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(acf(2) == 1.0 && acf(4) == 1.0, s"even lags: $acf")
    assert(acf(1) < -0.9 && acf(3) < -0.9, s"odd lags: $acf")
  }

  test("autocorrelation: constant series has zero variance -> null acf") {
    val df = (1 to 10).map(i => (1L, i.toLong, ts(i * 1000L), 5.0))
      .toDF("user_id", "event_id", "ts", "value")
    val acf = graft.operators.SequenceOps
      .autocorrelation(df, Seq("user_id"), Seq("ts", "event_id"), "value", maxLag = 2)
      .collect()
    assert(acf.length == 2 && acf.forall(_.isNullAt(3)))
  }
}
