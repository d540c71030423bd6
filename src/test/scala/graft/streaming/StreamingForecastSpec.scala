package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingForecastSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1700000000000L
  private def ts(ms: Long) = new java.sql.Timestamp(base + ms)

  // user 1 trends upward (the case Brown's exists for), user 2 is flat
  private val rows = (for {
    u <- Seq(1L, 2L)
    i <- 0 until 30
  } yield {
    val v = if (u == 1L) 10.0 + i * 2.0 + (i % 3) else 40.0 + (i % 4)
    (u, u * 1000 + i, ts(i * 60000L + u * 7), Some(v))
  })

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("batch path: trending series forecasts ahead of level, flat stays near it") {
    val out = EventStreams.streamingBrownForecast(
      rows.toDF("user_id", "event_id", "ts", "value"), lambda = 0.25, horizon = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    val (lvl1, tr1, fc1) = out(1029L)
    assert(tr1 > 1.0 && fc1 > lvl1 + 3.0, s"trending user: level=$lvl1 trend=$tr1 fc=$fc1")
    val (lvl2, tr2, fc2) = out(2029L)
    assert(math.abs(tr2) < 1.0 && math.abs(fc2 - lvl2) < 3.0,
      s"flat user: level=$lvl2 trend=$tr2 fc=$fc2")
  }

  test("streamed forecast equals the batch scan row-for-row, shuffled arrival") {
    withRocksDb {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      val batch = EventStreams.streamingBrownForecast(
        rows.toDF("user_id", "event_id", "ts", "value"), 0.25, 3)
        .collect().map(_.toSeq).toSet

      val ms = MemoryStream[(Long, Long, java.sql.Timestamp, Option[Double])](spark)
      val fc = EventStreams.streamingBrownForecast(
        ms.toDF().toDF("user_id", "event_id", "ts", "value"), 0.25, 3,
        watermark = "2 hours")
      val q = fc.writeStream.format("memory").queryName("sbrown")
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      try {
        val (b1, restRows) = scala.util.Random.shuffle(rows).splitAt(20)
        val (b2, b3) = restRows.splitAt(20)
        ms.addData(b1: _*); q.processAllAvailable()
        ms.addData(b2: _*); q.processAllAvailable()
        ms.addData(b3: _*); q.processAllAvailable()
        ms.addData((99L, -1L, ts(100L * 3600 * 1000), None))
        q.processAllAvailable()
        val got = spark.table("sbrown").filter(col("user_id") =!= 99L)
          .collect().map(_.toSeq).toSet
        assert(got == batch,
          s"stream ${got.size} rows vs batch ${batch.size}; diff=${(got -- batch).take(3)} / ${(batch -- got).take(3)}")
      } finally q.stop()
    }
  }

  test("null values drop from the output and never touch the state") {
    val withNull = rows.take(5) ++ Seq(
      (1L, 1998L, ts(290000L), None: Option[Double]),
      (1L, 1999L, ts(300000L), Some(30.0)))
    val out = EventStreams.streamingBrownForecast(
      withNull.toDF("user_id", "event_id", "ts", "value"), 0.25, 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(6)).toMap
    assert(!out.contains(1998L), "null-value row must not emit")
    val without = EventStreams.streamingBrownForecast(
      (rows.take(5) :+ ((1L, 1999L, ts(300000L), Some(30.0))))
        .toDF("user_id", "event_id", "ts", "value"), 0.25, 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(6)).toMap
    assert(out(1999L) == without(1999L), "null must not perturb the smoother state")
  }
}
