package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingCusumSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1700000000000L
  private def ts(ms: Long) = new java.sql.Timestamp(base + ms)

  // 2 users around target 50; user 1 drifts to 58 after position 20
  // (each step adds 58-50-4=4 to S+ under k=4 — a sustained small
  // shift a pointwise band misses), user 2 stays in control
  private val rows = (for {
    u <- Seq(1L, 2L)
    i <- 0 until 40
  } yield {
    val v =
      if (u == 1L && i >= 20) 58.0 + (i % 3)
      else 48.0 + (i % 5)
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

  test("batch path: the sustained small shift alarms, in-control stays quiet") {
    val df = rows.toDF("user_id", "event_id", "ts", "value")
    val out = EventStreams.streamingCusum(df, target = 50.0, k = 4.0, h = 30.0)
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(out(1039L) == 1, "user 1's drift must alarm by the end")
    assert((0 until 40).forall(i => out(2000L + i) == 0), "user 2 must never alarm")
    assert(out(1010L) == 0, "user 1 pre-drift must not alarm")
  }

  test("streamed CUSUM equals the batch scan row-for-row, out-of-order arrival") {
    withRocksDb {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      val batch = EventStreams.streamingCusum(
        rows.toDF("user_id", "event_id", "ts", "value"), 50.0, 4.0, 30.0)
        .collect().map(_.toSeq).toSet

      val ms = MemoryStream[(Long, Long, java.sql.Timestamp, Option[Double])](spark)
      val chart = EventStreams.streamingCusum(
        ms.toDF().toDF("user_id", "event_id", "ts", "value"), 50.0, 4.0, 30.0,
        watermark = "2 hours")
      val q = chart.writeStream.format("memory").queryName("scusum")
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      try {
        val (b1, restRows) = scala.util.Random.shuffle(rows).splitAt(30)
        val (b2, b3) = restRows.splitAt(30)
        ms.addData(b1: _*); q.processAllAvailable()
        ms.addData(b2: _*); q.processAllAvailable()
        ms.addData(b3: _*); q.processAllAvailable()
        ms.addData((99L, -1L, ts(100L * 3600 * 1000), None))
        q.processAllAvailable()
        val got = spark.table("scusum").filter(col("user_id") =!= 99L)
          .collect().map(_.toSeq).toSet
        assert(got == batch,
          s"stream ${got.size} rows vs batch ${batch.size}; diff=${(got -- batch).take(3)} / ${(batch -- got).take(3)}")
      } finally q.stop()
    }
  }

  test("null values emit null statistics and leave the sums untouched") {
    val withNull = rows.take(5) ++ Seq(
      (1L, 1998L, ts(290000L), None: Option[Double]),
      (1L, 1999L, ts(300000L), Some(58.0)))
    val out = EventStreams.streamingCusum(
      withNull.toDF("user_id", "event_id", "ts", "value"), 50.0, 4.0, 30.0)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out(1998L).isEmpty, "null value → null s_pos")
    // s_pos after the null is the same as if the null row were absent
    val without = EventStreams.streamingCusum(
      (rows.take(5) :+ ((1L, 1999L, ts(300000L), Some(58.0))))
        .toDF("user_id", "event_id", "ts", "value"), 50.0, 4.0, 30.0)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out(1999L) == without(1999L), "null must not perturb the state")
  }
}
