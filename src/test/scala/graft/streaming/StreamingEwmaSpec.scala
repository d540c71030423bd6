package graft.streaming

import graft.SparkSpec
import graft.operators.DriftOps
import org.apache.spark.sql.functions._

class StreamingEwmaSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1700000000000L
  private def ts(ms: Long) = new java.sql.Timestamp(base + ms)

  // 2 users, 40 events each, a planted spike at position 30
  private val rows = (for {
    u <- Seq(1L, 2L)
    i <- 0 until 40
  } yield {
    val v = if (i == 30) 500.0 else 50.0 + (i % 7)
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

  test("batch path: spike flags, warmup stays null") {
    val df = rows.toDF("user_id", "event_id", "ts", "value")
    val out = EventStreams.streamingEwmaChart(df).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getInt(3)))).toMap
    assert(out(1030L).contains(1), "spike must flag")   // user 1, i=30
    assert(out(1002L).isEmpty, "warmup row must be null (cnt < minPrior)")
    assert(out(1010L).contains(0), "normal row must not flag")
  }

  test("streamed chart equals the batch chart row-for-row, out-of-order arrival") {
    withRocksDb {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      val batch = EventStreams.streamingEwmaChart(
        rows.toDF("user_id", "event_id", "ts", "value"))
        .collect().map(_.toSeq).toSet

      val ms = MemoryStream[(Long, Long, java.sql.Timestamp, Option[Double])](spark)
      // watermark wider than the 40-minute event span: out-of-order
      // arrival is exercised, accidental late-drop is not
      val chart = EventStreams.streamingEwmaChart(
        ms.toDF().toDF("user_id", "event_id", "ts", "value"), watermark = "2 hours")
      val q = chart.writeStream.format("memory").queryName("sewma")
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      try {
        // three batches, each SHUFFLED internally; batch 2 carries
        // events older than batch 1's max (inside the watermark)
        val (b1, restRows) = scala.util.Random.shuffle(rows).splitAt(30)
        val (b2, b3) = restRows.splitAt(30)
        ms.addData(b1: _*); q.processAllAvailable()
        ms.addData(b2: _*); q.processAllAvailable()
        ms.addData(b3: _*); q.processAllAvailable()
        // watermark pusher seals all real rows
        ms.addData((99L, -1L, ts(100L * 3600 * 1000), None))
        q.processAllAvailable()
        val got = spark.table("sewma").filter(col("user_id") =!= 99L)
          .collect().map(_.toSeq).toSet
        assert(got == batch,
          s"stream ${got.size} rows vs batch ${batch.size}; diff=${(got -- batch).take(3)} / ${(batch -- got).take(3)}")
      } finally q.stop()
    }
  }

  test("null values pass through with null ewma-state change and no flag") {
    val withNull = rows.take(10) :+ ((1L, 1999L, ts(3600000L), None: Option[Double]))
    val out = EventStreams.streamingEwmaChart(
      withNull.toDF("user_id", "event_id", "ts", "value"))
      .filter(col("event_id") === 1999L).head()
    assert(out.isNullAt(3), "null value → null flag")
    // ewma carries the previous state's debiased value
    assert(!out.isNullAt(2))
  }
}
