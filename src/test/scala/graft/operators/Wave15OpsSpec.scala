package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 wave-15 operators: dedup weights, time-to-convert,
  * streaming windowed Wilson rates.
  */
class Wave15OpsSpec extends SparkSpec {
  import spark.implicits._

  private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("dedupWeights: cluster mass sums to one document, singletons stay at 1.0") {
    val docs = (1L to 6L).map(i => (i, s"d$i")).toDF("id", "x")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("member", "cluster_id")
    val w = MixOps.dedupWeights(docs, "id", clusters, "cluster_id", "member")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("dedup_weight")).toMap
    assert(w(1L) == snap9(1.0 / 3) && w(2L) == w(1L) && w(3L) == w(1L))
    assert(w(5L) == 0.5 && w(6L) == 0.5)
    assert(w(4L) == 1.0) // singleton untouched
    // total mass = number of distinct documents (2 clusters + 1 singleton ≈ 3)
    assert(math.abs(w.values.sum - 3.0) < 1e-6)
  }

  test("timeToConvert: latency measured from the FIRST in-lookback touch") {
    val df = Seq(
      (1L, ts("2024-01-10 00:00:00"), 1L, "view"),   // first touch
      (1L, ts("2024-01-11 00:00:00"), 2L, "click"),  // later touch — ignored for latency
      (1L, ts("2024-01-12 00:00:00"), 100L, "purchase"),
      (2L, ts("2024-01-10 00:00:00"), 3L, "click"),
      (2L, ts("2024-01-10 01:00:00"), 200L, "purchase")
    ).toDF("u", "ts", "eid", "typ")
    val r = FunnelOps.timeToConvert(df, "u", "ts", "eid", "typ",
        "purchase", Seq("view", "click"), 7L * 86400L)
      .collect().map(x => x.getAs[String]("channel") ->
        (x.getAs[Long]("convs"), x.getAs[Long]("min_s"), x.getAs[Double]("median_s"))).toMap
    assert(r("view") == ((1L, 2L * 86400L, 2.0 * 86400)))   // conv 100: 2 days
    assert(r("click") == ((1L, 3600L, 3600.0)))             // conv 200: 1 hour
  }

  test("rateWithCiWindowed: streamed windowed rates equal the batch twin") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val rows = (0 until 60).map { i =>
      (ts(f"2024-01-${1 + i % 3}%02d ${i % 24}%02d:00:00"), if (i % 5 == 0) 1 else 0)
    }
    val batch = EvalOps.rateWithCiWindowed(rows.toDF("ts", "lbl"), "ts", "lbl", "1 day")
      .collect().map(_.toSeq).toSet
    assert(batch.size == 3)
    val ms = MemoryStream[(java.sql.Timestamp, Int)](spark)
    val q = EvalOps.rateWithCiWindowed(ms.toDF().toDF("ts", "lbl"), "ts", "lbl",
        "1 day", watermark = "10 days")
      .writeStream.format("memory").queryName("w15rate")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      val (b1, b2) = new scala.util.Random(3).shuffle(rows).splitAt(30)
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
      ms.addData((ts("2024-06-01 00:00:00"), 0))
      q.processAllAvailable()
      val got = spark.table("w15rate")
        .filter(col("window_start") < lit("2024-05-01")).collect().map(_.toSeq).toSet
      assert(got == batch, s"stream $got vs batch $batch")
    } finally q.stop()
  }
}
