package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamIntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1700000000000L
  private def ts(offsetSec: Long) = new java.sql.Timestamp(base + offsetSec * 1000)

  // views: (view_id, v_user, view_ts) / purchases: (purchase_id, p_user, purchase_ts)
  private val views = Seq(
    (1L, 10L, ts(0)),
    (2L, 10L, ts(100)),
    (3L, 20L, ts(0)))
  private val purchases = Seq(
    (101L, 10L, ts(50)),   // matches view 1 only (before view 2)
    (102L, 10L, ts(150)),  // matches views 1 and 2
    (103L, 10L, ts(4000)), // > 1h after both views of user 10
    (104L, 30L, ts(10)))   // no view for user 30
  private val expected = Set((1L, 101L), (1L, 102L), (2L, 102L))

  test("batch path: range-predicated equi-join with lag and key semantics") {
    val got = EventStreams.streamIntervalJoin(
        views.toDF("view_id", "v_user", "view_ts"), "v_user", "view_ts",
        purchases.toDF("purchase_id", "p_user", "purchase_ts"), "p_user", "purchase_ts",
        maxLag = "1 hour")
      .select("view_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("streaming path: both sides as real streams emit exactly the batch join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val vs = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val ps = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val joined = EventStreams.streamIntervalJoin(
      vs.toDF().toDF("view_id", "v_user", "view_ts"), "v_user", "view_ts",
      ps.toDF().toDF("purchase_id", "p_user", "purchase_ts"), "p_user", "purchase_ts",
      maxLag = "1 hour", watermark = "2 hours")
    val q = joined.select("view_id", "purchase_id").writeStream.format("memory")
      .queryName("ssj").outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // out-of-order arrival: purchases land before some views
      ps.addData(purchases.take(2): _*)
      q.processAllAvailable()
      vs.addData(views: _*)
      q.processAllAvailable()
      ps.addData(purchases.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("ssj").as[(Long, Long)].collect()
      assert(got.toSet == expected, s"stream emitted ${got.mkString(",")}")
      assert(got.length == expected.size, "each match must emit exactly once")
    } finally q.stop()
  }

  test("overlapping column names are rejected") {
    val l = views.toDF("view_id", "user", "ts")
    val r = purchases.toDF("purchase_id", "user", "pts")
    val e = intercept[IllegalArgumentException] {
      EventStreams.streamIntervalJoin(l, "user", "ts", r, "user", "pts", "1 hour")
    }
    assert(e.getMessage.contains("user"))
  }

  test("plan: the streaming join is a stream-stream inner join keyed on the user (state co-partitioned)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val vs = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val ps = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val joined = EventStreams.streamIntervalJoin(
      vs.toDF().toDF("view_id", "v_user", "view_ts"), "v_user", "view_ts",
      ps.toDF().toDF("purchase_id", "p_user", "purchase_ts"), "p_user", "purchase_ts",
      maxLag = "1 hour", watermark = "2 hours")
    // equi-key must be extracted (hash-partitionable), range stays residual
    val analyzed = joined.queryExecution.analyzed.toString
    assert(analyzed.contains("Join Inner"), analyzed)
    assert(analyzed.contains("v_user") && analyzed.contains("p_user"))
  }
}
