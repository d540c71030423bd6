package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollingAggSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)

  test("rollingAgg: trailing horizon is inclusive on both ends, per key") {
    val df = Seq(
      (1L, "u1", ts(0), 1.0),
      (2L, "u1", ts(1800), 2.0),   // 30 min later
      (3L, "u1", ts(3600), 4.0),   // exactly 1h after row 1 → row 1 still in frame
      (4L, "u1", ts(3601), 8.0),   // row 1 now out
      (5L, "u2", ts(3600), 100.0)  // different key, own frame
    ).toDF("event_id", "user_id", "ts", "value")
    val out = StatsOps.rollingAgg(df, Seq("user_id"), "ts", "value", "1 hour")
      .select("event_id", "roll_cnt", "roll_sum").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((1L, 1.0)))
    assert(out(2L) == ((2L, 3.0)))
    assert(out(3L) == ((3L, 7.0)))   // inclusive lower bound
    assert(out(4L) == ((3L, 14.0)))  // row 1 evicted
    assert(out(5L) == ((1L, 100.0))) // u2 unaffected by u1
  }

  test("rollingAgg: rows preserved, avg = sum/cnt, day horizons rejected") {
    val df = (1 to 50).map(i => (i.toLong, s"u${i % 3}", ts(i * 60L), i.toDouble))
      .toDF("event_id", "user_id", "ts", "value")
    val out = StatsOps.rollingAgg(df, Seq("user_id"), "ts", "value", "10 minutes")
    assert(out.count() == 50)
    assert(out.filter(abs(col("roll_avg") - col("roll_sum") / col("roll_cnt")) > 1e-12).count() == 0)
    intercept[IllegalArgumentException] {
      StatsOps.rollingAgg(df, Seq("user_id"), "ts", "value", "2 days")
    }
  }
}
