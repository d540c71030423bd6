package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class InterArrivalSpec extends SparkSpec {
  import spark.implicits._

  test("interArrivalStats: gaps per key, stats per group") {
    // user 1: events at 0s, 10s, 30s (gaps 10, 20); user 2: 0s, 5s (gap 5)
    val ev = Seq(
      (1L, 1L, "a", "2024-01-01 00:00:00"), (1L, 2L, "a", "2024-01-01 00:00:10"),
      (1L, 3L, "a", "2024-01-01 00:00:30"), (2L, 4L, "a", "2024-01-01 00:00:00"),
      (2L, 5L, "a", "2024-01-01 00:00:05"))
      .toDF("user", "eid", "t", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val r = SequenceOps.interArrivalStats(ev, "user", Seq("ts", "eid"), "ts", Seq("t")).head()
    assert(r.getLong(1) == 3L)                         // gaps: 10, 20, 5
    assert(math.abs(r.getDouble(2) - 35.0 / 3) < 1e-6) // mean
    assert(r.getDouble(3) == 5.0 && r.getDouble(4) == 20.0)
    assert(r.getDouble(5) == 10.0)                     // median
  }

  test("interArrivalStats: single-event keys contribute no gaps") {
    val ev = Seq((1L, 1L, "a", "2024-01-01 00:00:00"))
      .toDF("user", "eid", "t", "ts").withColumn("ts", col("ts").cast("timestamp"))
    assert(SequenceOps.interArrivalStats(ev, "user", Seq("ts", "eid"), "ts", Seq("t")).count() == 0)
  }

  test("ntileBuckets: equal-population deciles with deterministic ties") {
    val df = (1 to 100).map(i => ("g", i.toDouble, i.toLong)).toDF("grp", "v", "id")
    val out = MixOps.ntileBuckets(df, Seq("grp"), "v", "id", 10)
    val counts = out.groupBy("bucket").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 10L) && counts.size == 10)
    // rank order: value 1..10 -> bucket 1, 91..100 -> bucket 10
    val byV = out.select("v", "bucket").collect().map(r => r.getDouble(0) -> r.getInt(1)).toMap
    assert(byV(1.0) == 1 && byV(100.0) == 10 && byV(55.0) == 6)
  }
}
