package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  // deterministic pseudo-random fixture spanning negative and positive
  // coordinates, with interval spans well above and below binWidth
  private lazy val pointRows =
    (1 to 400).map(i => (i.toLong, ((i * 7919) % 2001 - 1000).toDouble / 3.0))
  private lazy val points = pointRows.toDF("p_id", "p_x")
  private lazy val intervals =
    (1 to 60).map { i =>
      val lo = ((i * 104729) % 1801 - 900).toDouble / 3.0
      val span = ((i * 31) % 120).toDouble // 0..119, bins of width 10 → up to 12 bins
      (i.toLong, lo, lo + span)
    }.toDF("iv_id", "iv_lo", "iv_hi")

  private def thetaPairs(): Set[(Long, Long)] =
    points.crossJoin(intervals)
      .filter($"p_x" >= $"iv_lo" && $"p_x" <= $"iv_hi")
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSet

  test("pointInInterval matches the theta join exactly, each pair once") {
    val got = RangeJoinOps.pointInInterval(points, "p_x", intervals, "iv_lo", "iv_hi", binWidth = 10.0)
      .select("p_id", "iv_id").as[(Long, Long)].collect()
    assert(got.length === got.toSet.size, "duplicate pairs emitted")
    assert(got.toSet === thetaPairs())
    assert(got.nonEmpty)
  }

  test("pointInInterval is binWidth-invariant (tiny and huge bins give the same result)") {
    val expected = thetaPairs()
    for (w <- Seq(0.7, 1000.0)) {
      val got = RangeJoinOps.pointInInterval(points, "p_x", intervals, "iv_lo", "iv_hi", binWidth = w)
        .select("p_id", "iv_id").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"dup pairs at binWidth=$w")
      assert(got.toSet === expected, s"mismatch at binWidth=$w")
    }
  }

  test("pointInInterval boundary points (== lo, == hi) are included; nulls and inverted intervals drop") {
    def jd(x: Double): java.lang.Double = java.lang.Double.valueOf(x)
    val p = Seq[(Long, java.lang.Double)]((1L, jd(5.0)), (2L, jd(10.0)), (3L, jd(10.0000001)), (4L, jd(4.9999999)), (5L, null))
      .toDF("p_id", "p_x")
    val iv = Seq[(Long, java.lang.Double, java.lang.Double)]((10L, jd(5.0), jd(10.0)), (11L, jd(8.0), jd(7.0)), (12L, null, jd(9.0)))
      .toDF("iv_id", "iv_lo", "iv_hi")
    val got = RangeJoinOps.pointInInterval(p, "p_x", iv, "iv_lo", "iv_hi", binWidth = 2.0)
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (2L, 10L)))
  }

  test("intervalOverlap matches the theta join exactly, each pair once (closed ends touch counts)") {
    val lhs = intervals.toDF("a_id", "a_lo", "a_hi")
    val rhs = (1 to 40).map { i =>
      val lo = ((i * 7907) % 1501 - 750).toDouble / 3.0
      (100L + i, lo, lo + ((i * 17) % 90).toDouble)
    }.toDF("b_id", "b_lo", "b_hi")
    val expected = lhs.crossJoin(rhs)
      .filter($"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val got = RangeJoinOps.intervalOverlap(lhs, "a_lo", "a_hi", rhs, "b_lo", "b_hi", binWidth = 25.0)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(got.length === got.toSet.size, "duplicate pairs emitted")
    assert(got.toSet === expected)
    assert(got.nonEmpty)
  }

  test("timestamp axis: events enriched by containing time windows") {
    val ev = graft.sources.BioLoader.nanosToTimestamp(
      spark.read.parquet(s"$sfDir/events.parquet"), "ts").select($"event_id", $"ts").limit(200)
    val base = ev.agg(min($"ts")).head().getTimestamp(0)
    val windows = (0 until 8).map { i =>
      (i.toLong,
        new java.sql.Timestamp(base.getTime + i * 3600L * 1000),
        new java.sql.Timestamp(base.getTime + (i + 2) * 3600L * 1000))
    }.toDF("w_id", "w_start", "w_end")
    val got = RangeJoinOps.pointInInterval(ev, "ts", windows, "w_start", "w_end", binWidth = 3600.0)
      .select("event_id", "w_id").as[(Long, Long)].collect().toSet
    val expected = ev.crossJoin(windows)
      .filter($"ts" >= $"w_start" && $"ts" <= $"w_end")
      .select("event_id", "w_id").as[(Long, Long)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("plan: binned range join is a hash equi-join — no CartesianProduct / BroadcastNestedLoopJoin") {
    val shuffled = RangeJoinOps.pointInInterval(points, "p_x", intervals, "iv_lo", "iv_hi", binWidth = 10.0)
    val ps = planOf(shuffled)
    assert(!ps.contains("CartesianProduct") && !ps.contains("BroadcastNestedLoopJoin"), ps)
    val bcast = RangeJoinOps.pointInInterval(points, "p_x", intervals, "iv_lo", "iv_hi",
      binWidth = 10.0, broadcastIntervals = true)
    val pb = planOf(bcast)
    assert(pb.contains("BroadcastHashJoin"), pb)
    assert(!pb.contains("SortMergeJoin") && !pb.contains("CartesianProduct"), pb)
  }

  test("stream-static (M10): the identical operator enriches a stream, matching the batch result") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[(Long, Double)](spark)
    val streamed = RangeJoinOps.pointInInterval(
      ms.toDF().toDF("p_id", "p_x"), "p_x", intervals, "iv_lo", "iv_hi",
      binWidth = 10.0, broadcastIntervals = true)
    val q = streamed.writeStream.format("memory").queryName("range_stream").outputMode("append").start()
    try {
      ms.addData(pointRows: _*)
      q.processAllAvailable()
      val got = spark.table("range_stream").select("p_id", "iv_id").as[(Long, Long)].collect().toSet
      assert(got === thetaPairs())
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("column-name collision across sides is rejected") {
    val e = intercept[IllegalArgumentException] {
      RangeJoinOps.pointInInterval(points, "p_x", points, "p_x", "p_x", binWidth = 1.0)
    }
    assert(e.getMessage.contains("disjoint"))
  }
}
