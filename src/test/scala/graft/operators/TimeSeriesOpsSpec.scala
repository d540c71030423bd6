package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)

  test("twap: duration weighting beats the naive mean on bursty samples") {
    // value 100 held for 10s, then a burst of 0s each held 1s:
    // twap = (100*10 + 0*3) / 13; naive avg of (100,0,0,0) = 25
    val ev = Seq(
      (1L, 1L, ts(0), 100.0), (1L, 2L, ts(10), 0.0),
      (1L, 3L, ts(11), 0.0), (1L, 4L, ts(12), 0.0), (1L, 5L, ts(13), 7.0))
      .toDF("k", "eid", "ts", "v")
    val r = SequenceOps.twap(ev, "k", Seq("ts", "eid"), "ts", "v").head()
    assert(r.getLong(1) == 4L)                        // 4 intervals (last row has no next)
    assert(r.getDouble(2) == 13.0)                    // span
    assert(math.abs(r.getDouble(3) - 1000.0 / 13.0) < 1e-8, s"twap ${r.getDouble(3)}")
  }

  test("twap: single-event keys drop (no interval)") {
    val ev = Seq((1L, 1L, ts(0), 5.0)).toDF("k", "eid", "ts", "v")
    assert(SequenceOps.twap(ev, "k", Seq("ts", "eid"), "ts", "v").count() == 0)
  }

  test("stateRuns: maximal runs with bounds; state changes split, returns re-open") {
    val ev = Seq(
      (1L, 1L, ts(0), "up"), (1L, 2L, ts(10), "up"), (1L, 3L, ts(20), "down"),
      (1L, 4L, ts(30), "up"), (2L, 5L, ts(0), "up"))
      .toDF("k", "eid", "ts", "st")
    val runs = SequenceOps.stateRuns(ev, "k", Seq("ts", "eid"), "ts", "st")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getLong(4))).toSet
    assert(runs == Set(
      (1L, "up", ts(0), 2L), (1L, "down", ts(20), 1L),
      (1L, "up", ts(30), 1L), (2L, "up", ts(0), 1L)))
  }

  test("laggedCorrelation: a shifted copy correlates perfectly at its lag") {
    // clicks at buckets 0..19 with count i%5+1; errors = same series
    // shifted 2 buckets later
    val clicks = for (i <- 0 until 20; _ <- 0 until (i % 5) + 1)
      yield (1000L + i, "click", ts(i * 3600L))
    val errors = for (i <- 0 until 20; _ <- 0 until (i % 5) + 1)
      yield (2000L + i, "error", ts((i + 2) * 3600L))
    val ev = (clicks ++ errors).map { case (id, t, s) => (id, t, s) }
      .toDF("event_id", "event_type", "ts")
    val out = SequenceOps.laggedCorrelation(ev, "event_type", "ts", "click", "error",
        bucketSeconds = 3600L, maxLag = 3)
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out(2).exists(c => math.abs(c - 1.0) < 1e-8), s"lag-2 must be 1.0: $out")
    assert(out(0).exists(c => c < 0.99), s"lag-0 must not be perfect: $out")
  }
}
