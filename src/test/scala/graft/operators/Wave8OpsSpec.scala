package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 wave-8 operators: clipped n-gram P/R/F1, OHLC bars,
  * stride-scheduled interleave.
  */
class Wave8OpsSpec extends SparkSpec {
  import spark.implicits._

  private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  test("ngramPrf: clipping stops repeated-gram credit farming") {
    val df = Seq(
      (1L, "the cat sat", "the cat sat"),            // identical → P=R=F1=1
      (2L, "the the the the", "the the end"),        // cand 'the the'×3 clipped at ref's 1
      (3L, "alpha beta", "gamma delta"),             // disjoint → 0
      (4L, "one", "one")                             // < 2 tokens → null metrics
    ).toDF("id", "cand", "ref")
    val r = EvalOps.ngramPrf(df, "id", "cand", "ref", n = 2)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getDouble(4) == 1.0 && r(1L).getDouble(5) == 1.0 && r(1L).getDouble(6) == 1.0)
    // cand grams: [the the, the the, the the]; ref grams: [the the, the end]
    assert(r(2L).getLong(1) == 3 && r(2L).getLong(2) == 2 && r(2L).getLong(3) == 1)
    assert(r(2L).getDouble(4) == snap9(1.0 / 3) && r(2L).getDouble(5) == 0.5)
    // disjoint: overlap 0, P = R = 0, so F1's 2pr/(p+r) is degenerate → NULL
    assert(r(3L).getLong(3) == 0 && r(3L).getDouble(4) == 0.0 && r(3L).isNullAt(6))
    assert(r(4L).isNullAt(4) && r(4L).isNullAt(5) && r(4L).isNullAt(6))
    assert(r(4L).getLong(1) == 0 && r(4L).getLong(2) == 0)
  }

  test("ngramPrf: f1 is the harmonic mean of the snapped P/R") {
    val df = Seq((1L, "a b c d", "b c d e")).toDF("id", "cand", "ref")
    val r = EvalOps.ngramPrf(df, "id", "cand", "ref", n = 2).collect().head
    // cand [a b, b c, c d]; ref [b c, c d, d e] → overlap 2
    val p = snap9(2.0 / 3); val rec = snap9(2.0 / 3)
    assert(r.getDouble(4) == p && r.getDouble(5) == rec)
    assert(r.getDouble(6) == snap9(2.0 * p * rec / (p + rec)))
  }

  test("ohlcBars: open/close follow the (ts, id) order, buckets split on the boundary") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val df = Seq(
      (1L, ts(0), 1L, 10.0), (1L, ts(30), 2L, 50.0), (1L, ts(59), 3L, 20.0),
      (1L, ts(60), 4L, 99.0),                       // next bucket
      (2L, ts(10), 5L, 7.0), (2L, ts(10), 6L, 8.0)  // same ts — id breaks the tie
    ).toDF("user_id", "ts", "event_id", "value")
    val r = SequenceOps.ohlcBars(df, Seq("user_id"), "ts", Seq("ts", "event_id"),
        "value", bucketSeconds = 60L)
      .collect().map(x => (x.getLong(0), x.getTimestamp(1).getTime / 1000) ->
        (x.getLong(2), x.getDouble(3), x.getDouble(4), x.getDouble(5), x.getDouble(6))).toMap
    assert(r((1L, 0L)) == ((3L, 10.0, 50.0, 10.0, 20.0)))
    assert(r((1L, 60L)) == ((1L, 99.0, 99.0, 99.0, 99.0)))
    assert(r((2L, 0L)) == ((2L, 7.0, 8.0, 7.0, 8.0)))
  }

  test("interleaveBySource: vt order interleaves proportionally at every prefix") {
    val docs = (0 until 30).map(i => (i.toLong, if (i < 20) "hot" else "cold"))
      .toDF("id", "source")
    val out = MixOps.interleaveBySource(docs, "source", Seq("id"),
        Map("hot" -> 2.0), defaultWeight = 1.0)
      .orderBy("vt", "source").collect()
    // first 3 scheduled: hot(vt=.5), hot(vt=1), cold(vt=1) — 2:1 from the start
    val first6 = out.take(6).map(_.getString(1)).toSeq
    assert(first6.count(_ == "hot") == 4 && first6.count(_ == "cold") == 2, first6.toString)
    // every prefix of the schedule holds the ratio within one stride
    val running = out.map(_.getString(1)).scanLeft((0, 0)) {
      case ((h, c), "hot") => (h + 1, c)
      case ((h, c), _) => (h, c + 1)
    }.drop(1)
    running.take(28).foreach { case (h, c) =>
      assert(math.abs(h - 2 * c) <= 2, s"prefix drifted: hot=$h cold=$c") }
    // vt formula: rank/weight snapped
    val vts = out.map(r => (r.getString(1), r.getInt(2), r.getDouble(3)))
    vts.foreach { case (s, rk, vt) =>
      val w = if (s == "hot") 2.0 else 1.0
      assert(vt == snap9(rk / w), s"vt($s, $rk)=$vt") }
  }
}
