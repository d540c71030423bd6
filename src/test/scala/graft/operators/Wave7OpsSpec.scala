package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 wave-7 operators: fairness report, n-gram novelty,
  * rolling active users, multi-touch attribution.
  */
class Wave7OpsSpec extends SparkSpec {
  import spark.implicits._

  private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  test("fairnessReport: selection rates, 80%-rule ratio and equal-opportunity gap") {
    // group A: 4 rows, 3 selected (rate 0.75), truth 2 pos both selected → tpr 1.0
    // group B: 4 rows, 1 selected (rate 0.25), truth 2 pos one selected → tpr 0.5
    val df = Seq(
      ("A", 1, 0.9), ("A", 1, 0.8), ("A", 0, 0.7), ("A", 0, 0.1),
      ("B", 1, 0.9), ("B", 1, 0.2), ("B", 0, 0.3), ("B", 0, 0.4)
    ).toDF("grp", "lbl", "score")
    val r = EvalOps.fairnessReport(df, "grp", "lbl", "score", 0.5)
      .collect().map(x => x.getString(0) -> x).toMap
    val a = r("A"); val b = r("B")
    assert(a.getAs[Double]("sel_rate") == 0.75 && b.getAs[Double]("sel_rate") == 0.25)
    assert(a.getAs[Double]("di_ratio") == 1.0)
    assert(b.getAs[Double]("di_ratio") == snap9(0.25 / 0.75))
    assert(a.getAs[Double]("tpr") == 1.0 && b.getAs[Double]("tpr") == 0.5)
    assert(a.getAs[Double]("eq_opp_gap") == 0.0 && b.getAs[Double]("eq_opp_gap") == 0.5)
    assert(a.getAs[Double]("fpr") == 0.5 && b.getAs[Double]("fpr") == 0.0)
  }

  test("fairnessReport: empty truth classes null their rates; all-unselected nulls di_ratio") {
    val df = Seq(("A", 1, 0.9), ("A", 1, 0.8), ("B", 0, 0.1)).toDF("grp", "lbl", "score")
    val r = EvalOps.fairnessReport(df, "grp", "lbl", "score", 0.5)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("A").isNullAt(r("A").fieldIndex("fpr"))) // A has no negatives
    assert(r("B").isNullAt(r("B").fieldIndex("tpr"))) // B has no positives
    // nobody selected anywhere → max rate 0 → di_ratio NULL everywhere
    val none = EvalOps.fairnessReport(df, "grp", "lbl", "score", 2.0).collect()
    assert(none.forall(x => x.isNullAt(x.fieldIndex("di_ratio"))))
  }

  test("ngramNovelty: verbatim copy scores 0, disjoint text scores 1, overlap is the exact fraction") {
    val ref = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("id", "text")
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // all 4 trigrams seen
      (11L, "nothing shared here at all friend"),   // fully novel
      (12L, "alpha beta gamma NEW delta epsilon")   // 1 of 4 trigrams seen
    ).toDF("id", "text")
    val r = DedupOps.ngramNovelty(docs, ref, "text", "id", n = 3)
      .collect().map(x => x.getLong(0) -> (x.getInt(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(10L) == ((4, 0L, 0.0)), s"copy: ${r(10L)}")
    assert(r(11L) == ((4, 4L, 1.0)), s"novel: ${r(11L)}")
    assert(r(12L) == ((4, 3L, 0.75)), s"partial: ${r(12L)}")
  }

  test("ngramNovelty: short docs use the whole-window rule; null/empty text yields 0 grams") {
    val ref = Seq((1L, "tiny doc")).toDF("id", "text")
    val docs = Seq((10L, "tiny doc"), (11L, "other short"), (12L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val r = DedupOps.ngramNovelty(docs, ref, "text", "id", n = 5)
      .collect().map(x => x.getLong(0) -> (x.getInt(1), x.getLong(2))).toMap
    assert(r(10L) == ((1, 0L)) && r(11L) == ((1, 1L)))
    assert(r(12L)._1 == 0, s"null text: ${r(12L)}")
  }

  test("activeUsers: hand-checked DAU/WAU and stickiness on a 3-day log") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 11:00:00"),
      (1L, "2024-01-01 12:00:00"), // same user same day — collapses
      (1L, "2024-01-02 09:00:00"),
      (3L, "2024-01-03 09:00:00")
    ).toDF("u", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val r = SequenceOps.activeUsers(df, "u", "ts", Seq(1, 7))
      .collect().map(x => x.getDate(0).toString -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r.keySet == Set("2024-01-01", "2024-01-02", "2024-01-03"))
    assert(r("2024-01-01") == ((2L, 2L, 1.0)))
    assert(r("2024-01-02") == ((1L, 2L, 0.5)))
    assert(r("2024-01-03") == ((1L, 3L, snap9(1.0 / 3))))
  }

  test("activeUsers: report days clamp to observed days (no trailing partial windows)") {
    val df = Seq((1L, "2024-01-01 10:00:00")).toDF("u", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val days = SequenceOps.activeUsers(df, "u", "ts", Seq(1, 28)).collect()
    assert(days.length == 1 && days.head.getDate(0).toString == "2024-01-01")
  }

  test("attribution: first/last/linear credit on a hand-built journey") {
    // user 1: view@1, click@2, view@3, purchase@4 (conv 100) — 3 touches
    // user 2: click@1, purchase@2 (conv 200) — 1 touch
    // user 3: purchase@5 with no touches — drops
    // user 1 also has a STALE view@-10d outside the lookback
    def ts(d: Int) = s"2024-01-${10 + d} 00:00:00"
    val df = Seq(
      (1L, ts(1), 1L, "view"), (1L, ts(2), 2L, "click"), (1L, ts(3), 3L, "view"),
      (1L, "2024-01-01 00:00:00", 9L, "view"),
      (1L, ts(4), 100L, "purchase"),
      (2L, ts(1), 4L, "click"), (2L, ts(2), 200L, "purchase"),
      (3L, ts(5), 300L, "purchase")
    ).toDF("u", "ts", "eid", "typ").withColumn("ts", col("ts").cast("timestamp"))
    val r = FunnelOps.attribution(df, "u", "ts", "eid", "typ",
      "purchase", Seq("view", "click"), lookbackSeconds = 7L * 86400L)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5))).toMap
    // conv 100: touches view(1), click(2), view(3) → first=view, last=view, linear 1/3 each
    // conv 200: click → first=last=click, linear 1
    assert(r("view") == ((1L, 2L, 1L, 1L, snap9(2 * snap9(1.0 / 3)))), s"view: ${r("view")}")
    assert(r("click") == ((2L, 2L, 1L, 1L, snap9(1.0 + snap9(1.0 / 3)))), s"click: ${r("click")}")
  }

  test("attribution: timestamp ties break deterministically by touch id") {
    val df = Seq(
      (1L, "2024-01-10 00:00:00", 1L, "view"),
      (1L, "2024-01-10 00:00:00", 2L, "click"), // same ts — id 2 is 'last'
      (1L, "2024-01-11 00:00:00", 100L, "purchase")
    ).toDF("u", "ts", "eid", "typ").withColumn("ts", col("ts").cast("timestamp"))
    val r = FunnelOps.attribution(df, "u", "ts", "eid", "typ",
      "purchase", Seq("view", "click"), lookbackSeconds = 86400L * 7)
      .collect().map(x => x.getString(0) -> (x.getLong(3), x.getLong(4))).toMap
    assert(r("view") == ((1L, 0L)) && r("click") == ((0L, 1L)))
  }
}
