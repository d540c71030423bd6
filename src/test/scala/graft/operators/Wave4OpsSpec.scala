package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 wave-4 operators: binned quantiles (batch + windowed),
  * Brown double-EWMA forecast, Kaplan–Meier survival, two-proportion
  * z-test, degree assortativity.
  */
class Wave4OpsSpec extends SparkSpec {
  import spark.implicits._

  private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  test("approxQuantilesBinned: within one bin width of the exact quantile") {
    val vals = (1 to 1000).map(i => ("g", (i * 7919 % 1000).toDouble))
    val df = vals.toDF("g", "v")
    val r = StatsOps.approxQuantilesBinned(df, Seq("g"), "v", Seq(0.25, 0.5, 0.9), bins = 100)
      .collect().map(row => row.getDouble(1) -> row.getDouble(5)).toMap
    val sorted = vals.map(_._2).sorted
    val width = (sorted.last - sorted.head) / 100
    for (p <- Seq(0.25, 0.5, 0.9)) {
      val exact = sorted((math.ceil(p * sorted.size).toInt max 1) - 1)
      assert(math.abs(r(p) - exact) <= width + 1e-6,
        s"p=$p est=${r(p)} exact=$exact width=$width")
    }
  }

  test("approxQuantilesBinned: single-value group is exact; nulls drop") {
    val df = Seq(("a", Some(42.0)), ("a", Some(42.0)), ("a", None))
      .toDF("g", "v")
    val rows = StatsOps.approxQuantilesBinned(df, Seq("g"), "v", Seq(0.5, 1.0), bins = 8)
      .collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getLong(2) == 2L)       // n: null dropped
      assert(r.getDouble(5) == 42.0)   // quantile = the constant
    }
  }

  test("quantileBinsWindowed cells SUM-merge and quantilesFromBins reads the CDF") {
    val ev = (0 until 200).map { i =>
      (java.sql.Timestamp.valueOf(f"2024-01-01 ${i % 24}%02d:00:00"), "t", i.toDouble % 100)
    }.toDF("ts", "g", "v")
    val cells = SketchOps.quantileBinsWindowed(ev, "ts", Seq("g"), "v",
      windowLen = "1 day", lo = 0.0, hi = 100.0, bins = 10)
    val total = cells.agg(sum("cnt")).as[Long].head()
    assert(total == 200)
    // shard-merge: same cells from two halves, re-summed
    val h1 = SketchOps.quantileBinsWindowed(ev.filter($"v" < 50), "ts", Seq("g"), "v",
      "1 day", 0.0, 100.0, 10)
    val h2 = SketchOps.quantileBinsWindowed(ev.filter($"v" >= 50), "ts", Seq("g"), "v",
      "1 day", 0.0, 100.0, 10)
    val merged = h1.unionByName(h2)
      .groupBy("window_start", "g", "bin").agg(sum("cnt").as("cnt"))
    val direct = cells.collect().map(r => (r.get(0), r.get(1), r.getLong(2)) -> r.getLong(3)).toMap
    merged.collect().foreach { r =>
      assert(direct((r.get(0), r.get(1), r.getLong(2))) == r.getLong(3))
    }
    val q = SketchOps.quantilesFromBins(cells, Seq("window_start", "g"),
      0.0, 100.0, 10, Seq(0.5))
      .select("quantile").as[Double].head()
    // uniform 0..99 → median within one 10-wide bin of 50
    assert(math.abs(q - 50.0) <= 10.0, s"median est $q")
  }

  test("doubleEwmaForecast replays the chained snapped recurrence") {
    val xs = Seq(10.0, 12.0, 11.0, 15.0, 18.0, 17.0, 21.0)
    val df = xs.zipWithIndex.map { case (v, i) => ("k", i, v) }.toDF("k", "i", "v")
    val got = DriftOps.doubleEwmaForecast(df, Seq("k"), Seq("i"), "v",
        lambda = 0.25, horizon = 3)
      .orderBy("i")
      .select("s1", "s2", "level", "trend", "forecast")
      .as[(Double, Double, Double, Double, Double)].collect()
    // reference fold with the identical per-step snapping
    var b1 = 0.0; var w1 = 1.0; var b2 = 0.0; var w2 = 1.0
    xs.zipWithIndex.foreach { case (v, i) =>
      b1 = snap9(0.25 * v + 0.75 * b1); w1 *= 0.75
      val s1 = snap9(b1 / (1.0 - w1))
      b2 = snap9(0.25 * s1 + 0.75 * b2); w2 *= 0.75
      val s2 = snap9(b2 / (1.0 - w2))
      val level = snap9(2.0 * s1 - s2)
      val trend = snap9(0.25 / 0.75 * (s1 - s2))
      val forecast = snap9(level + 3.0 * trend)
      assert(got(i) == ((s1, s2, level, trend, forecast)), s"row $i: ${got(i)}")
    }
    // trending series: the forecast must exceed the level (positive trend)
    assert(got.last._4 > 0 && got.last._5 > got.last._3)
  }

  test("kaplanMeier matches the textbook product-limit on a tiny cohort") {
    // t=1 event, t=2 censored, t=3 event
    val df = Seq(("c", 1L, 1L), ("c", 2L, 0L), ("c", 3L, 1L)).toDF("g", "dur", "ev")
    val rows = FunnelOps.kaplanMeier(df, Seq("g"), "dur", "ev")
      .orderBy("t")
      .select("t", "at_risk", "d", "c", "survival")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows(0) == ((1L, 3L, 1L, 0L, snap9(2.0 / 3))))
    val s1 = snap9(2.0 / 3)
    assert(rows(1) == ((2L, 2L, 0L, 1L, snap9(s1 * 1.0))))
    assert(rows(2) == ((3L, 1L, 1L, 0L, 0.0)))
  }

  test("kaplanMeier: censoring keeps survival above the naive churn rate") {
    // 10 subjects: 5 churn at t=5, 5 censored at t=5 — S(5) must be
    // 1/2, where treating censored as churned would give 0
    val df = ((1 to 5).map(i => ("g", 5L, 1L)) ++ (1 to 5).map(i => ("g", 5L, 0L)))
      .toDF("g", "dur", "ev")
    val s = FunnelOps.kaplanMeier(df, Seq("g"), "dur", "ev")
      .select("survival").as[Double].head()
    assert(s == 0.5)
  }

  test("abTest computes the pooled z and flags the obvious lift") {
    val subj = ((1 to 100).map(i => ("e", "A", if (i <= 10) 1 else 0)) ++
      (1 to 100).map(i => ("e", "B", if (i <= 20) 1 else 0))).toDF("g", "variant", "conv")
    val r = EvalOps.abTest(subj, Seq("g"), "variant", "conv", "A", "B").collect().head
    assert(r.getLong(1) == 100 && r.getLong(2) == 10 && r.getLong(3) == 100 && r.getLong(4) == 20)
    assert(r.getDouble(5) == 0.1 && r.getDouble(6) == 0.2)
    val z = r.getDouble(8)
    // manual: pool=.15, se=sqrt(.15*.85*.02)=.0504975, z=1.98030...
    assert(math.abs(z - 1.980295085) < 1e-6, s"z=$z")
    val p = r.getDouble(9)
    assert(p > 0.04 && p < 0.06, s"p=$p")
  }

  test("abTest: degenerate pooled rate and missing variant emit null z") {
    val noConv = Seq(("g", "A", 0), ("g", "B", 0)).toDF("g", "variant", "conv")
    assert(EvalOps.abTest(noConv, Seq("g"), "variant", "conv", "A", "B")
      .collect().head.isNullAt(8))
    val oneSide = Seq(("g", "A", 1), ("g", "A", 0)).toDF("g", "variant", "conv")
    val row = EvalOps.abTest(oneSide, Seq("g"), "variant", "conv", "A", "B").collect().head
    assert(row.getLong(3) == 0 && row.isNullAt(8) && row.isNullAt(6))
  }

  test("degreeAssortativity: star is exactly -1, clique has no variance") {
    val star = Seq(("c", "a"), ("c", "b"), ("c", "d")).toDF("src", "dst")
    val r = GraphOps.degreeAssortativity(star).collect().head
    assert(r.getLong(0) == 6)
    assert(r.getDouble(1) == -1.0)
    // K3: all degrees 2 → zero variance → null
    val k3 = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("src", "dst")
    val rk = GraphOps.degreeAssortativity(k3).collect().head
    assert(rk.getLong(0) == 6 && rk.isNullAt(1))
  }
}
