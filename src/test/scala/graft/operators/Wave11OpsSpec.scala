package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 wave-11 operators: temporal split, seasonal
  * decomposition, degree power-law fit.
  */
class Wave11OpsSpec extends SparkSpec {
  import spark.implicits._

  private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
  private def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)

  test("temporalSplit: past rows train, future rows test, cutoff at the row quantile") {
    val df = (1 to 10).map(i => (i.toLong, ts(i * 100))).toDF("id", "ts")
    val r = SplitOps.temporalSplit(df, "ts", testFraction = 0.2)
      .collect().map(x => x.getLong(0) -> x.getString(2)).toMap
    // 80th percentile of 10 rows (type-7): h=(10-1)*0.8=7.2 → between rows 8 and 9
    assert((1 to 8).forall(i => r(i.toLong) == "train"), r.toString)
    assert(Seq(9, 10).forall(i => r(i.toLong) == "test"), r.toString)
    // every train ts strictly precedes every test ts
    val byTs = df.collect().map(x => x.getLong(0) -> x.getTimestamp(1).getTime).toMap
    val maxTrain = r.collect { case (k, "train") => byTs(k) }.max
    val minTest = r.collect { case (k, "test") => byTs(k) }.min
    assert(maxTrain < minTest)
  }

  test("temporalSplit: null timestamps land in test") {
    val df = Seq((1L, Some(ts(1))), (2L, Some(ts(2))), (3L, None))
      .toDF("id", "ts")
    val r = SplitOps.temporalSplit(df, "ts", 0.5)
      .collect().map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(r(3L) == "test")
  }

  test("seasonalDecompose recovers a planted period-4 pattern over a linear trend") {
    val season = Seq(5.0, -1.0, -3.0, -1.0) // sums to 0
    val xs = (0 until 40).map(i => (1L, i.toLong, 100.0 + i * 2.0 + season(i % 4)))
    val r = DriftOps.seasonalDecompose(xs.toDF("k", "i", "v"), Seq("k"), Seq("i"), "v", 4)
      .collect().map(x => x.getAs[Long]("i") ->
        (x.getAs[Int]("phase"), Option(x.getAs[Any]("trend")), Option(x.getAs[Any]("seasonal")),
          Option(x.getAs[Any]("residual")))).toMap
    // edges have no full 5-point window → null trend/residual
    assert(r(0L)._2.isEmpty && r(1L)._2.isEmpty && r(38L)._2.isEmpty && r(39L)._2.isEmpty)
    // interior: the 5-point MA of a linear+balanced-season series is
    // linear ± a small season bleed (window covers 5 of period 4);
    // seasonal means recover the planted shape closely and residuals
    // stay small
    val seas = r.values.collect { case (p, _, Some(s), _) => p -> s.asInstanceOf[Double] }.toMap
    assert(math.abs(seas(0) - 5.0) < 1.5 && math.abs(seas(2) - (-3.0)) < 1.5, seas.toString)
    val resid = r.values.collect { case (_, _, _, Some(x)) => math.abs(x.asInstanceOf[Double]) }
    assert(resid.nonEmpty && resid.max < 2.0, s"max residual ${resid.max}")
  }

  test("degreePowerLaw: star graph tail vs the exact MLE formula") {
    // hub connected to 20 leaves + a 3-clique: degrees hub=20, leaves=1, clique=2
    val e = (1 to 20).map(i => ("hub", s"leaf$i")) ++
      Seq(("a", "b"), ("b", "c"), ("a", "c"))
    val r = GraphOps.degreePowerLaw(e.toDF("src", "dst"), dMin = 2L).collect().head
    assert(r.getLong(0) == 24 && r.getLong(1) == 4) // hub + a,b,c in the tail
    val lnsum = snap9(math.log(20.0 / 1.5)) + 3 * snap9(math.log(2.0 / 1.5))
    assert(r.getDouble(3) == snap9(1.0 + 4.0 / lnsum))
    // tail < 2 → null alpha
    val tiny = GraphOps.degreePowerLaw(Seq(("x", "y")).toDF("src", "dst"), 2L).collect().head
    assert(tiny.isNullAt(3))
  }
}
