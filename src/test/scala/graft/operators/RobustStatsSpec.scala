package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  private def q(vals: Seq[Double], p: Double): Double =
    StatsOps.groupQuantileExact(vals.map(("g", _)).toDF("g", "v"), Seq("g"), "v", p)
      .collect().head.getAs[Double]("q_value")

  test("groupQuantileExact matches the type-7 convention on odd/even/tied frames") {
    assert(q(Seq(1, 2, 3, 4, 5).map(_.toDouble), 0.5) == 3.0)
    assert(q(Seq(1, 2, 3, 4).map(_.toDouble), 0.5) == 2.5)
    assert(q(Seq(1, 1, 1, 9).map(_.toDouble), 0.5) == 1.0)    // ties collapse to counts
    assert(q(Seq(10.0, 20.0), 0.25) == 12.5)                  // h=0.25 → 10 + 0.25·10
    assert(q(Seq(7.0), 0.9) == 7.0)                           // single value, any q
    assert(q(Seq(3.0, 1.0, 2.0), 0.0) == 1.0 && q(Seq(3.0, 1.0, 2.0), 1.0) == 3.0)
  }

  test("groupQuantileExact agrees with a sorted-array replay on a random fuzz") {
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 1 + rng.nextInt(200)
      val vals = Seq.fill(n)(rng.nextInt(40).toDouble)
      val p = Seq(0.1, 0.5, 0.9)(trial % 3)
      val sorted = vals.sorted
      val h = (n - 1) * p
      val expect = sorted(h.floor.toInt) +
        (h - h.floor) * (sorted(h.ceil.toInt) - sorted(h.floor.toInt))
      assert(q(vals, p) == expect, s"trial $trial n=$n p=$p")
    }
  }

  test("groupQuantileExact: independent groups, nulls dropped") {
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("a", None), ("b", Some(10.0)))
      .map { case (g, v) => (g, v.map(Double.box).orNull) }.toDF("g", "v")
    val m = StatsOps.groupQuantileExact(df, Seq("g"), "v", 0.5)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("q_value")).toMap
    assert(m == Map("a" -> 2.0, "b" -> 10.0))
  }

  test("robustZ flags the planted spike and not the bulk; MAD resists the spike") {
    val bulk = (1 to 99).map(i => (i.toLong, "g", 10.0 + (i % 5)))
    val spike = Seq((1000L, "g", 5000.0))
    val out = StatsOps.robustZ((bulk ++ spike).toDF("id", "g", "v"), Seq("g"), "v")
    val flagged = out.filter(abs(col("robust_z")) > lit(3.5)).select("id").as[Long].collect()
    assert(flagged.toSet == Set(1000L))
    // med/mad computed from the bulk: med 12, deviations {0,1,2} + spike
    val r = out.filter(col("id") === 1000L).collect().head
    assert(r.getAs[Double]("med") == 12.0)
    assert(r.getAs[Double]("mad") == 1.0)
  }

  test("robustZ: MAD = 0 group yields null scores, not infinities") {
    val df = ((1 to 10).map(i => (i.toLong, "const", 5.0)) :+ (99L, "const", 6.0))
      .toDF("id", "g", "v")
    val out = StatsOps.robustZ(df, Seq("g"), "v")
    assert(out.filter(col("robust_z").isNotNull).count() == 0)
    assert(out.count() == 11) // rows preserved
  }

  test("groupQuantileExact plan: counts aggregate before any window (distinct-value frame)") {
    val df = (1 to 100).map(i => ("g", (i % 10).toDouble)).toDF("g", "v")
    val plan = StatsOps.groupQuantileExact(df, Seq("g"), "v", 0.5)
      .queryExecution.optimizedPlan.toString
    val lines = plan.linesIterator.toSeq
    val winIdx = lines.indexWhere(_.contains("Window"))
    val aggBelow = lines.zipWithIndex.exists { case (l, i) => l.contains("Aggregate") && i > winIdx }
    assert(winIdx >= 0 && aggBelow, s"expected count Aggregate below the Window:\n$plan")
  }
}
