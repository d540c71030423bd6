package graft.operators

import graft.SparkSpec

class BrierSpec extends SparkSpec {
  import spark.implicits._

  private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  test("brierDecomposition: hand-computed two-bin case") {
    // bin 0 (p=0.0..0.1): two rows p=0.05, labels 0,0 -> obark=0, pbark=0.05
    // bin 9 (p>=0.9):     two rows p=0.95, labels 1,0 -> obark=0.5, pbark=0.95
    val df = Seq((0.05, 0), (0.05, 0), (0.95, 1), (0.95, 0)).toDF("p", "y")
    val r = EvalOps.brierDecomposition(df, "y", "p", bins = 10).head()
    val n = 4.0
    val brier = snap9((0.05 * 0.05 * 2 + 0.05 * 0.05 + 0.95 * 0.95) / n)
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("brier") == brier)
    val obar = snap9(1.0 / 4.0)
    val rel = snap9((2 * math.pow(0.05 - 0.0, 2) + 2 * math.pow(0.95 - 0.5, 2)) / n)
    assert(r.getAs[Double]("reliability") == rel)
    // resolution via the operator's algebraic expansion
    val so = 2 * 0.0 + 2 * 0.5
    val so2 = 2 * 0.0 + 2 * 0.25
    val res = snap9(so2 / n - 2.0 * obar * (so / n) + obar * obar)
    assert(r.getAs[Double]("resolution") == res)
    assert(r.getAs[Double]("uncertainty") == snap9(obar * (1 - obar)))
  }

  test("brierDecomposition: decomposition identity holds through the snaps") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 500).map { _ =>
      val p = rnd.nextInt(1000) / 1000.0
      (p, if (rnd.nextDouble() < p) 1 else 0)
    }
    val r = EvalOps.brierDecomposition(rows.toDF("p", "y"), "y", "p", bins = 10).head()
    val lhs = r.getAs[Double]("brier")
    val rhs = r.getAs[Double]("reliability") - r.getAs[Double]("resolution") +
      r.getAs[Double]("uncertainty") + r.getAs[Double]("decomp_gap")
    assert(math.abs(lhs - rhs) < 5e-9, s"$lhs vs $rhs")
    // the gap is WBV − 2·WBC (Stephenson et al. 2008) — replay it
    // directly from the rows to pin the semantics
    val bybin = rows.groupBy(t => math.min(math.max((t._1 * 10).toInt, 0), 9))
    val n = rows.size.toDouble
    val wbvMinus2wbc = bybin.values.map { b =>
      val pbar = snap9(b.map(_._1).sum / b.size)
      val obar = snap9(b.map(_._2).sum.toDouble / b.size)
      b.map { case (p, y) =>
        math.pow(p - pbar, 2) - 2.0 * (p - pbar) * (y - obar)
      }.sum
    }.sum / n
    assert(math.abs(r.getAs[Double]("decomp_gap") - wbvMinus2wbc) < 1e-6,
      s"gap ${r.getAs[Double]("decomp_gap")} vs replay $wbvMinus2wbc")
  }

  test("brierDecomposition: bin-center forecasts make the gap exactly 0 " +
      "and perfect calibration zeroes reliability") {
    // forecasts only take bin-center values; labels match rates exactly
    val rows =
      (0 until 10).map(_ => (0.25, 1)) ++ (0 until 30).map(_ => (0.25, 0)) ++
      (0 until 36).map(_ => (0.75, 1)) ++ (0 until 12).map(_ => (0.75, 0))
    val r = EvalOps.brierDecomposition(rows.toDF("p", "y"), "y", "p", bins = 2).head()
    assert(math.abs(r.getAs[Double]("decomp_gap")) < 2e-9)
    assert(r.getAs[Double]("reliability") == 0.0)
    // resolution positive: the two bins separate the base rate
    assert(r.getAs[Double]("resolution") > 0.0)
  }

  test("brierDecomposition: groups aggregate independently; nulls drop") {
    val df = Seq(
      ("a", Some(0.1), Some(0)), ("a", Some(0.9), Some(1)),
      ("b", Some(0.5), Some(1)), ("b", None, Some(0)), ("b", Some(0.5), None)
    ).toDF("g", "p", "y")
    val out = EvalOps.brierDecomposition(df, "y", "p", 10, Seq("g"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(out == Map("a" -> 2L, "b" -> 1L))
  }

  test("brierDecomposition: one map-side-combinable exchange on (group, bin)") {
    val df = Seq(("a", 0.1, 0), ("b", 0.9, 1)).toDF("g", "p", "y")
    val plan = EvalOps.brierDecomposition(df, "y", "p", 10, Seq("g"))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("partial"), s"expected partial aggregation:\n$plan")
  }
}
