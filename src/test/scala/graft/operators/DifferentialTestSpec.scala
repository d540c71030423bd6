package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DifferentialTestSpec extends SparkSpec {
  import spark.implicits._

  test("Welch t, df, and normal-approx p match hand-computed values") {
    // a = [1,2,3,4] (mean 2.5, var 5/3), b = [2,4,6,8] (mean 5, var 20/3)
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map(v => ("f1", "a", v)) ++
      Seq(2.0, 4.0, 6.0, 8.0).map(v => ("f1", "b", v))).toDF("feature", "grp", "v")
    val r = StatsOps.differentialTest(df, "feature", "v", "grp", "a", "b").collect()(0)
    val t = r.getAs[Double]("t_stat")
    val dfw = r.getAs[Double]("df_welch")
    val p = r.getAs[Double]("p_value")
    assert(math.abs(t - (-1.7320508)) < 1e-6, s"t=$t")
    assert(math.abs(dfw - 4.411765) < 1e-4, s"df=$dfw") // (25/12)^2 / ((5/12)^2/3 + (5/3)^2/3)
    // two-sided normal p for |t| = sqrt(3): 2*(1 - Phi(1.7320508)) = 0.0832645
    assert(math.abs(p - 0.0832645) < 1e-5, s"p=$p")
    assert(r.getAs[Long]("n_a") === 4L && r.getAs[Long]("n_b") === 4L)
  }

  test("BH rank orders by ascending p; single-group and tiny features are excluded") {
    val strong = (1 to 30).map(i => ("sep", "a", i.toDouble)) ++ (1 to 30).map(i => ("sep", "b", i + 50.0))
    val weak = (1 to 30).map(i => ("same", "a", i.toDouble)) ++ (1 to 30).map(i => ("same", "b", i + 0.3))
    val lonely = (1 to 30).map(i => ("onlyA", "a", i.toDouble))
    val tiny = Seq(("tiny", "a", 1.0), ("tiny", "b", 2.0))
    val df = (strong ++ weak ++ lonely ++ tiny).toDF("feature", "grp", "v")
    val out = StatsOps.differentialTest(df, "feature", "v", "grp", "a", "b")
      .select("feature", "bh_rank", "p_value").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet === Set("sep", "same"), out.toString) // onlyA (one group) and tiny (n<2) excluded
    assert(out("sep")._1 === 1L && out("same")._1 === 2L)
    assert(out("sep")._2 < out("same")._2)
  }

  test("Kruskal-Wallis: H, tie handling, chi2 p, and group gating match hand-computed values") {
    import spark.implicits._
    // feature f1: groups a={1,2}, b={3,4}, c={5,6} — no ties,
    // ranks 1..6, R={3,7,11}, H = 12/42 * (9/2+49/2+121/2) - 21 = 32/7
    // feature f2: group c missing → excluded
    val rows =
      Seq(("f1", "a", 1.0), ("f1", "a", 2.0), ("f1", "b", 3.0), ("f1", "b", 4.0),
        ("f1", "c", 5.0), ("f1", "c", 6.0),
        ("f2", "a", 1.0), ("f2", "b", 2.0)).toDF("feature", "grp", "v")
    val out = graft.operators.StatsOps.kruskalWallis(rows, "feature", "v", "grp", Seq("a", "b", "c"))
      .collect()
    assert(out.length == 1 && out(0).getAs[String]("feature") == "f1")
    val h = out(0).getAs[Double]("h_stat")
    val p = out(0).getAs[Double]("p_value")
    assert(math.abs(h - 32.0 / 7.0) < 1e-12, s"H: $h")
    assert(math.abs(p - math.exp(-16.0 / 7.0)) < 1e-12, s"p: $p") // df=2 closed form

    // ties: a={1,1}, b={1,2} — values 1 have avg rank 2, value 2 rank 4;
    // R_a=4, R_b=6; H0 = 12/20*(8+18) - 15 = 0.6; C = 1-(27-3)/(64-4)=0.6 → H=1
    val tied = Seq(("t", "a", 1.0), ("t", "a", 1.0), ("t", "b", 1.0), ("t", "b", 2.0))
      .toDF("feature", "grp", "v")
    val tOut = graft.operators.StatsOps.kruskalWallis(tied, "feature", "v", "grp", Seq("a", "b")).collect()
    assert(tOut.length == 1)
    assert(math.abs(tOut(0).getAs[Double]("h_stat") - 1.0) < 1e-12, s"tied H: ${tOut(0)}")
    // df=1 survival via the A&S erfc chain: S(1;1) = erfc(1/sqrt(2)) ~ 0.3173
    assert(math.abs(tOut(0).getAs[Double]("p_value") - 0.3173) < 5e-4, s"df1 p: ${tOut(0)}")

    // fully-tied feature (tie correction 0) is excluded, not NaN
    val allTied = Seq(("z", "a", 5.0), ("z", "b", 5.0)).toDF("feature", "grp", "v")
    assert(graft.operators.StatsOps.kruskalWallis(allTied, "feature", "v", "grp", Seq("a", "b")).count() == 0)
  }

  test("one partial-agg groupBy over raw rows; the only window sorts the feature-sized agg frame") {
    val df = (1 to 200).map(i => (s"f${i % 20}", if (i % 2 == 0) "a" else "b", i.toDouble))
      .toDF("feature", "grp", "v")
    val plan = StatsOps.differentialTest(df, "feature", "v", "grp", "a", "b")
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.split("HashAggregate").length >= 3, s"no partial agg phase:\n$plan")
    // the BH window must sit ABOVE the aggregate (formatted explain
    // prints the tree top-down, so the parent appears EARLIER)
    assert(plan.contains("Window"), plan)
    assert(plan.indexOf("Window") < plan.indexOf("HashAggregate"), plan)
  }
}
