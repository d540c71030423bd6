package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("auc: perfect separation scores 1.0, reversed scores 0.0") {
    val df = Seq((0, 1.0), (0, 2.0), (0, 3.0), (1, 4.0), (1, 5.0))
      .toDF("y", "s")
    val up = EvalOps.auc(df, "y", "s").select("auc").as[Double].head()
    assert(up == 1.0)
    val down = EvalOps.auc(df.withColumn("s", -col("s")), "y", "s")
      .select("auc").as[Double].head()
    assert(down == 0.0)
  }

  test("auc: tie averaging matches the closed form") {
    // scores: pos at {1, 2, 2}, neg at {2, 3}. Tied block at 2 has
    // ranks {2,3,4} -> avg 3. Σranks+ = 1 + 3 + 3 = 7.
    // AUC = (7 - 3*4/2) / (3*2) = 1/6.
    val df = Seq((1, 1.0), (1, 2.0), (1, 2.0), (0, 2.0), (0, 3.0)).toDF("y", "s")
    val a = EvalOps.auc(df, "y", "s").select("auc").as[Double].head()
    assert(math.abs(a - 1.0 / 6.0) < 1e-9, s"got $a")
  }

  test("auc: random scores agree with a brute-force pair count") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(2), rnd.nextInt(20).toDouble))
    val df = rows.toDF("y", "s")
    val got = EvalOps.auc(df, "y", "s").select("auc").as[Double].head()
    val pos = rows.filter(_._1 == 1).map(_._2)
    val neg = rows.filter(_._1 == 0).map(_._2)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val want = wins / (pos.size.toDouble * neg.size)
    assert(math.abs(got - want) < 1e-8, s"got $got want $want")
  }

  test("auc: one-class group yields NULL, grouped frames stay per-group") {
    val df = Seq(("a", 1, 1.0), ("a", 0, 2.0), ("b", 1, 1.0), ("b", 1, 2.0))
      .toDF("g", "y", "s")
    val out = EvalOps.auc(df, "y", "s", Seq("g")).collect()
      .map(r => r.getString(0) -> r.isNullAt(3)).toMap
    assert(!out("a") && out("b"))
  }

  test("confusionMetrics: counts and derived ratios") {
    val df = Seq((1, 0.9), (1, 0.4), (0, 0.8), (0, 0.2), (0, 0.1))
      .toDF("y", "s")
    val r = EvalOps.confusionMetrics(df, "y", "s", 0.5).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((1L, 1L, 2L, 1L)))
    assert(r.getDouble(4) == 0.6)            // accuracy
    assert(r.getDouble(5) == 0.5)            // precision
    assert(r.getDouble(6) == 0.5)            // recall
    assert(r.getDouble(7) == 0.5)            // f1
  }

  test("confusionMetrics: no predicted positives -> precision and f1 NULL") {
    val df = Seq((1, 0.1), (0, 0.2)).toDF("y", "s")
    val r = EvalOps.confusionMetrics(df, "y", "s", 0.5).head()
    assert(r.isNullAt(5) && r.isNullAt(7) && r.getDouble(6) == 0.0)
  }

  test("cohenKappa: perfect agreement is 1, independence is ~0") {
    val same = Seq(("x", "x"), ("y", "y"), ("x", "x"), ("z", "z")).toDF("a", "b")
    val k1 = EvalOps.cohenKappa(same, "a", "b").select("kappa").as[Double].head()
    assert(k1 == 1.0)
    // balanced independent raters: po = pe -> kappa 0
    val ind = Seq(("x", "x"), ("x", "y"), ("y", "x"), ("y", "y")).toDF("a", "b")
    val k0 = EvalOps.cohenKappa(ind, "a", "b").select("kappa").as[Double].head()
    assert(k0 == 0.0)
  }

  test("cohenKappa: textbook 2x2 example") {
    // 20 a-yes/b-yes, 5 a-yes/b-no, 10 a-no/b-yes, 15 a-no/b-no
    // po = 35/50 = .7; pe = (25*30 + 25*20)/2500 = .5; kappa = .4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val k = EvalOps.cohenKappa(rows.toDF("a", "b"), "a", "b")
      .select("kappa").as[Double].head()
    assert(math.abs(k - 0.4) < 1e-9, s"got $k")
  }

  test("cohenKappa: disjoint category sets -> pe 0, kappa = po = 0") {
    val df = Seq(("x", "p"), ("y", "q")).toDF("a", "b")
    val r = EvalOps.cohenKappa(df, "a", "b").head()
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
  }

  test("calibrationCurve: a perfectly calibrated bin has gap 0; counts are exact") {
    // bin 2 ([0.2, 0.3)): four rows at score 0.25, one positive ->
    // pos_rate 0.25 == mean_score, gap 0
    val df = Seq((0.25, 1), (0.25, 0), (0.25, 0), (0.25, 0), (0.95, 1))
      .toDF("score", "label")
    val out = EvalOps.calibrationCurve(df, "label", "score", 10)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out.keySet == Set(2, 9))
    val b2 = out(2)
    assert(b2.getLong(3) == 4L && b2.getLong(4) == 1L)
    assert(b2.getDouble(5) == 0.25 && b2.getDouble(6) == 0.25 && b2.getDouble(7) == 0.0)
    assert(b2.getDouble(1) == 0.2 && b2.getDouble(2) == 0.3)
  }

  test("calibrationCurve: score 1.0 clamps into the top bin, nulls drop") {
    val df = Seq((Some(1.0), Some(1)), (Some(0.999), Some(0)),
      (None, Some(1)), (Some(0.5), None)).toDF("score", "label")
    val out = EvalOps.calibrationCurve(df, "label", "score", 10).collect()
    assert(out.length == 1 && out.head.getInt(0) == 9 && out.head.getLong(3) == 2L)
  }

  test("calibrationCurve: over-confident scores show positive gap") {
    val df = (1 to 100).map(i => (0.9, if (i <= 30) 1 else 0)).toDF("score", "label")
    val r = EvalOps.calibrationCurve(df, "label", "score", 10).head()
    assert(math.abs(r.getDouble(7) - 0.6) < 1e-9, s"gap ${r.getDouble(7)}")
  }
}
