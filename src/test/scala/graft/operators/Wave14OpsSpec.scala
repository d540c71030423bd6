package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 wave-14 operators: weight of evidence / IV, gains
  * chart.
  */
class Wave14OpsSpec extends SparkSpec {
  import spark.implicits._

  private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  test("weightOfEvidence: predictive category gets positive WOE, anti-predictive negative") {
    // cat A: 8 pos / 2 neg; cat B: 2 pos / 8 neg — total 10/10
    val df = (Seq.fill(8)(("A", 1)) ++ Seq.fill(2)(("A", 0)) ++
      Seq.fill(2)(("B", 1)) ++ Seq.fill(8)(("B", 0))).toDF("cat", "lbl")
    val r = StatsOps.weightOfEvidence(df, "cat", "lbl")
      .collect().map(x => x.getString(0) -> x).toMap
    val dpA = snap9(0.8 + 1e-6); val dnA = snap9(0.2 + 1e-6)
    assert(r("A").getAs[Double]("woe") == snap9(math.log(dpA / dnA)))
    assert(r("A").getAs[Double]("woe") > 0 && r("B").getAs[Double]("woe") < 0)
    // symmetric setup → IV contributions equal and positive
    assert(r("A").getAs[Double]("iv_contrib") > 0.5 &&
      r("A").getAs[Double]("iv_contrib") == r("B").getAs[Double]("iv_contrib"))
    // uninformative category: equal class fractions → WOE 0
    val flat = (Seq.fill(5)(("X", 1)) ++ Seq.fill(5)(("X", 0))).toDF("cat", "lbl")
    assert(StatsOps.weightOfEvidence(flat, "cat", "lbl")
      .collect().head.getAs[Double]("woe") == 0.0)
  }

  test("weightOfEvidence: a one-class frame nulls WOE instead of dividing by zero") {
    val df = Seq(("A", 1), ("B", 1)).toDF("cat", "lbl")
    val r = StatsOps.weightOfEvidence(df, "cat", "lbl").collect()
    assert(r.forall(x => x.isNullAt(x.fieldIndex("woe"))))
  }

  test("gainsChart: a perfect score captures all positives in the top buckets") {
    // 100 rows, top-20 scores are the positives
    val df = (1 to 100).map(i => (i.toLong, (100 - i).toDouble, if (i <= 20) 1 else 0))
      .toDF("id", "score", "lbl")
    val r = EvalOps.gainsChart(df, "lbl", "score", "id", n = 10)
      .orderBy("bucket").collect()
    assert(r.length == 10)
    // bucket 1: 10 rows, all positive; capture 0.5, lift 5
    assert(r(0).getAs[Long]("n_pos") == 10 &&
      r(0).getAs[Double]("capture_rate") == 0.5 &&
      r(0).getAs[Double]("cum_lift") == 5.0)
    // bucket 2 completes the capture
    assert(r(1).getAs[Double]("capture_rate") == 1.0 &&
      r(1).getAs[Double]("cum_lift") == 5.0)
    // last bucket: full population → lift 1
    assert(r(9).getAs[Double]("capture_rate") == 1.0 &&
      r(9).getAs[Double]("cum_lift") == 1.0)
  }

  test("gainsChart: random score converges to lift ~1 per bucket prefix") {
    val rng = new scala.util.Random(7)
    val df = (1 to 2000).map(i => (i.toLong, rng.nextDouble(), if (rng.nextDouble() < 0.3) 1 else 0))
      .toDF("id", "score", "lbl")
    val r = EvalOps.gainsChart(df, "lbl", "score", "id", n = 5).orderBy("bucket").collect()
    r.foreach(x => assert(math.abs(x.getAs[Double]("cum_lift") - 1.0) < 0.25,
      s"bucket ${x.getAs[Int]("bucket")}: ${x.getAs[Double]("cum_lift")}"))
  }

  test("rateWithCi: Wilson interval brackets the rate and stays inside [0,1]") {
    def snap9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    // 8/10 positives
    val df = (1 to 10).map(i => ("g", if (i <= 8) 1 else 0)).toDF("grp", "lbl")
    val r = EvalOps.rateWithCi(df, "lbl", Seq("grp")).collect().head
    assert(r.getAs[Long]("n") == 10 && r.getAs[Long]("k") == 8)
    assert(r.getAs[Double]("rate") == 0.8)
    val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(lo < 0.8 && 0.8 < hi && lo > 0.4 && hi < 1.0, s"[$lo, $hi]")
    // extreme p at tiny n: interval stays in [0,1] (the Wilson point)
    val ext = Seq(("g", 1), ("g", 1), ("g", 1)).toDF("grp", "lbl")
    val e = EvalOps.rateWithCi(ext, "lbl", Seq("grp")).collect().head
    assert(e.getAs[Double]("rate") == 1.0 &&
      e.getAs[Double]("ci_hi") <= 1.0 + 1e-9 && e.getAs[Double]("ci_lo") > 0.3)
  }

  test("groupKFold: cluster members share a fold; singletons fold on their own id") {
    val docs = (1L to 20L).map(i => (i, s"d$i")).toDF("id", "x")
    val clusters = Seq((3L, 1L), (7L, 1L), (12L, 10L), (15L, 10L))
      .toDF("member", "cluster_id")
      .select(col("cluster_id"), col("member"))
    val f = SplitOps.groupKFold(docs, "id", clusters, "cluster_id", "member", k = 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("fold")).toMap
    assert(f(3L) == f(7L) && f(3L) == f(1L))   // cluster 1 members + id 1 share key 1
    assert(f(12L) == f(15L) && f(12L) == f(10L))
    assert(f.values.forall(v => v >= 0 && v < 4))
    // folds are reasonably spread
    assert(f.values.toSet.size >= 2)
  }
}
