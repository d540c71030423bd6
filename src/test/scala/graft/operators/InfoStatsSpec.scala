package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class InfoStatsSpec extends SparkSpec {
  import spark.implicits._

  test("mutualInformation: dependent pair carries H bits, independent pair ~0") {
    // g=dep: b == a (fully dependent); g=ind: all 4 combinations equally
    val dep = for (a <- Seq("x", "y"); _ <- 1 to 10) yield ("dep", a, a)
    val ind = for (a <- Seq("x", "y"); b <- Seq("x", "y"); _ <- 1 to 5) yield ("ind", a, b)
    val df = (dep ++ ind).toDF("g", "a", "b")
    val r = StatsOps.mutualInformation(df, Seq("g"), "a", "b")
      .collect().map(row => row.getString(0) ->
        (row.getLong(1), row.getDouble(2), row.getDouble(3), row.getDouble(4))).toMap
    val (nDep, miDep, haDep, _) = r("dep")
    assert(nDep == 20)
    // fully dependent uniform binary: MI = H(A) = ln 2
    assert(math.abs(miDep - math.log(2)) < 1e-8, s"dep MI $miDep")
    assert(math.abs(haDep - math.log(2)) < 1e-8)
    val (nInd, miInd, _, _) = r("ind")
    assert(nInd == 20)
    assert(math.abs(miInd) < 1e-8, s"ind MI $miInd")
    // nmi: 1 for dependent, 0 for independent
    val nmi = StatsOps.mutualInformation(df, Seq("g"), "a", "b")
      .select("g", "nmi").as[(String, Option[Double])].collect().toMap
    assert(math.abs(nmi("dep").get - 1.0) < 1e-8)
    assert(math.abs(nmi("ind").get) < 1e-8)
  }

  test("mutualInformation: constant column yields zero entropy and null nmi") {
    val df = Seq(("g", "k", "u"), ("g", "k", "v"), ("g", "k", "u")).toDF("g", "a", "b")
    val row = StatsOps.mutualInformation(df, Seq("g"), "a", "b").collect().head
    assert(row.getDouble(3) == 0.0) // h_a
    assert(row.isNullAt(5))         // nmi
  }

  test("anovaF matches the textbook formula on a known fixture") {
    // feature 1: groups clearly separated; feature 2: identical groups
    val rows =
      Seq.tabulate(12)(i => (1L, "a", 1.0 + i % 3)) ++ // values 1,2,3 repeating
      Seq.tabulate(12)(i => (1L, "b", 7.0 + i % 3)) ++
      Seq.tabulate(12)(i => (2L, "a", 5.0 + i % 4)) ++
      Seq.tabulate(12)(i => (2L, "b", 5.0 + (i + 2) % 4))
    val df = rows.toDF("feature", "grp", "v")
    val r = StatsOps.anovaF(df, "feature", "v", "grp")
      .collect().map(row => row.getLong(0) ->
        (row.getLong(1), row.getLong(2), row.getDouble(3), row.getDouble(4),
          if (row.isNullAt(5)) Double.NaN else row.getDouble(5))).toMap
    // local replay
    def local(vs: Seq[(String, Double)]): (Double, Double, Double) = {
      val n = vs.size; val k = vs.map(_._1).distinct.size
      val grand = vs.map(_._2).sum / n
      val byG = vs.groupBy(_._1).values
      val ssb = byG.map(g => g.size * math.pow(g.map(_._2).sum / g.size - grand, 2)).sum
      val ssw = byG.map(g => { val m = g.map(_._2).sum / g.size; g.map(x => math.pow(x._2 - m, 2)).sum }).sum
      (ssb, ssw, (ssb / (k - 1)) / (ssw / (n - k)))
    }
    val (ssb1, ssw1, f1) = local(rows.filter(_._1 == 1L).map(t => (t._2, t._3)))
    val (n1, k1, gotSsb1, gotSsw1, gotF1) = r(1L)
    assert(n1 == 24 && k1 == 2)
    assert(math.abs(gotSsb1 - ssb1) < 1e-6); assert(math.abs(gotSsw1 - ssw1) < 1e-6)
    assert(math.abs(gotF1 - f1) < 1e-5, s"F $gotF1 vs $f1")
    // feature 2: same distribution in both groups -> tiny F
    val (_, _, _, _, gotF2) = r(2L)
    assert(gotF2 < 0.1, s"identical groups should give F~0, got $gotF2")
    assert(gotF1 > 100, s"separated groups should give huge F, got $gotF1")
  }

  test("anovaF: degenerate shapes yield null F") {
    val oneGroup = Seq((1L, "a", 1.0), (1L, "a", 2.0)).toDF("feature", "grp", "v")
    assert(StatsOps.anovaF(oneGroup, "feature", "v", "grp").collect().head.isNullAt(5))
    val constant = Seq((1L, "a", 3.0), (1L, "b", 3.0), (1L, "a", 3.0), (1L, "b", 3.0))
      .toDF("feature", "grp", "v")
    assert(StatsOps.anovaF(constant, "feature", "v", "grp").collect().head.isNullAt(5))
  }

  test("correlationMatrix: exact +1/-1 on linear features, pairwise-complete counts") {
    val rows = (1 to 20).flatMap { e =>
      Seq((e.toLong, "f1", e.toDouble), (e.toLong, "f2", 2.0 * e + 3), (e.toLong, "f3", -e.toDouble)) ++
        (if (e <= 10) Seq((e.toLong, "f4", (e * e).toDouble)) else Nil)
    }
    val df = rows.toDF("ent", "feat", "v")
    val r = StatsOps.correlationMatrix(df, "ent", "feat", "v")
      .collect().map(row => (row.getString(0), row.getString(1)) ->
        (row.getLong(2), if (row.isNullAt(3)) Double.NaN else row.getDouble(3))).toMap
    assert(r(("f1", "f2")) == (20L, 1.0))
    assert(r(("f1", "f3")) == (20L, -1.0))
    // f4 exists for 10 entities only -> pairwise-complete n = 10
    assert(r(("f1", "f4"))._1 == 10L)
    // local pearson for f1-f4 over the complete pairs
    val xs = (1 to 10).map(_.toDouble); val ys = (1 to 10).map(e => (e * e).toDouble)
    val n = 10.0
    val num = n * xs.zip(ys).map { case (a, b) => a * b }.sum - xs.sum * ys.sum
    val den = math.sqrt((n * xs.map(x => x * x).sum - xs.sum * xs.sum) *
      (n * ys.map(y => y * y).sum - ys.sum * ys.sum))
    assert(math.abs(r(("f1", "f4"))._2 - num / den) < 1e-8)
    // constant feature -> null corr
    val cdf = (Seq((1L, "c", 5.0), (2L, "c", 5.0)) ++ Seq((1L, "x", 1.0), (2L, "x", 2.0)))
      .toDF("ent", "feat", "v")
    val cr = StatsOps.correlationMatrix(cdf, "ent", "feat", "v").collect().head
    assert(cr.isNullAt(3))
  }
}
