package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftOpsSpec extends SparkSpec {
  import spark.implicits._

  test("psi: identical distributions score exactly 0") {
    val df = (1 to 1000).map(i => ("g", (i % 10).toDouble)).toDF("g", "v")
    val out = DriftOps.psi(df, df, Seq("g"), "v", lo = 0, hi = 10, bins = 10).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("psi") == 0.0)
    assert(out.head.getAs[Long]("n_ref") == 1000L)
    assert(out.head.getAs[Long]("n_cur") == 1000L)
  }

  test("psi: a hard shift scores large; closed-form two-bin check") {
    // ref: all mass in bin 0; cur: all mass in bin 1.
    val ref = Seq.fill(100)(("g", 0.5)).toDF("g", "v")
    val cur = Seq.fill(100)(("g", 1.5)).toDF("g", "v")
    val out = DriftOps.psi(ref, cur, Seq("g"), "v", lo = 0, hi = 2, bins = 2).collect()
    // bins observed: (1−eps)·ln((1)/eps) per direction with frac=1 vs eps
    val eps = 1e-6
    def snap9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    val expected = math.floor((snap9((eps - 1.0) * math.log(eps / 1.0)) +
      snap9((1.0 - eps) * math.log(1.0 / eps))) * 1e6 + 0.5) / 1e6
    assert(out.head.getAs[Double]("psi") == expected)
    assert(out.head.getAs[Double]("psi") > 25.0) // way past the 0.25 "major shift" bar
  }

  test("psi: moderate shift lands between stable and the hard-shift score") {
    val ref = ((1 to 80).map(_ => 0.5) ++ (1 to 20).map(_ => 1.5)).map(("g", _)).toDF("g", "v")
    val cur = ((1 to 60).map(_ => 0.5) ++ (1 to 40).map(_ => 1.5)).map(("g", _)).toDF("g", "v")
    val psi = DriftOps.psi(ref, cur, Seq("g"), "v", 0, 2, 2).collect().head.getAs[Double]("psi")
    // (0.6−0.8)ln(0.6/0.8) + (0.4−0.2)ln(0.4/0.2)
    val expect = math.floor((math.floor((-0.2 * math.log(0.6 / 0.8)) * 1e9 + 0.5) / 1e9 +
      math.floor((0.2 * math.log(0.4 / 0.2)) * 1e9 + 0.5) / 1e9) * 1e6 + 0.5) / 1e6
    assert(psi == expect)
    assert(psi > 0.1 && psi < 0.3)
  }

  test("psi: out-of-range values clamp to edge bins; nulls drop; one-sided groups survive") {
    val ref = Seq(("a", java.lang.Double.valueOf(-5.0)), ("a", java.lang.Double.valueOf(99.0)),
      ("a", null.asInstanceOf[java.lang.Double])).toDF("g", "v")
    val cur = Seq(("b", java.lang.Double.valueOf(1.0))).toDF("g", "v")
    val out = DriftOps.psi(ref, cur, Seq("g"), "v", lo = 0, hi = 10, bins = 5)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("a", "b"))
    assert(out("a").getAs[Long]("n_ref") == 2L) // null dropped
    assert(out("a").getAs[Long]("n_cur") == 0L)
    assert(out("b").getAs[Long]("n_ref") == 0L)
  }

  test("ks: identical samples give D = 0, disjoint value ranges give D = 1") {
    val a = (1 to 100).map(i => ("g", (i % 7).toDouble)).toDF("g", "v")
    assert(DriftOps.ksStatistic(a, a, Seq("g"), "v")
      .collect().head.getAs[Double]("ks_stat") == 0.0)
    val lo = (1 to 50).map(i => ("g", i.toDouble)).toDF("g", "v")
    val hi = (1 to 50).map(i => ("g", 1000.0 + i)).toDF("g", "v")
    val r = DriftOps.ksStatistic(lo, hi, Seq("g"), "v").collect().head
    assert(r.getAs[Double]("ks_stat") == 1.0)
    assert(r.getAs[Long]("n_a") == 50L && r.getAs[Long]("n_b") == 50L)
  }

  test("ks: matches the brute-force ECDF gap on a mixed fixture with ties") {
    val rng = new scala.util.Random(42)
    val as = Array.fill(300)((rng.nextInt(20)).toDouble)
    val bs = Array.fill(200)((rng.nextInt(20) + rng.nextInt(5)).toDouble)
    val got = DriftOps.ksStatistic(
      as.toSeq.map(("g", _)).toDF("g", "v"), bs.toSeq.map(("g", _)).toDF("g", "v"),
      Seq("g"), "v").collect().head.getAs[Double]("ks_stat")
    val xs = (as ++ bs).distinct.sorted
    val brute = xs.map { x =>
      math.abs(as.count(_ <= x).toDouble / as.length - bs.count(_ <= x).toDouble / bs.length)
    }.max
    assert(got == math.floor(brute * 1e6 + 0.5) / 1e6)
  }

  test("ks: one-empty-side group scores exactly 1") {
    val a = Seq(("only_a", 1.0), ("both", 1.0)).toDF("g", "v")
    val b = Seq(("both", 2.0)).toDF("g", "v")
    val m = DriftOps.ksStatistic(a, b, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("ks_stat")).toMap
    assert(m("only_a") == 1.0)
    assert(m("both") == 1.0) // disjoint single values
  }

  test("psi plan: both sides aggregate before the join (no row-frame join)") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val plan = DriftOps.psi(df, df, Seq("g"), "v", 0, 100, 10)
      .queryExecution.optimizedPlan.toString
    // the join must sit above both aggregates: no Join node should
    // have a raw LocalRelation/scan as a direct child
    val joinIdx = plan.linesIterator.indexWhere(_.contains("Join"))
    val aggIdxs = plan.linesIterator.zipWithIndex.filter(_._1.contains("Aggregate")).map(_._2).toSeq
    assert(joinIdx >= 0 && aggIdxs.count(_ > joinIdx) >= 2,
      s"expected 2+ aggregates below the join:\n$plan")
  }

  test("cusum: local sequential replay, drift alarm, null skip, key isolation") {
    import spark.implicits._
    // key A drifts up from step 10; key B stays on target; one null mid-A
    val rows =
      (1 to 20).map(i => ("A", i.toLong, Some(if (i <= 10) 10.0 else 13.0))) ++
      Seq(("A", 21L, Option.empty[Double])) ++
      (1 to 15).map(i => ("B", i.toLong, Some(10.0 + (if (i % 2 == 0) 0.3 else -0.3))))
    val df = rows.map { case (k, s, v) => (k, s, v.map(Double.box).orNull) }.toDF("k", "seq", "v")
    val got = DriftOps.cusum(df, Seq("k"), Seq("seq"), "v", target = 10.0, k = 0.5, h = 5.0)
      .select("k", "seq", "s_pos", "s_neg", "alarm")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(4)) None else Some(r.getBoolean(4)))).toMap
    def snap(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    rows.groupBy(_._1).foreach { case (key, grp) =>
      var sp = 0.0; var sn = 0.0
      grp.sortBy(_._2).foreach { case (_, seq, vo) =>
        vo match {
          case Some(x) =>
            sp = snap(math.max(0.0, sp + x - 10.0 - 0.5))
            sn = snap(math.max(0.0, sn + (10.0 - 0.5 - x)))
            assert(got((key, seq)) == ((Some(sp), Some(sp > 5.0 || sn > 5.0))),
              s"$key/$seq")
          case None =>
            assert(got((key, seq)) == ((None, None)), s"$key/$seq null")
        }
      }
    }
    // the sustained +3 drift must alarm (2.5/step accumulates past h=5)
    assert(got(("A", 13L))._2.contains(true), "drift must alarm by step 13")
    // on-target noise never alarms
    assert((1 to 15).forall(i => got(("B", i.toLong))._2.contains(false)))
    intercept[IllegalArgumentException](DriftOps.cusum(df, Seq("k"), Nil, "v", 10, 0.5, 5))
    intercept[IllegalArgumentException](DriftOps.cusum(df, Seq("k"), Seq("seq"), "v", 10, -1, 5))
  }
}
