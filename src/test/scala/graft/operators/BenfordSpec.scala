package graft.operators

import graft.SparkSpec

class BenfordSpec extends SparkSpec {
  import spark.implicits._

  test("benfordTest: digit extraction, zero-cell grid, and the chi2 closed form") {
    // 10 values: four leading-1s, the rest single occurrences;
    // digits 5..9 unobserved but still on the grid
    val vals = Seq(1L, 10L, 123L, 199L, 2L, 25L, 3L, 31L, 4L, 47L)
    val out = StatsOps.benfordTest(vals.map(("g", _)).toDF("g", "v"), Seq("g"), "v")
      .collect().map(r => r.getInt(1) -> r).toMap
    assert(out.keySet == (1 to 9).toSet, "all nine digits present")
    assert(out(1).getLong(2) == 4L && out(5).getLong(2) == 0L)
    assert(out(1).getDouble(3) == 0.4)
    val p1 = math.log10(2.0)
    assert(out(1).getDouble(4) == p1)
    // chi2 identical on every row of the group and equals the sum
    val terms = (1 to 9).map { d =>
      val n = out(d).getLong(2).toDouble
      val e = 10.0 * out(d).getDouble(4)
      math.floor((n - e) * (n - e) / e * 1e9 + 0.5) / 1e9
    }
    val want = math.floor(terms.sum * 1e9 + 0.5) / 1e9
    assert((1 to 9).forall(d => math.abs(out(d).getDouble(5) - want) < 1e-9),
      s"chi2 ${out(1).getDouble(5)} vs $want")
  }

  test("benfordTest: non-positive and null values are excluded") {
    val df = Seq(("g", Some(100L)), ("g", Some(0L)), ("g", Some(-5L)), ("g", None))
      .toDF("g", "v")
    val out = StatsOps.benfordTest(df, Seq("g"), "v").collect()
    assert(out.map(_.getLong(2)).sum == 1L, "only the single positive value counts")
  }

  test("benfordTest: a Benford-conforming sample scores lower chi2 than a flat one") {
    // geometric spread (Benford-ish) vs all-leading-9 (maximally off)
    val benford = (0 until 200).map(i => math.pow(10.0, i * 0.017 % 3).toLong + 1)
    val skew = (0 until 200).map(_ => 900L + (util.Random.nextInt(99)))
    val b = StatsOps.benfordTest(benford.map(("b", _)).toDF("g", "v"), Seq("g"), "v")
      .head().getDouble(5)
    val s = StatsOps.benfordTest(skew.map(("s", _)).toDF("g", "v"), Seq("g"), "v")
      .head().getDouble(5)
    assert(s > b, s"flat-9 sample chi2 $s must exceed geometric $b")
  }
}
