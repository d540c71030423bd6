package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 wave-16 operators: PACF, Cramér's V. */
class Wave16OpsSpec extends SparkSpec {
  import spark.implicits._

  private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
  private def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)

  test("partialAutocorrelation: AR(1) process cuts off after lag 1") {
    // strongly AR(1): x_t = 0.8 x_{t-1} + deterministic pseudo-noise
    var x = 10.0
    val rng = new scala.util.Random(42)
    val xs = (0 until 400).map { i =>
      x = 0.8 * x + rng.nextGaussian(); (1L, i.toLong, x)
    }
    val r = SequenceOps.partialAutocorrelation(
      xs.toDF("k", "i", "v"), Seq("k"), Seq("i"), "v", maxLag = 3)
      .collect().map(x => x.getInt(1) -> x.getDouble(4)).toMap
    assert(r(1) > 0.6, s"pacf(1)=${r(1)}")
    assert(math.abs(r(2)) < 0.2 && math.abs(r(3)) < 0.2,
      s"AR(1) pacf must cut off: ${r(2)}, ${r(3)}")
  }

  test("partialAutocorrelation matches the hand Durbin-Levinson on the ACF values") {
    val xs = (0 until 60).map(i => (1L, i.toLong, math.sin(i * 0.7) * 10 + i * 0.3))
    val df = xs.toDF("k", "i", "v")
    val acf = SequenceOps.autocorrelation(df, Seq("k"), Seq("i"), "v", 3)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    val r = SequenceOps.partialAutocorrelation(df, Seq("k"), Seq("i"), "v", 3)
      .collect().map(x => x.getInt(1) -> x.getDouble(4)).toMap
    val (a1, a2, a3) = (acf(1), acf(2), acf(3))
    val f22 = snap9((a2 - a1 * a1) / (1.0 - a1 * a1))
    val f21 = snap9(a1 - f22 * a1)
    val p3 = snap9((a3 - f21 * a2 - f22 * a1) / (1.0 - f21 * a1 - f22 * a2))
    assert(r(1) == a1 && r(2) == f22 && r(3) == p3, s"$r vs ($a1, $f22, $p3)")
  }

  test("partialAutocorrelation: constant series (null acf) yields null pacf") {
    val df = (0 until 20).map(i => (1L, i.toLong, 5.0)).toDF("k", "i", "v")
    val r = SequenceOps.partialAutocorrelation(df, Seq("k"), Seq("i"), "v", 2).collect()
    assert(r.nonEmpty && r.forall(_.isNullAt(4)))
  }

  test("cramersV: perfect association scores 1, independence scores ~0") {
    // perfect: lang determines hi exactly, 2x2
    val perfect = (Seq.fill(20)(("g", "en", 1)) ++ Seq.fill(20)(("g", "fr", 0)))
      .toDF("grp", "lang", "hi")
    val vp = StatsOps.cramersV(perfect, Seq("grp"), "lang", "hi")
      .collect().head.getAs[Double]("cramers_v")
    assert(vp == 1.0, s"perfect V=$vp")
    // independent: both langs split 50/50
    val indep = (Seq.fill(10)(("g", "en", 1)) ++ Seq.fill(10)(("g", "en", 0)) ++
      Seq.fill(10)(("g", "fr", 1)) ++ Seq.fill(10)(("g", "fr", 0))).toDF("grp", "lang", "hi")
    val vi = StatsOps.cramersV(indep, Seq("grp"), "lang", "hi")
      .collect().head.getAs[Double]("cramers_v")
    assert(vi == 0.0, s"independent V=$vi")
    // single-category table → null V
    val degen = Seq.fill(5)(("g", "en", 1)).toDF("grp", "lang", "hi")
    assert(StatsOps.cramersV(degen, Seq("grp"), "lang", "hi")
      .collect().head.isNullAt(5))
  }
}
