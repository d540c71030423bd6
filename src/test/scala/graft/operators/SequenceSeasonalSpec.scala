package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SequenceSeasonalSpec extends SparkSpec {
  import spark.implicits._

  test("transitionMatrix: exact counts and row-normalized probabilities") {
    // user 1: a->b->a->c ; user 2: b->a->b ; null types skip
    val rows = Seq(
      (1L, 1L, Some("a")), (1L, 2L, Some("b")), (1L, 3L, Some("a")), (1L, 4L, Some("c")),
      (2L, 1L, Some("b")), (2L, 2L, Some("a")), (2L, 3L, Some("b")),
      (3L, 1L, Some("a")), (3L, 2L, None), (3L, 3L, Some("b"))
    ).map { case (u, s, t) => (u, s, t.orNull) }
    val got = SequenceOps.transitionMatrix(rows.toDF("u", "seq", "et"), "u", Seq("seq"), "et")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // user 3's null SKIPS (filtered before the lag), so a->b still counts
    assert(got == Map(
      ("a", "b") -> (3L, 0.75), ("a", "c") -> (1L, 0.25),
      ("b", "a") -> (2L, 1.0)))
    intercept[IllegalArgumentException](
      SequenceOps.transitionMatrix(rows.toDF("u", "seq", "et"), "u", Nil, "et"))
  }

  test("seasonalAnomalies: per-bucket band, minBucket nulls, hour extraction") {
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")
    // hour 10 for key k: values 10,10,10,10,10 then an outlier 50
    val calm = (0 until 5).map(m => (100L + m, "k", ts(10, m), 10.0))
    val outlier = Seq((200L, "k", ts(10, 30), 50.0))
    // hour 11: only 2 rows -> under minBucket, null flags
    val thin = Seq((300L, "k", ts(11, 0), 1.0), (301L, "k", ts(11, 1), 9.0))
    val df = (calm ++ outlier ++ thin).toDF("id", "k", "ts", "v")
    val got = DriftOps.seasonalAnomalies(df, Seq("k"), "ts", "v", nSigma = 3.0, minBucket = 5)
      .select("id", "season_mean", "is_anomaly")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), if (r.isNullAt(2)) None else Some(r.getBoolean(2)))).toMap
    // hour-10 bucket: mean (5*10+50)/6 = 16.666..., std ~ 14.9; 50 is
    // within 3 sigma (dev 33.3 < 44.7) but 10s are too -> no anomalies...
    // check exact flags from the formula instead of eyeballing:
    val mean = math.floor((5 * 10.0 + 50.0) / 6 * 1e9 + 0.5) / 1e9
    val std = math.floor(math.sqrt((5 * 100.0 + 2500.0) / 6 - mean * mean) * 1e9 + 0.5) / 1e9
    def flag(v: Double) =
      (math.floor(math.abs(v - mean) * 1e9 + 0.5) / 1e9) > (math.floor(3.0 * std * 1e9 + 0.5) / 1e9)
    calm.foreach { case (id, _, _, _) => assert(got(id) == ((mean, Some(flag(10.0))))) }
    assert(got(200L) == ((mean, Some(flag(50.0)))))
    // thin bucket: profile present, flags null
    assert(got(300L)._2.isEmpty && got(301L)._2.isEmpty)
    intercept[IllegalArgumentException](
      DriftOps.seasonalAnomalies(df, Seq("k"), "ts", "v", nSigma = 0))
  }

  test("seasonalAnomalies flags a genuine outlier against a tight band") {
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")
    val rows = (0 until 20).map(m => (m.toLong, "k", ts(9, m), 5.0 + (m % 3) * 0.1)) ++
      Seq((99L, "k", ts(9, 40), 25.0))
    val got = DriftOps.seasonalAnomalies(rows.toDF("id", "k", "ts", "v"), Seq("k"), "ts", "v")
      .select("id", "is_anomaly").as[(Long, Option[Boolean])].collect().toMap
    assert(got(99L).contains(true), "outlier must flag")
    assert((0L until 20L).forall(i => got(i).contains(false)), "band members must not flag")
  }

  test("topPaths: capped path strings, counts, tie-broken top-k") {
    val rows = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c"), (2L, 4L, "d"), // cap 3 -> same path as user 1
      (3L, 1L, "a"), (3L, 2L, "b"),
      (4L, 1L, "x")
    )
    val got = SequenceOps.topPaths(rows.toDF("u", "seq", "et"), "u", Seq("seq"), "et",
        maxLen = 3, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a>b>c", 2L), ("a>b", 1L), ("x", 1L)))
    intercept[IllegalArgumentException](
      SequenceOps.topPaths(rows.toDF("u", "seq", "et"), "u", Seq("seq"), "et", 0, 5))
  }

  test("winsorize clips into the exact type-7 quantile band") {
    val vals = (1 to 100).map(_.toDouble)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }.toDF("id", "g", "v")
    val got = StatsOps.winsorize(df, Seq("g"), "v", 0.10, 0.90)
      .select("id", "q_lo", "q_hi", "winsorized")
      .as[(Long, Double, Double, Double)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // type-7 on 1..100: h_lo = 99*0.1 = 9.9 -> 10.9; h_hi = 89.1 -> 90.1
    got.values.foreach { case (lo, hi, _) =>
      assert(math.abs(lo - 10.9) < 1e-9 && math.abs(hi - 90.1) < 1e-9) }
    assert(math.abs(got(0L)._3 - 10.9) < 1e-9)  // v=1 clips up
    assert(math.abs(got(99L)._3 - 90.1) < 1e-9) // v=100 clips down
    assert(got(49L)._3 == 50.0)                 // v=50 untouched
    intercept[IllegalArgumentException](StatsOps.winsorize(df, Seq("g"), "v", 0.9, 0.1))
  }

  test("targetEncode: smoothed means, LOO leakage guard, singleton/null fallbacks") {
    val rows = Seq(
      (1L, "a", Some(10.0)), (2L, "a", Some(20.0)), (3L, "a", Some(30.0)),
      (4L, "b", Some(100.0)),            // singleton category
      (5L, "c", None),                   // null target
      (6L, null, Some(50.0))             // null category
    ).map { case (i, c, v) => (i, c, v.map(Double.box).orNull) }
    val df = rows.toDF("id", "cat", "v")
    val prior = math.floor((10 + 20 + 30 + 100 + 50) / 5.0 * 1e9 + 0.5) / 1e9 // 42.0
    def s9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    val loo = LabelOps.targetEncode(df, "cat", "v", m = 2.0, leaveOneOut = true)
      .select("id", "te").as[(Long, Double)].collect().toMap
    assert(loo(1L) == s9((50.0 + 2 * prior) / 4))  // others of a: 20+30
    assert(loo(2L) == s9((40.0 + 2 * prior) / 4))
    assert(loo(4L) == prior)                       // singleton -> prior
    assert(loo(5L) == prior)                       // null target -> prior
    assert(loo(6L) == prior)                       // null category -> prior
    val plain = LabelOps.targetEncode(df, "cat", "v", m = 2.0)
      .select("id", "te").as[(Long, Double)].collect().toMap
    assert(plain(1L) == s9((60.0 + 2 * prior) / 5))
    assert(plain(4L) == s9((100.0 + 2 * prior) / 3))
    intercept[IllegalArgumentException](LabelOps.targetEncode(df, "cat", "v", m = -1))
  }

  test("keywords: exact top-k by the sublinear smoothed-idf weight") {
    val docs = Seq(
      (1L, "alpha alpha alpha beta shared"),
      (2L, "beta gamma shared shared"),
      (3L, "delta shared")
    ).toDF("doc_id", "text")
    val got = TextOps.keywords(docs, "doc_id", "text", k = 2)
      .as[(Long, String, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq).toMap
    val n = 3.0
    def w(tf: Double, df: Double) = math.floor(
      (1.0 + math.log(tf)) * (math.log((n + 1.0) / (df + 1.0)) + 1.0) * 1e6 + 0.5) / 1e6
    // df: alpha 1, beta 2, gamma 1, delta 1, shared 3
    assert(got(1L) == Seq(("alpha", w(3, 1)), ("beta", w(1, 2))))
    assert(got(2L) == Seq(("gamma", w(1, 1)), ("shared", w(2, 3))))
    assert(got(3L) == Seq(("delta", w(1, 1)), ("shared", w(1, 3))))
    intercept[IllegalArgumentException](TextOps.keywords(docs, "doc_id", "text", 0))
  }
}
