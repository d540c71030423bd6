package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetentionChiSqSpec extends SparkSpec {
  import spark.implicits._

  // Mondays: 2024-01-01, -08, -15 are consecutive ISO weeks
  private def ts(day: Int, hour: Int = 12) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("retention: weekly cohorts, whole-week offsets, rate from the offset-0 row") {
    val ev = Seq(
      // u1 first active wk1 (Jan 1), returns wk2 and wk3
      (1L, ts(3)), (1L, ts(9)), (1L, ts(16)),
      // u2 first active wk1, never returns (two events same week)
      (2L, ts(2)), (2L, ts(5)),
      // u3 first active wk2 only
      (3L, ts(10))
    ).toDF("user_id", "ts")
    val out = FunnelOps.retention(ev, "user_id", "ts", "week")
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // wk1 cohort: 2 users at offset 0; only u1 at offsets 1 and 2
    assert(out(("2024-01-01", 0L)) == ((2L, 2L, 1.0)))
    assert(out(("2024-01-01", 1L)) == ((1L, 2L, 0.5)))
    assert(out(("2024-01-01", 2L)) == ((1L, 2L, 0.5)))
    // wk2 cohort: u3 alone
    assert(out(("2024-01-08", 0L)) == ((1L, 1L, 1.0)))
    assert(out.size == 4)
  }

  test("retention: a user active twice in one period counts once per period") {
    val ev = Seq((1L, ts(1, 1)), (1L, ts(7, 23))).toDF("user_id", "ts")
    val out = FunnelOps.retention(ev, "user_id", "ts", "week").collect()
    assert(out.length == 1 && out.head.getLong(2) == 1L) // one (cohort, 0) row
  }

  test("retention: monthly periods use calendar month arithmetic") {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-31 10:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-03-01 10:00:00"))
    ).toDF("user_id", "ts")
    val out = FunnelOps.retention(ev, "user_id", "ts", "month")
      .collect().map(r => r.getLong(1)).sorted
    assert(out.toSeq == Seq(0L, 2L)) // Jan cohort, active again in Mar (+2 months)
  }

  test("chiSquaredIndependence matches a hand-computed 2x2 table (zero cell included)") {
    // group g: a∈{x,y}, b∈{0,1}; cell (y,1) observed zero
    val rows =
      Seq.fill(20)(("g", "x", 0)) ++ Seq.fill(10)(("g", "x", 1)) ++
        Seq.fill(15)(("g", "y", 0))
    val out = StatsOps.chiSquaredIndependence(
        rows.toDF("grp", "a", "b"), Seq("grp"), "a", "b")
      .collect().head
    assert(out.getAs[Long]("n") == 45L)
    assert(out.getAs[Long]("dof") == 1L)
    // marginals: x=30, y=15; b0=35, b1=10; e(x,0)=23.333.., e(x,1)=6.666..,
    // e(y,0)=11.666.., e(y,1)=3.333..; chi2 = sum((o-e)^2/e) ≈ 6.42857
    // 2x2 closed form: n(ad-bc)^2 / (r1 r2 c1 c2) = 45*150^2/157500
    assert(math.abs(out.getAs[Double]("chi2") - 45.0 * 150 * 150 / 157500.0) < 1e-6)
    val p = out.getAs[Double]("p_value")
    assert(p > 0.010 && p < 0.012, s"p=$p") // exact: 0.01122
  }

  test("chiSquaredIndependence: independent columns give chi2 ~ 0; dof over maxDf gives null p") {
    // perfectly proportional table → chi2 exactly 0
    val rows = for (a <- Seq("x", "y"); b <- Seq(0, 1); _ <- 1 to 10) yield ("g", a, b)
    val out = StatsOps.chiSquaredIndependence(
        rows.toDF("grp", "a", "b"), Seq("grp"), "a", "b")
      .collect().head
    // A&S erf polynomial sums to ~1 - 1e-9 at z=0, not exactly 1
    assert(out.getAs[Double]("chi2") == 0.0 && out.getAs[Double]("p_value") > 0.9999)
    // 5x5 table → dof 16 > maxDf 12 → statistic emits, p null
    val rng = new scala.util.Random(7)
    val big = (1 to 500).map(_ => ("g", s"a${rng.nextInt(5)}", rng.nextInt(5)))
    val r2 = StatsOps.chiSquaredIndependence(
        big.toDF("grp", "a", "b"), Seq("grp"), "a", "b")
      .collect().head
    assert(r2.getAs[Long]("dof") == 16L)
    assert(r2.isNullAt(r2.fieldIndex("p_value")))
    assert(r2.getAs[Double]("chi2") > 0.0)
  }

  test("chiSquaredIndependence plan: one wide shuffle, contingency aggregate is partial") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("len_hi", (col("n_chars") >= 300).cast("int"))
    val plan = StatsOps.chiSquaredIndependence(d, Seq("source"), "lang", "len_hi")
      .queryExecution.executedPlan.toString
    // map-side partial aggregation collapses the fact table before the exchange
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"), plan)
    val out = StatsOps.chiSquaredIndependence(d, Seq("source"), "lang", "len_hi").collect()
    assert(out.nonEmpty && out.forall(r => r.getAs[Double]("chi2") >= 0.0))
  }
}
