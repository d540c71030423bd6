package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsProfileSpec extends SparkSpec {
  import spark.implicits._

  test("linearTrend: recovers an exact line with r2 = 1") {
    // y = 3x + 7 exactly
    val df = (0 to 10).map(i => ("g", i.toDouble, 3.0 * i + 7.0)).toDF("g", "x", "y")
    val r = StatsOps.linearTrend(df, Seq("g"), "x", "y").head()
    assert(r.getLong(1) == 11L)
    assert(math.abs(r.getDouble(2) - 3.0) < 1e-8, s"slope ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - 7.0) < 1e-7, s"intercept ${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-8, s"r2 ${r.getDouble(4)}")
  }

  test("linearTrend: intercept is in ORIGINAL x coordinates after the shift") {
    // same line but x offset by 1e6 — shift must not corrupt intercept
    val df = (0 to 10).map(i => ("g", 1e6 + i, 2.0 * (1e6 + i) - 5.0)).toDF("g", "x", "y")
    val r = StatsOps.linearTrend(df, Seq("g"), "x", "y").head()
    assert(math.abs(r.getDouble(2) - 2.0) < 1e-6, s"slope ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - (-5.0)) < 1e-2, s"intercept ${r.getDouble(3)}")
  }

  test("linearTrend: constant x yields NULL slope/intercept/r2") {
    val df = Seq(("g", 5.0, 1.0), ("g", 5.0, 2.0)).toDF("g", "x", "y")
    val r = StatsOps.linearTrend(df, Seq("g"), "x", "y").head()
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("momentsProfile: symmetric data has ~zero skew, uniform has negative excess kurtosis") {
    val vals = (1 to 9).map(_.toDouble) // uniform 1..9: skew 0, kurt < 0
    val df = vals.map(("g", _)).toDF("g", "v")
    val r = StatsOps.momentsProfile(df, Seq("g"), "v").head()
    assert(r.getLong(1) == 9L)
    assert(r.getDouble(2) == 5.0) // mean
    assert(math.abs(r.getDouble(4)) < 1e-9, s"skew ${r.getDouble(4)}")
    assert(r.getDouble(5) < 0, s"kurt ${r.getDouble(5)}")
  }

  test("momentsProfile: matches closed forms on a known asymmetric set") {
    // {0,0,0,1}: mean .25, m2 = .1875, m3 = .09375, m4 = .08203125
    // skew = m3/m2^1.5 = 1.1547005, kurt = m4/m2^2 - 3 = -2/3
    val df = Seq(0.0, 0.0, 0.0, 1.0).map(("g", _)).toDF("g", "v")
    // |v| <= 1: no prescale needed, keep full snap precision
    val r = StatsOps.momentsProfile(df, Seq("g"), "v", scalePow2 = 0).head()
    assert(math.abs(r.getDouble(3) - 0.1875) < 1e-9)
    assert(math.abs(r.getDouble(4) - 1.154700538) < 1e-6, s"skew ${r.getDouble(4)}")
    assert(math.abs(r.getDouble(5) - (-2.0 / 3.0)) < 1e-6, s"kurt ${r.getDouble(5)}")
    val jb = 4.0 / 6.0 * (math.pow(1.154700538, 2) + math.pow(2.0 / 3.0, 2) / 4.0)
    assert(math.abs(r.getDouble(6) - jb) < 1e-5, s"jb ${r.getDouble(6)}")
  }

  test("momentsProfile: zero variance yields NULL shape stats") {
    val df = Seq(("g", 2.0), ("g", 2.0)).toDF("g", "v")
    val r = StatsOps.momentsProfile(df, Seq("g"), "v").head()
    assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
  }

  test("profileColumns: counts, nulls, distincts, min/max as strings") {
    val df = Seq((1L, Some("b")), (2L, Some("a")), (3L, None), (3L, Some("a")))
      .toDF("id", "tag")
    val rows = StatsOps.profileColumns(df, Seq("id", "tag"))
      .collect().map(r => r.getString(0) -> r).toMap
    val idr = rows("id")
    assert((idr.getLong(1), idr.getLong(2), idr.getLong(3)) == ((4L, 0L, 3L)))
    assert(idr.getString(4) == "1" && idr.getString(5) == "3")
    val tr = rows("tag")
    assert((tr.getLong(1), tr.getLong(2), tr.getLong(3)) == ((4L, 1L, 2L)))
    assert(tr.getString(4) == "a" && tr.getString(5) == "b")
  }
}
