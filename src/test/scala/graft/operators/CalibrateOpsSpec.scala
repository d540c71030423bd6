package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CalibrateOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force isotonic fit via the minimax identity
    * iso(i) = max_{j≤i} min_{k≥i} mean(y[j..k]) in exact rationals.
    */
  private def minimax(cells: Seq[(Long, Long)]): Seq[Double] = {
    // exact fraction order: p1/c1 < p2/c2 ⇔ p1·c2 < p2·c1
    val fracOrd = Ordering.fromLessThan[(BigInt, BigInt)] {
      case ((p1, c1), (p2, c2)) => p1 * c2 < p2 * c1
    }
    val n = cells.length
    (0 until n).map { i =>
      val candidates = for (j <- 0 to i) yield {
        (i until n).map { k =>
          val (p, c) = cells.slice(j, k + 1)
            .foldLeft((0L, 0L)) { case ((ps, cs), (pp, cc)) => (ps + pp, cs + cc) }
          (BigInt(p), BigInt(c))
        }.min(fracOrd)
      }
      val (p, c) = candidates.max(fracOrd)
      p.toDouble / c.toDouble
    }
  }

  test("isotonic: PAV equals the exact minimax fit on a violating profile") {
    // score 0..59 in 6 cells of 10; rates 0.2, 0.8, 0.4 (violation),
    // 0.5, 0.5, 1.0 — PAV must pool cells 1..3
    val rates = Seq(2, 8, 4, 5, 5, 10)
    val rows = for {
      (r, cell) <- rates.zipWithIndex
      i <- 0 until 10
    } yield (cell * 10L + i, if (i < r) 1 else 0)
    val df = rows.toDF("s", "y")
    val m = CalibrateOps.isotonicCalibrate(df, "s", "y", bins = 6)
    assert(m.lo == 0L && m.hi == 59L)
    val got = m.table.orderBy("bin").collect()
    assert(got.map(_.getLong(0)).toSeq == (0L until 6L))
    assert(got.map(_.getLong(1)).forall(_ == 10L))
    val expected = minimax(rates.map(r => (r.toLong, 10L)))
    assert(got.map(_.getDouble(4)).toSeq == expected)
    // monotone and mass-preserving: Σ n·iso = Σ pos
    val iso = got.map(_.getDouble(4))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b })
    assert(math.abs(iso.map(_ * 10).sum - rates.sum) < 1e-9)
    // the violation cascades: cells 1..4 pool to (8+4+5+5)/40 = 0.55
    assert(iso.toSeq == Seq(0.2, 0.55, 0.55, 0.55, 0.55, 1.0))
  }

  test("isotonic: already-monotone input is untouched; raw rates exact") {
    val rows = for {
      (r, cell) <- Seq(1, 3, 7).zipWithIndex
      i <- 0 until 10
    } yield (cell * 10L + i, if (i < r) 1 else 0)
    val m = CalibrateOps.isotonicCalibrate(rows.toDF("s", "y"), "s", "y", bins = 3)
    val got = m.table.orderBy("bin").collect()
    assert(got.map(_.getDouble(3)).toSeq == Seq(0.1, 0.3, 0.7))
    assert(got.map(_.getDouble(4)).toSeq == Seq(0.1, 0.3, 0.7))
  }

  test("isotonic model apply: cell lookup, empty-cell lower fill, range clamp") {
    // 4 bins over scores 0..39, but no rows in cell 2
    val rows = (0 until 10).map(i => (0L + i, 0)) ++
      (0 until 10).map(i => (10L + i, if (i < 5) 1 else 0)) ++
      (0 until 10).map(i => (30L + i, 1))
    val m = CalibrateOps.isotonicCalibrate(rows.toDF("s", "y"), "s", "y", bins = 4)
    assert(m.table.count() == 3) // cell 2 empty
    val probe = Seq(-100L, 5L, 15L, 25L, 35L, 999L).toDF("s")
    val out = m.apply(probe, "s").orderBy("s").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(5L) == 0.0)
    assert(out(15L) == 0.5)
    assert(out(25L) == 0.5) // empty cell takes the lower neighbor
    assert(out(35L) == 1.0)
    assert(out(-100L) == 0.0) // clamped below
    assert(out(999L) == 1.0) // clamped above
  }

  test("conformal: q_hat is the exact k-th smallest calibration residual") {
    // one group; 9 cal rows with residuals 1..9, alpha=0.1 →
    // k = ceil(10*0.9) = 9 → q_hat = 9; test rows 0.5, 9.5
    val rows =
      (1 to 9).map(i => ("g", i.toDouble, 0.0, true)) ++
        Seq(("g", 0.5, 0.0, false), ("g", 9.5, 0.0, false))
    val df = rows.toDF("grp", "y", "pred", "is_cal")
    val out = CalibrateOps.splitConformal(df, "grp", "y", "pred", 0.1, "is_cal").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(r.fieldIndex("n_cal")) == 9L)
    assert(r.getDouble(r.fieldIndex("q_hat")) == 9.0)
    assert(r.getLong(r.fieldIndex("n_test")) == 2L)
    assert(r.getLong(r.fieldIndex("covered")) == 1L)
    assert(r.getDouble(r.fieldIndex("coverage")) == 0.5)
  }

  test("conformal: too few calibration rows yields NULL q_hat, not a fake band") {
    // 3 cal rows at alpha=0.1 → k = ceil(4*0.9) = 4 > 3 → NULL
    val rows = (1 to 3).map(i => ("g", i.toDouble, 0.0, true)) :+ ("g", 1.0, 0.0, false)
    val out = CalibrateOps
      .splitConformal(rows.toDF("grp", "y", "pred", "is_cal"), "grp", "y", "pred", 0.1, "is_cal")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.isNullAt(r.fieldIndex("q_hat")))
    assert(r.isNullAt(r.fieldIndex("covered")))
    assert(r.isNullAt(r.fieldIndex("coverage")))
  }

  test("conformal: per-group isolation and duplicate-residual ranks") {
    // group a: residuals (1,1,1,2), k = ceil(5*0.5) = 3 at alpha=0.5
    // → 3rd smallest = 1; group b: (5,6), k = ceil(3*0.5) = 2 → 6
    val rows = Seq(
      ("a", 1.0, 0.0, true), ("a", 1.0, 0.0, true), ("a", 1.0, 0.0, true),
      ("a", 2.0, 0.0, true), ("a", 1.5, 0.0, false),
      ("b", 5.0, 0.0, true), ("b", 6.0, 0.0, true), ("b", 5.5, 0.0, false))
    val out = CalibrateOps
      .splitConformal(rows.toDF("grp", "y", "pred", "is_cal"), "grp", "y", "pred", 0.5, "is_cal")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getDouble(out("a").fieldIndex("q_hat")) == 1.0)
    assert(out("a").getLong(out("a").fieldIndex("covered")) == 0L)
    assert(out("b").getDouble(out("b").fieldIndex("q_hat")) == 6.0)
    assert(out("b").getLong(out("b").fieldIndex("covered")) == 1L)
  }

  test("input validation") {
    val df = Seq((1L, 1)).toDF("s", "y")
    intercept[IllegalArgumentException] {
      CalibrateOps.isotonicCalibrate(df, "s", "y", bins = 1)
    }
    intercept[IllegalArgumentException] {
      CalibrateOps.splitConformal(df.withColumn("c", lit(true)), "s", "y", "y", 1.5, "c")
    }
    intercept[IllegalArgumentException] {
      CalibrateOps.isotonicCalibrate(df.filter(lit(false)), "s", "y")
    }
  }
}
