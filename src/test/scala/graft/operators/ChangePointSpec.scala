package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChangePointSpec extends SparkSpec {
  import spark.implicits._

  private def series(key: String, vals: Seq[Double]) =
    vals.zipWithIndex.map { case (v, i) =>
      (key, new java.sql.Timestamp(1700000000000L + i * 60000L), i.toLong, v)
    }

  test("changePoint: a clean level shift splits exactly at the boundary") {
    // 10 points at 10.0 then 10 at 50.0 -> split after position 10
    val rows = series("u", Seq.fill(10)(10.0) ++ Seq.fill(10)(50.0))
    val r = DriftOps.changePoint(rows.toDF("k", "ts", "id", "v"),
      Seq("k"), Seq("ts", "id"), "ts", "v", minSegment = 2).head()
    assert(r.getLong(1) == 20L)
    assert(r.getInt(2) == 10, s"split_pos ${r.getInt(2)}")
    assert(r.getDouble(5) == 10.0 && r.getDouble(6) == 50.0)
    // gain = SSE_total (segments are flat): n1*n2/n * (d)^2 * ... just
    // assert it's the full between-group sum of squares: 20*var
    val d = 50.0 - 10.0
    val want = 10.0 * 10 / 20 * d * d * 10000 / 10000 // cents cancel: gain in cents^2/1? no:
    // gain is computed on cents: (d*100)^2 * n1*n2/n = 4000^2*5
    assert(math.abs(r.getDouble(4) - 4000.0 * 4000.0 * 5) < 1e-3, s"gain ${r.getDouble(4)}")
  }

  test("changePoint: minSegment keeps degenerate edge splits out") {
    // one outlier at the end would win an unconstrained split
    val rows = series("u", Seq.fill(12)(10.0) :+ 99.0)
    val out = DriftOps.changePoint(rows.toDF("k", "ts", "id", "v"),
      Seq("k"), Seq("ts", "id"), "ts", "v", minSegment = 5)
    val r = out.head()
    val pos = r.getInt(2)
    assert(pos >= 5 && 13 - pos >= 5, s"split_pos $pos violates minSegment")
  }

  test("changePoint: keys shorter than 2*minSegment emit nothing; flat series gain 0") {
    val shortRows = series("s", Seq(1.0, 2.0, 3.0))
    assert(DriftOps.changePoint(shortRows.toDF("k", "ts", "id", "v"),
      Seq("k"), Seq("ts", "id"), "ts", "v", minSegment = 5).count() == 0)
    val flat = series("f", Seq.fill(20)(7.0))
    val r = DriftOps.changePoint(flat.toDF("k", "ts", "id", "v"),
      Seq("k"), Seq("ts", "id"), "ts", "v", minSegment = 5).head()
    assert(r.getDouble(4) == 0.0)
    assert(r.getInt(2) == 5, "tie on gain 0 breaks to the smallest admissible split")
  }

  test("changePoint: matches a brute-force SSE scan on a random series") {
    val rng = new scala.util.Random(42)
    val vals = (0 until 60).map(i => (rng.nextInt(2000) / 100.0) + (if (i > 37) 8.0 else 0.0))
    val rows = series("r", vals)
    val r = DriftOps.changePoint(rows.toDF("k", "ts", "id", "v"),
      Seq("k"), Seq("ts", "id"), "ts", "v", minSegment = 5).head()
    // local replay on cents
    val c = vals.map(v => math.round(v * 100))
    def sse(xs: Seq[Long]): Double = {
      val s = xs.sum.toDouble; val q = xs.map(x => x * x).sum.toDouble
      q - s * s / xs.length
    }
    val tot = sse(c)
    val best = (5 to c.length - 5).map(s =>
      s -> (tot - (sse(c.take(s)) + sse(c.drop(s))))).maxBy(t => (t._2, -t._1))
    assert(r.getInt(2) == best._1, s"split ${r.getInt(2)} vs ${best._1}")
    assert(math.abs(r.getDouble(4) - best._2) < 1e-4)
  }
}
