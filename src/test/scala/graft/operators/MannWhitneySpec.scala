package graft.operators

import graft.SparkSpec

class MannWhitneySpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, String, Double)], a: String = "A", b: String = "B") =
    StatsOps.mannWhitneyU(rows.map(t => ("f1", t._2, t._3)).toDF("f", "g", "v"),
      "f", "v", "g", a, b).head()

  test("mannWhitneyU: textbook no-ties case") {
    // A = {1,2,3}, B = {4,5,6}: complete separation. Ranks 1..6,
    // R_A = 6, U_A = 6 - 3*4/2 = 0, U_B = 9.
    val rows = Seq(1.0, 2.0, 3.0).map(v => ("f1", "A", v)) ++
      Seq(4.0, 5.0, 6.0).map(v => ("f1", "B", v))
    val r = run(rows)
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Double]("u_a") == 0.0)
    assert(r.getAs[Double]("u_b") == 9.0)
    // z = (0 - 4.5)/sqrt(9*7/12) = -4.5/sqrt(5.25)
    val z = math.floor(-4.5 / math.sqrt(5.25) * 1e9 + 0.5) / 1e9
    assert(r.getAs[Double]("z") == z)
    assert(r.getAs[Double]("r_rank_biserial") == -1.0)
  }

  test("mannWhitneyU: midranks and the tie correction") {
    // A = {1, 2, 2}, B = {2, 3}: value 2 has t=3 -> midrank (2+3+4)/3 = 3
    // ranks: 1->1; 2,2,2 -> 3 each; 3 -> 5. R_A = 1+3+3 = 7, U_A = 7-6 = 1
    val rows = Seq(("f1", "A", 1.0), ("f1", "A", 2.0), ("f1", "A", 2.0),
      ("f1", "B", 2.0), ("f1", "B", 3.0))
    val r = run(rows)
    assert(r.getAs[Double]("u_a") == 1.0)
    assert(r.getAs[Double]("u_b") == 5.0)
    // sigma2 = nA*nB/12 * ((n+1) - (t^3-t)/(n(n-1))) = 6/12 * (6 - 24/20)
    val sigma2 = 0.5 * (6.0 - 24.0 / 20.0)
    val z = math.floor((1.0 - 3.0) / math.sqrt(sigma2) * 1e9 + 0.5) / 1e9
    assert(r.getAs[Double]("z") == z)
  }

  test("mannWhitneyU: swapping the groups negates z and swaps U") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 60).map(i =>
      ("f1", if (i % 2 == 0) "A" else "B", rnd.nextInt(20).toDouble))
    val ab = run(rows)
    val ba = run(rows, a = "B", b = "A")
    assert(ab.getAs[Double]("u_a") == ba.getAs[Double]("u_b"))
    assert(math.abs(ab.getAs[Double]("z") + ba.getAs[Double]("z")) <= 1e-9)
  }

  test("mannWhitneyU: all-identical values emit null z/p, exact U") {
    val rows = (0 until 10).map(i => ("f1", if (i < 4) "A" else "B", 7.0))
    val r = run(rows)
    assert(r.isNullAt(r.fieldIndex("z")) && r.isNullAt(r.fieldIndex("p_value")))
    // every rank is the midrank 5.5: U_A = 4*5.5 - 10 = 12 = nA*nB/2
    assert(r.getAs[Double]("u_a") == 12.0)
  }

  test("mannWhitneyU: features missing a group drop; p matches the erfc chain") {
    val rows = Seq(("f1", "A", 1.0), ("f1", "B", 2.0), ("f2", "A", 1.0))
    val out = StatsOps.mannWhitneyU(rows.toDF("f", "g", "v"), "f", "v", "g", "A", "B")
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("f1"))
    val rnd = new scala.util.Random(5)
    val big = (0 until 300).map(i =>
      ("f1", if (i % 3 == 0) "A" else "B", rnd.nextDouble() + (if (i % 3 == 0) 0.2 else 0.0)))
    val r = run(big)
    val z = r.getAs[Double]("z")
    val zn = math.abs(z) / math.sqrt(2.0)
    val s = 1.0 / (1.0 + 0.3275911 * zn)
    val p = s * (0.254829592 + s * (-0.284496736 + s * (1.421413741 +
      s * (-1.453152027 + s * 1.061405429)))) * math.exp(-zn * zn)
    assert(r.getAs[Double]("p_value") == math.floor(p * 1e9 + 0.5) / 1e9)
  }
}
