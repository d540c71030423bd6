package graft.operators

import graft.SparkSpec

class PcaOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic synthetic cloud with a planted dominant
    * direction: x = t·w + small structured noise, t in [-1, 1].
    */
  private def planted(n: Int, dim: Int): Seq[(Long, Array[Float])] = {
    val w = Array.tabulate(dim)(i => math.cos(i * 0.7) / math.sqrt(dim / 2.0))
    (0 until n).map { r =>
      val t = 2.0 * r / (n - 1) - 1.0
      val v = Array.tabulate(dim)(i => (t * w(i) + 0.01 * math.sin(r * 1.3 + i)).toFloat)
      (r.toLong, v)
    }
  }

  test("fit recovers a planted dominant direction; projection variance = eigenvalue") {
    val dim = 16
    val data = planted(200, dim)
    val df = data.toDF("id", "vec")
    val m = PcaOps.fit(df, "vec", dim, nComponents = 1, iters = 16)
    assert(m.n == 200)
    val w = Array.tabulate(dim)(i => math.cos(i * 0.7) / math.sqrt(dim / 2.0))
    val wn = math.sqrt(w.map(x => x * x).sum)
    val cosine = math.abs(m.components(0).zip(w).map { case (a, b) => a * b }.sum) /
      (wn * math.sqrt(m.components(0).map(x => x * x).sum))
    assert(cosine > 0.999, s"component misaligned: cos=$cosine")
    // projected variance matches the Rayleigh eigenvalue
    val scores = PcaOps.project(df, "id", "vec", m).as[(Long, Double)].collect().map(_._2)
    val mean = scores.sum / scores.length
    val variance = scores.map(s => (s - mean) * (s - mean)).sum / scores.length
    assert(math.abs(variance - m.eigenvalues(0)) < 1e-4,
      s"var $variance vs lambda ${m.eigenvalues(0)}")
  }

  test("two components: orthogonal, decreasing eigenvalues, match Jacobi ground truth") {
    val dim = 8
    val rnd = new scala.util.Random(11)
    val data = (0 until 300).map { r =>
      // anisotropic: dim 0 has 3x the scale of dim 1, rest small
      val v = Array.tabulate(dim)(i => (rnd.nextGaussian() *
        (if (i == 0) 3.0 else if (i == 1) 1.5 else 0.2)).toFloat)
      (r.toLong, v)
    }
    val df = data.toDF("id", "vec")
    val m = PcaOps.fit(df, "vec", dim, nComponents = 2, iters = 24)
    val dot = m.components(0).zip(m.components(1)).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-3, s"components not orthogonal: $dot")
    assert(m.eigenvalues(0) > m.eigenvalues(1), "eigenvalues not decreasing")
    // local covariance + Jacobi eigen ground truth
    val n = data.length
    val means = Array.tabulate(dim)(i => data.map(_._2(i).toDouble).sum / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      data.map(r => (r._2(i) - means(i)) * (r._2(j) - means(j))).sum / n
    }
    val (values, _) = IvfKnnOps.jacobiEigen(cov.map(_.clone()))
    val sorted = values.sorted(Ordering[Double].reverse)
    assert(math.abs(m.eigenvalues(0) - sorted(0)) < 1e-3 * sorted(0),
      s"lambda1 ${m.eigenvalues(0)} vs jacobi ${sorted(0)}")
    assert(math.abs(m.eigenvalues(1) - sorted(1)) < 5e-3 * sorted(0),
      s"lambda2 ${m.eigenvalues(1)} vs jacobi ${sorted(1)}")
  }

  test("fit is partitioning-invariant (exact integer fixed point)") {
    val data = planted(150, 12)
    val a = PcaOps.fit(data.toDF("id", "vec").repartition(7), "vec", 12, 2, 12)
    val b = PcaOps.fit(data.toDF("id", "vec").repartition(3), "vec", 12, 2, 12)
    // components/eigenvalues identical BIT FOR BIT across partitionings:
    // the only float entering fit is the Gram state, whose per-cell sums
    // are permutation-sensitive at ~1e-16 — the 1e-9 covariance snap
    // absorbs that before the integer loop
    assert(a.components.toSeq.map(_.toSeq) == b.components.toSeq.map(_.toSeq))
    assert(a.eigenvalues.sameElements(b.eigenvalues))
    assert(a.mean.sameElements(b.mean))
  }

  test("input validation") {
    val df = planted(10, 4).toDF("id", "vec")
    intercept[IllegalArgumentException](PcaOps.fit(df, "vec", 4, nComponents = 0))
    intercept[IllegalArgumentException](PcaOps.fit(df, "vec", 4, nComponents = 5))
    intercept[IllegalArgumentException](PcaOps.fit(df, "vec", 4, 1, iters = 0))
  }
}
