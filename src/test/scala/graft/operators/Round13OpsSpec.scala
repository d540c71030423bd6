package graft.operators

import graft.SparkSpec

/** E20 calibrationError, C47 interval gaps, S15 kNN classify,
  * N48 Poisson-bootstrap CI.
  */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  test("calibrationError: hand-computed two-bin ECE/MCE") {
    // bin 0: p=0.05 x2, rate 0 -> gap 0.05; bin 9: p=0.95 x2, rate 0.5 -> gap 0.45
    val df = Seq((0.05, 0), (0.05, 0), (0.95, 1), (0.95, 0)).toDF("p", "y")
    val r = EvalOps.calibrationError(df, "y", "p", bins = 10).head()
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("n_bins") == 2L)
    assert(r.getAs[Double]("ece") == snap9((2 * 0.05 + 2 * 0.45) / 4.0))
    assert(r.getAs[Double]("mce") == snap9(0.45))
  }

  test("calibrationError: perfectly calibrated bins score 0; mce >= ece always") {
    val rows = (0 until 40).map(i => (0.25, if (i % 4 == 0) 1 else 0)) ++
      (0 until 40).map(i => (0.75, if (i % 4 != 0) 1 else 0))
    val r = EvalOps.calibrationError(rows.toDF("p", "y"), "y", "p", bins = 2).head()
    assert(r.getAs[Double]("ece") == 0.0 && r.getAs[Double]("mce") == 0.0)
    val rnd = new scala.util.Random(23)
    val noisy = (0 until 300).map(_ => (rnd.nextInt(1000) / 1000.0, rnd.nextInt(2)))
    val r2 = EvalOps.calibrationError(noisy.toDF("p", "y"), "y", "p", 10).head()
    assert(r2.getAs[Double]("mce") >= r2.getAs[Double]("ece"))
  }

  test("interval gaps: between-island spans; single-island keys emit nothing") {
    val df = Seq(("a", 0L, 10L), ("a", 5L, 12L), ("a", 20L, 25L), ("a", 40L, 41L),
      ("b", 1L, 2L)).toDF("k", "s", "e")
    val out = IntervalOps.gaps(df, "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set(("a", 12L, 20L, 8L), ("a", 25L, 40L, 15L)))
  }

  test("knn classify: majority vote with smallest-label tie-break and k_found") {
    val dim = 4
    def vec(axis: Int, eps: Float = 0f): Seq[Float] = {
      val v = Array.fill(dim)(0.0f); v(axis) = 1.0f; v((axis + 1) % dim) = eps; v.toSeq
    }
    // corpus: around axis0 -> labels 1,1,2 (k=3 majority 1);
    // around axis1 -> labels 5,7,7 at a 2-2... use 4 neighbors k=4 tie
    val corpus = Seq(
      (0L, vec(0, 0.01f), 1), (1L, vec(0, 0.02f), 1), (2L, vec(0, 0.03f), 2),
      (10L, vec(1, 0.01f), 5), (11L, vec(1, 0.02f), 5), (12L, vec(1, 0.03f), 7),
      (13L, vec(1, 0.04f), 7)
    ).toDF("id", "vec", "lab")
    val index = IvfKnnOps.buildIndex(corpus.select("id", "vec"), "id", "vec",
      nLists = 2, maxIter = 8)
    val queries = Seq((100L, vec(0)), (101L, vec(1))).toDF("id", "vec")
    val out = IvfKnnOps.classify(queries, index, "id", "vec",
        corpus.select($"id", $"lab"), "lab", k = 3, nProbe = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(100L) == ((1, 2L, 3L)), s"got ${out(100L)}")
    // query 101's top-3 = {10,11,12}: labels 5,5,7 -> majority 5
    assert(out(101L) == ((5, 2L, 3L)), s"got ${out(101L)}")
    val tied = IvfKnnOps.classify(queries.filter($"id" === 101L), index, "id", "vec",
        corpus.select($"id", $"lab"), "lab", k = 4, nProbe = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getLong(3))).toMap
    // top-4 = {10,11,12,13}: 5x2 vs 7x2 -> tie, smaller label wins
    assert(tied(101L) == ((5, 2L, 4L)), s"got ${tied(101L)}")
  }

  test("bootstrapMeanCi: deterministic, brackets the point mean, exact coin replay") {
    val rnd = new scala.util.Random(31)
    val rows = (0L until 500L).map(i => ("g", i, (rnd.nextInt(2000) - 500).toLong))
    val df = rows.toDF("g", "id", "v")
    val r1 = StatsOps.bootstrapMeanCi(df, Seq("g"), "id", "v", b = 100).head()
    val r2 = StatsOps.bootstrapMeanCi(df.repartition(7), Seq("g"), "id", "v", b = 100).head()
    assert(r1 == r2, "partitioning must not change the record")
    val (lo, hi, mean) = (r1.getAs[Double]("ci_lo"), r1.getAs[Double]("ci_hi"),
      r1.getAs[Double]("mean"))
    assert(lo < hi && lo <= mean && mean <= hi, s"$lo $mean $hi")
    assert(r1.getAs[Long]("b_effective") == 100L)
    assert(r1.getAs[Long]("n") == 500L)

    // exact driver-side replay of one resample's coin chain
    val thresholds = Seq(367873L, 735746L, 919682L, 980995L, 996323L,
      999388L, 999899L, 999972L, 999981L)
    def mult(id: Long, b: Long): Long = {
      val h = ((id * 480879L + b * 104729L + 42L) % 999983L + 999983L) % 999983L
      val k = thresholds.indexWhere(h < _)
      if (k < 0) 8L else k.toLong
    }
    val means = (0L until 100L).flatMap { b =>
      val (s, c) = rows.foldLeft((0L, 0L)) { case ((s, c), (_, id, v)) =>
        val m = mult(id, b); (s + m * v, c + m)
      }
      if (c > 0) Some(math.floor(s.toDouble / c * 1e9 + 0.5) / 1e9) else None
    }.sorted
    val bEff = means.size
    val loK = math.max((BigDecimal("0.05") / 2 * bEff).setScale(0, BigDecimal.RoundingMode.CEILING).toInt, 1)
    val hiK = ((1 - BigDecimal("0.05") / 2) * bEff).setScale(0, BigDecimal.RoundingMode.CEILING).toInt
    assert(lo == means(loK - 1) && hi == means(hiK - 1),
      s"replay ${means(loK - 1)}..${means(hiK - 1)} vs $lo..$hi")
  }

  test("bootstrapMeanCi: out-of-range ids raise — including Long.MinValue, where abs() wraps") {
    for (bad <- Seq(1L << 44, -(1L << 44), Long.MinValue, Long.MaxValue)) {
      val df = Seq(("g", bad, 1L), ("g", 1L, 2L)).toDF("g", "id", "v")
      val e = intercept[Exception] {
        StatsOps.bootstrapMeanCi(df, Seq("g"), "id", "v", b = 10).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("2^44")), s"id=$bad: ${e.getMessage}")
    }
  }

  test("bootstrapMeanCi: narrower interval at larger n (root-n sanity)") {
    def width(n: Int): Double = {
      val rows = (0L until n.toLong).map(i => ("g", i, (i * 7919 % 1000).toLong))
      val r = StatsOps.bootstrapMeanCi(rows.toDF("g", "id", "v"), Seq("g"), "id", "v",
        b = 100).head()
      r.getAs[Double]("ci_hi") - r.getAs[Double]("ci_lo")
    }
    assert(width(2000) < width(100), "CI must shrink with n")
  }
}
