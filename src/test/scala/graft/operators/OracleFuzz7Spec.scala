package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 wave-14..16 fuzz: randomized-parameter replays for WOE,
  * gains chart, Wilson rates, dedup weights and PACF. Fixed seeds,
  * independent plain-Scala replays.
  */
class OracleFuzz7Spec extends SparkSpec {
  import spark.implicits._

  private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  test("fuzz: weightOfEvidence replays the smoothed ln-ratio at random tables") {
    val rng = new scala.util.Random(711)
    for (trial <- 1 to 5) {
      val rows = (1 to 200 + rng.nextInt(200)).map(_ =>
        (s"c${rng.nextInt(6)}", rng.nextInt(2)))
      val got = StatsOps.weightOfEvidence(rows.toDF("cat", "lbl"), "cat", "lbl")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      val tp = rows.count(_._2 == 1).toLong
      val tn = rows.count(_._2 == 0).toLong
      rows.groupBy(_._1).foreach { case (c, xs) =>
        val np = xs.count(_._2 == 1).toLong; val nn = xs.count(_._2 == 0).toLong
        val want = if (tp > 0 && tn > 0) {
          val dp = snap9(np.toDouble / tp + 1e-6); val dn = snap9(nn.toDouble / tn + 1e-6)
          Some(snap9(math.log(dp / dn)))
        } else None
        assert(got(c) == ((np, nn, want)), s"trial $trial cat $c")
      }
    }
  }

  test("fuzz: gainsChart counts replay at random bucket counts") {
    val rng = new scala.util.Random(712)
    for (trial <- 1 to 5) {
      val n = 3 + rng.nextInt(8)
      val rows = (1 to 100 + rng.nextInt(300)).map(i =>
        (i.toLong, rng.nextInt(1000).toDouble, rng.nextInt(2)))
      val got = EvalOps.gainsChart(rows.toDF("id", "score", "lbl"), "lbl", "score", "id", n)
        .collect().map(r => r.getAs[Int]("bucket") ->
          (r.getAs[Long]("n_rows"), r.getAs[Long]("n_pos"),
            r.getAs[Long]("cum_pos"), r.getAs[Double]("capture_rate"))).toMap
      // replay ntile semantics: ordered desc by (score desc, id asc)
      val ordered = rows.sortBy(r => (-r._2, r._1))
      val total = ordered.size
      val base = total / n; val rem = total % n
      val sizes = (1 to n).map(b => base + (if (b <= rem) 1 else 0))
      val bounds = sizes.scanLeft(0)(_ + _)
      val tp = ordered.count(_._3 == 1).toLong
      (1 to n).foreach { b =>
        val slice = ordered.slice(bounds(b - 1), bounds(b))
        val cumPos = ordered.take(bounds(b)).count(_._3 == 1).toLong
        val want = (slice.size.toLong, slice.count(_._3 == 1).toLong, cumPos,
          snap9(cumPos.toDouble / tp))
        assert(got(b) == want, s"trial $trial n=$n bucket $b: ${got(b)} vs $want")
      }
    }
  }

  test("fuzz: rateWithCi replays the Wilson interval at random z") {
    val rng = new scala.util.Random(713)
    for (trial <- 1 to 6) {
      val z = 1.0 + rng.nextDouble() * 2.0
      val n = 5 + rng.nextInt(500)
      val k = rng.nextInt(n + 1)
      val rows = (1 to n).map(i => ("g", if (i <= k) 1 else 0))
      val r = EvalOps.rateWithCi(rows.toDF("g", "lbl"), "lbl", Seq("g"), z)
        .collect().head
      val p = snap9(k.toDouble / n)
      val z2 = z * z
      val denom = snap9(1.0 + z2 / n)
      val center = snap9((p + z2 / (2.0 * n)) / denom)
      val hw = snap9(z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n)) / denom)
      assert(r.getAs[Double]("ci_lo") == snap9(center - hw) &&
        r.getAs[Double]("ci_hi") == snap9(center + hw), s"trial $trial z=$z n=$n k=$k")
    }
  }

  test("fuzz: dedupWeights total mass equals the distinct-document count") {
    val rng = new scala.util.Random(714)
    for (trial <- 1 to 5) {
      val nDocs = 50 + rng.nextInt(100)
      val docs = (1L to nDocs.toLong).map(i => (i, "x")).toDF("id", "t")
      // random clusters over a subset
      val members = rng.shuffle((1L to nDocs.toLong).toList).take(nDocs / 2)
      val clusters = members.zipWithIndex
        .map { case (m, i) => (m, (i % 7).toLong) }
        .filter { case (_, c) => true }
      val clDf = clusters.toDF("member", "cluster_id")
      val w = MixOps.dedupWeights(docs, "id", clDf, "cluster_id", "member")
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("dedup_weight")).toMap
      val sizes = clusters.groupBy(_._2).map { case (c, xs) => c -> xs.size }
      clusters.foreach { case (m, c) => assert(w(m) == snap9(1.0 / sizes(c))) }
      val singles = (1L to nDocs.toLong).toSet -- members
      singles.foreach(s => assert(w(s) == 1.0))
      val expectedMass = sizes.size + singles.size
      assert(math.abs(w.values.sum - expectedMass) < 1e-6 * nDocs, s"trial $trial")
    }
  }

  test("fuzz: partialAutocorrelation equals the local Durbin-Levinson at random maxLag") {
    val rng = new scala.util.Random(715)
    for (trial <- 1 to 4) {
      val maxLag = 2 + rng.nextInt(4)
      val xs = (0 until 50 + rng.nextInt(100)).map(_ => rng.nextDouble() * 100)
      val df = xs.zipWithIndex.map { case (v, i) => ("k", i, v) }.toDF("k", "i", "v")
      val acf = SequenceOps.autocorrelation(df, Seq("k"), Seq("i"), "v", maxLag)
        .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
      val got = SequenceOps.partialAutocorrelation(df, Seq("k"), Seq("i"), "v", maxLag)
        .collect().map(r => r.getInt(1) -> r.getDouble(4)).toMap
      // local DL over the snapped acf values, same snap discipline
      val rho = Array.tabulate(maxLag + 1)(l => if (l == 0) 1.0 else acf(l))
      var phi = Array.fill(maxLag + 1)(0.0)
      val want = scala.collection.mutable.Map[Int, Double]()
      want(1) = rho(1); phi(1) = rho(1)
      for (k <- 2 to maxLag) {
        var num = rho(k); var den = 1.0
        for (j <- 1 until k) { num -= phi(j) * rho(k - j); den -= phi(j) * rho(j) }
        val pkk = snap9(num / den)
        val np = Array.fill(maxLag + 1)(0.0)
        for (j <- 1 until k) np(j) = snap9(phi(j) - pkk * phi(k - j))
        np(k) = pkk; phi = np
        want(k) = pkk
      }
      (1 to maxLag).foreach(l =>
        assert(got(l) == want(l), s"trial $trial maxLag=$maxLag lag $l: ${got(l)} vs ${want(l)}"))
    }
  }
}
