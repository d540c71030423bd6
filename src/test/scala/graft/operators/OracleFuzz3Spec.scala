package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 wave-3 fuzz: randomized-parameter replays for the
  * rfm/gini/calibration/benford/radius/kcore/jaro/llr/asof-tolerance
  * additions. Same discipline as [[OracleFuzzSpec]] — random inputs
  * AND random params per trial, checked against an independent
  * plain-Scala replay; fixed seeds.
  */
class OracleFuzz3Spec extends SparkSpec {
  import spark.implicits._

  private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  // Spark `percentile` (type-7) replay
  private def pct(sorted: IndexedSeq[Double], p: Double): Double = {
    val pos = p * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  test("fuzz: radiusJoin equals brute force under random radii and offsets") {
    val rng = new scala.util.Random(311)
    for (trial <- 1 to 5) {
      val r = 0.5 + rng.nextDouble() * 20
      val off = rng.nextDouble() * 200 - 100
      val l = (1L to 120L).map(i => (i, off + rng.nextDouble() * 60, off + rng.nextDouble() * 60))
      val rt = (1L to 120L).map(i => (i + 500L, off + rng.nextDouble() * 60, off + rng.nextDouble() * 60))
      val got = SpatialOps.radiusJoin(l.toDF("lid", "x", "y"), rt.toDF("rid", "x", "y"),
        "x", "y", r, Seq("lid"), Seq("rid"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val want = (for { (a, ax, ay) <- l; (b, bx, by) <- rt
        if (ax - bx) * (ax - bx) + (ay - by) * (ay - by) <= r * r } yield (a, b)).toSet
      assert(got == want, s"trial $trial r=$r: missing ${(want -- got).size}, extra ${(got -- want).size}")
    }
  }

  test("fuzz: gini matches the rank-sum replay under ties and zeros") {
    val rng = new scala.util.Random(312)
    for (trial <- 1 to 6) {
      val rows = (1L to (20 + rng.nextInt(200)).toLong)
        .map(i => (i, rng.nextInt(1 + rng.nextInt(50)).toLong))
      val got = StatsOps.giniConcentration(
        rows.toDF("id", "v").withColumn("g", lit("g")), Seq("g"), "v", "id").head()
      val sorted = rows.sortBy(t => (t._2, t._1)).map(_._2)
      val n = sorted.length.toLong
      val tot = sorted.sum
      val iw = sorted.zipWithIndex.map { case (v, i) => (i + 1) * v }.sum
      if (tot == 0) assert(got.isNullAt(3))
      else {
        val want = snap9(2.0 * iw / (n.toDouble * tot) - (n + 1).toDouble / n)
        assert(got.getDouble(3) == want, s"trial $trial: ${got.getDouble(3)} vs $want")
      }
    }
  }

  test("fuzz: rfm scores match the threshold replay at random as-of dates") {
    val rng = new scala.util.Random(313)
    for (trial <- 1 to 4) {
      val asOf = f"2002-0${1 + rng.nextInt(8)}%s-15"
      val rows = (0 until 150 + rng.nextInt(200)).map { _ =>
        val cust = rng.nextInt(40).toLong
        val day = f"${1995 + rng.nextInt(6)}%d-${1 + rng.nextInt(12)}%02d-${1 + rng.nextInt(28)}%02d"
        (cust, day, 1.0 + rng.nextInt(100000) / 100.0)
      }
      val df = rows.toDF("cust", "d", "amt").withColumn("d", col("d").cast("timestamp"))
      val got = FunnelOps.rfm(df, "cust", "d", "amt", asOf)
        .collect().map(r => r.getLong(0) -> (r.getInt(4), r.getInt(5), r.getInt(6))).toMap
      // local replay
      val fmt = java.time.LocalDate.parse(asOf)
      val base = rows.groupBy(_._1).map { case (c, xs) =>
        val last = xs.map(_._2).max
        val rec = java.time.temporal.ChronoUnit.DAYS.between(java.time.LocalDate.parse(last), fmt)
        val cents = xs.map(x => math.round(x._3 * 100)).sum
        (c, rec.toDouble, xs.size.toDouble, cents.toDouble)
      }.toSeq
      def scores(metric: Seq[Double], v: Double, invert: Boolean): Int = {
        val s = metric.sorted.toIndexedSeq
        val above = Seq(0.2, 0.4, 0.6, 0.8).count(q => v > pct(s, q))
        if (invert) 5 - above else 1 + above
      }
      base.foreach { case (c, rec, freq, cents) =>
        val want = (scores(base.map(_._2), rec, invert = true),
          scores(base.map(_._3), freq, invert = false),
          scores(base.map(_._4), cents, invert = false))
        assert(got(c) == want, s"trial $trial cust $c: ${got(c)} vs $want")
      }
    }
  }

  test("fuzz: benford chi2 matches the local grid replay") {
    val rng = new scala.util.Random(314)
    for (trial <- 1 to 5) {
      val rows = (0 until 100 + rng.nextInt(300)).map(_ =>
        ("g", math.abs(rng.nextLong() % 999999L) + 1L))
      val got = StatsOps.benfordTest(rows.toDF("g", "v"), Seq("g"), "v")
        .collect().map(r => r.getInt(1) -> r).toMap
      val n = rows.size.toDouble
      val byDigit = rows.groupBy(_._2.toString.head.asDigit).view.mapValues(_.size.toLong).toMap
      val terms = (1 to 9).map { d =>
        val obs = byDigit.getOrElse(d, 0L)
        assert(got(d).getLong(2) == obs, s"trial $trial digit $d")
        val e = n * math.log10(1.0 + 1.0 / d)
        snap9((obs - e) * (obs - e) / e)
      }
      val want = snap9(terms.sum)
      assert(math.abs(got(1).getDouble(5) - want) < 2e-9, s"trial $trial chi2")
    }
  }

  test("fuzz: kCore matches the iterative peel replay on random graphs") {
    val rng = new scala.util.Random(315)
    for (trial <- 1 to 5) {
      val nNodes = 30 + rng.nextInt(40)
      val k = 2 + rng.nextInt(3)
      val edges = (0 until nNodes * 2).map(_ =>
        (rng.nextInt(nNodes).toLong, rng.nextInt(nNodes).toLong))
      val got = GraphOps.kCore(edges.toDF("src", "dst"), k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // local peel
      var es = edges.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      var changed = true
      while (changed) {
        val deg = es.flatMap(e => Seq(e._1, e._2)).groupBy(identity).view.mapValues(_.size).toMap
        val alive = deg.filter(_._2 >= k).keySet
        val next = es.filter(e => alive(e._1) && alive(e._2))
        changed = next.size != es.size
        es = next
      }
      val want = es.flatMap(e => Seq(e._1, e._2)).groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(got == want, s"trial $trial k=$k: $got vs $want")
    }
  }

  test("fuzz: fuzzyJoinJaro equals the brute-force blocked scan at random thresholds") {
    val rng = new scala.util.Random(316)
    val words = Seq("alpha", "alphas", "alpine", "beta", "betas", "bravo", "brave",
      "gamma", "gamut", "delta", "delts", "omega")
    for (trial <- 1 to 5) {
      val thr = 0.7 + rng.nextDouble() * 0.25
      val l = rng.shuffle(words).take(6).zipWithIndex.map { case (w, i) => (i.toLong, w) }
      val r = rng.shuffle(words).take(8).zipWithIndex.map { case (w, i) => (i + 100L, w) }
      val got = FuzzyJoinOps.fuzzyJoinJaro(l.toDF("lid", "a"), r.toDF("rid", "b"),
        "a", "b", thr, blockPrefix = 2)
        .collect().map(x => (x.getLong(0), x.getLong(2))).toSet
      val want = (for { (li, a) <- l; (ri, b) <- r
        if a.take(2) == b.take(2)
        s = math.floor(graft.functions.StringSimilarity.jaroWinklerKernel(
          org.apache.spark.unsafe.types.UTF8String.fromString(a),
          org.apache.spark.unsafe.types.UTF8String.fromString(b)) * 1e6 + 0.5) / 1e6
        if s >= thr } yield (li, ri)).toSet
      assert(got == want, s"trial $trial thr=$thr")
    }
  }

  test("fuzz: asof tolerance equals the filtered replay at random horizons") {
    val rng = new scala.util.Random(317)
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    for (trial <- 1 to 5) {
      val tol = 10L + rng.nextInt(500)
      val left = (1L to 60L).map(i => (rng.nextInt(4), ts(rng.nextInt(2000).toLong), i))
      val right = (1L to 30L).map(i => (rng.nextInt(4), ts(rng.nextInt(2000).toLong), i * 1.0))
        .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq // unique (k, rt)
      val got = AsofJoinOps.asofBackward(
        left.toDF("k", "t", "lid"), right.toDF("k", "rt", "price"),
        "k", "t", "rt", Seq("price"), toleranceSeconds = Some(tol))
        .collect().map(r => r.getLong(2) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      left.foreach { case (k, t, lid) =>
        val cand = right.filter(r => r._1 == k && !r._2.after(t))
        val want = if (cand.isEmpty) None else {
          val best = cand.maxBy(_._2.getTime)
          if (t.getTime - best._2.getTime <= tol * 1000) Some(best._3) else None
        }
        assert(got(lid) == want, s"trial $trial lid=$lid tol=$tol")
      }
    }
  }

  test("fuzz: calibrationCurve bins and rates match the local replay") {
    val rng = new scala.util.Random(318)
    for (trial <- 1 to 5) {
      val bins = 4 + rng.nextInt(16)
      val rows = (0 until 80 + rng.nextInt(200)).map(_ =>
        (rng.nextInt(1001) / 1000.0, rng.nextInt(2)))
      val got = EvalOps.calibrationCurve(rows.toDF("s", "y"), "y", "s", bins)
        .collect().map(r => r.getInt(0) -> (r.getLong(3), r.getLong(4))).toMap
      val want = rows.groupBy { case (s, _) =>
        math.min(math.max(math.floor(s * bins), 0), bins - 1).toInt
      }.view.mapValues(xs => (xs.size.toLong, xs.count(_._2 == 1).toLong)).toMap
      assert(got == want, s"trial $trial bins=$bins")
    }
  }
}
