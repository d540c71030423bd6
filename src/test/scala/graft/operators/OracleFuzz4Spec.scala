package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 wave-4/5/6 fuzz: randomized-parameter replays for the
  * quantile/survival/ab-test/assortativity/ndcg/item-sim/forecast
  * additions. Same discipline as [[OracleFuzzSpec]] — random inputs
  * AND random params per trial, checked against an independent
  * plain-Scala replay; fixed seeds.
  */
class OracleFuzz4Spec extends SparkSpec {
  import spark.implicits._

  private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  test("fuzz: approxQuantilesBinned replays the binned CDF at random bins/probs") {
    val rng = new scala.util.Random(411)
    for (trial <- 1 to 6) {
      val bins = 8 + rng.nextInt(200)
      val probs = Seq(0.01 + rng.nextDouble() * 0.49, 0.51 + rng.nextDouble() * 0.49)
      val vals = (1 to 50 + rng.nextInt(500)).map(_ => rng.nextDouble() * 1000 - 300)
      val got = StatsOps.approxQuantilesBinned(
        vals.map(("g", _)).toDF("g", "v"), Seq("g"), "v", probs, bins)
        .collect().map(r => r.getDouble(1) -> r.getDouble(5)).toMap
      // independent replay
      val lo = vals.min; val hi = vals.max; val n = vals.size
      val cells = vals.groupBy { v =>
        if (hi > lo) math.min(math.floor((v - lo) / (hi - lo) * bins).toLong, bins - 1L) else 0L
      }.map { case (b, vs) => b -> vs.size.toLong }
      val sortedBins = cells.keys.toSeq.sorted
      for (p <- probs) {
        val rank = math.max(math.ceil(p * n).toLong, 1L)
        var cum = 0L
        var want = Double.NaN
        for (b <- sortedBins if want.isNaN) {
          val c = cells(b); val prev = cum; cum += c
          if (cum >= rank && prev < rank) {
            want = if (hi > lo)
              snap9(lo + (hi - lo) / bins * (b.toDouble + (rank - prev).toDouble / c))
            else lo
          }
        }
        assert(got(p) == want, s"trial $trial bins=$bins p=$p: ${got(p)} vs $want")
      }
    }
  }

  test("fuzz: kaplanMeier replays the product-limit under random censoring") {
    val rng = new scala.util.Random(412)
    for (trial <- 1 to 6) {
      val subj = (1 to 30 + rng.nextInt(150)).map { _ =>
        ("c", (rng.nextInt(20) + 1).toLong, rng.nextInt(2).toLong)
      }
      val got = FunnelOps.kaplanMeier(subj.toDF("g", "dur", "ev"), Seq("g"), "dur", "ev")
        .collect().map(r => r.getLong(1) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
      val byT = subj.groupBy(_._2).map { case (t, xs) =>
        t -> (xs.count(_._3 == 1L).toLong, xs.count(_._3 == 0L).toLong)
      }
      val times = byT.keys.toSeq.sorted
      var atRisk = subj.size.toLong
      var surv = 1.0
      for (t <- times) {
        val (d, c) = byT(t)
        val factor = snap9((atRisk - d).toDouble / atRisk)
        surv = snap9(surv * factor)
        assert(got(t) == ((atRisk, d, c, surv)), s"trial $trial t=$t: ${got(t)}")
        atRisk -= d + c
      }
    }
  }

  test("fuzz: abTest z/p match the pooled-variance replay") {
    val rng = new scala.util.Random(413)
    for (trial <- 1 to 6) {
      val nA = 20 + rng.nextInt(300); val nB = 20 + rng.nextInt(300)
      val xA = rng.nextInt(nA + 1); val xB = rng.nextInt(nB + 1)
      val subj = (1 to nA).map(i => ("g", "A", if (i <= xA) 1 else 0)) ++
        (1 to nB).map(i => ("g", "B", if (i <= xB) 1 else 0))
      val r = EvalOps.abTest(subj.toDF("g", "variant", "conv"),
        Seq("g"), "variant", "conv", "A", "B").collect().head
      val pool = snap9((xA + xB).toDouble / (nA + nB))
      if (pool > 0 && pool < 1) {
        val pA = snap9(xA.toDouble / nA); val pB = snap9(xB.toDouble / nB)
        val se = math.sqrt(pool * (1.0 - pool) * (1.0 / nA + 1.0 / nB))
        val z = snap9((pB - pA) / se)
        assert(r.getDouble(8) == z, s"trial $trial: z ${r.getDouble(8)} vs $z")
        assert(r.getDouble(9) >= 0 && r.getDouble(9) <= 1.0000001)
      } else assert(r.isNullAt(8), s"trial $trial degenerate pool must null z")
    }
  }

  test("fuzz: degreeAssortativity matches the direct Pearson on random graphs") {
    val rng = new scala.util.Random(414)
    for (trial <- 1 to 5) {
      val n = 10 + rng.nextInt(40)
      val edges = (1 to 60 + rng.nextInt(200)).map { _ =>
        (rng.nextInt(n).toString, rng.nextInt(n).toString)
      }.filter(e => e._1 != e._2)
      val got = GraphOps.degreeAssortativity(edges.toDF("src", "dst")).collect().head
      val deg = (edges.map(_._1) ++ edges.map(_._2)).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val pairs = edges.flatMap { case (a, b) =>
        Seq((deg(a), deg(b)), (deg(b), deg(a))) }
      val np = pairs.size.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sx2 = pairs.map(p => p._1 * p._1).sum; val sy2 = pairs.map(p => p._2 * p._2).sum
      val vx = np.toDouble * sx2 - sx.toDouble * sx
      val vy = np.toDouble * sy2 - sy.toDouble * sy
      assert(got.getLong(0) == np)
      if (np > 0 && vx > 0 && vy > 0) {
        val want = snap9((np.toDouble * sxy - sx.toDouble * sy) /
          (math.sqrt(vx) * math.sqrt(vy)))
        assert(got.getDouble(1) == want, s"trial $trial: ${got.getDouble(1)} vs $want")
      } else assert(got.isNullAt(1))
    }
  }

  test("fuzz: ndcgAtK matches the fold replay at random k and relevance") {
    val rng = new scala.util.Random(415)
    val ln2 = math.log(2.0)
    for (trial <- 1 to 6) {
      val k = 1 + rng.nextInt(15)
      val items = (1 to 5 + rng.nextInt(40)).map(i => ("q", i, rng.nextInt(4).toDouble))
      val r = EvalOps.ndcgAtK(items.toDF("g", "pos", "rel"), Seq("g"), Seq("pos"), "rel", k)
        .collect().head
      val given = items.sortBy(_._2).map(_._3)
      val ideal = items.sortBy(x => (-x._3, x._2)).map(_._3)
      def dcg(rels: Seq[Double]) = snap9(
        rels.take(k).zipWithIndex.map { case (rel, i) =>
          rel / (math.log(i + 2.0) / ln2) }.sum)
      val (d, id) = (dcg(given), dcg(ideal))
      assert(r.getDouble(2) == d && r.getDouble(3) == id,
        s"trial $trial: (${r.getDouble(2)}, ${r.getDouble(3)}) vs ($d, $id)")
      if (id > 0) assert(r.getDouble(4) == snap9(d / id)) else assert(r.isNullAt(4))
    }
  }

  test("fuzz: itemCosineSimilarity matches brute force on random baskets") {
    val rng = new scala.util.Random(416)
    for (trial <- 1 to 5) {
      val minCo = 1L + rng.nextInt(3)
      val rows = (1 to 150 + rng.nextInt(300)).map { _ =>
        (rng.nextInt(40).toLong, rng.nextInt(15).toLong)
      }
      val got = MiningOps.itemCosineSimilarity(rows.toDF("b", "i"), "b", "i", minCo)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
      val sets = rows.distinct.groupBy(_._2).map { case (i, xs) => i -> xs.map(_._1).toSet }
      val items = sets.keys.toSeq.sorted
      val want = (for {
        a <- items; b <- items if a < b
        co = (sets(a) intersect sets(b)).size.toLong if co >= minCo
      } yield (a, b) -> (sets(a).size.toLong, sets(b).size.toLong, co,
        snap9(co.toDouble / math.sqrt(sets(a).size.toDouble * sets(b).size)))).toMap
      assert(got == want, s"trial $trial minCo=$minCo: ${got.size} vs ${want.size} pairs")
    }
  }

  test("fuzz: doubleEwmaForecast replays at random lambda/horizon") {
    val rng = new scala.util.Random(417)
    for (trial <- 1 to 5) {
      val lambda = 0.05 + rng.nextDouble() * 0.9
      val horizon = 1 + rng.nextInt(10)
      val xs = (1 to 10 + rng.nextInt(60)).map(_ => rng.nextDouble() * 200 - 50)
      val got = DriftOps.doubleEwmaForecast(
        xs.zipWithIndex.map { case (v, i) => ("k", i, v) }.toDF("k", "i", "v"),
        Seq("k"), Seq("i"), "v", lambda, horizon)
        .orderBy("i").select("forecast").as[Double].collect()
      var b1 = 0.0; var w1 = 1.0; var b2 = 0.0; var w2 = 1.0
      xs.zipWithIndex.foreach { case (v, i) =>
        b1 = snap9(lambda * v + (1.0 - lambda) * b1); w1 *= (1.0 - lambda)
        val s1 = snap9(b1 / (1.0 - w1))
        b2 = snap9(lambda * s1 + (1.0 - lambda) * b2); w2 *= (1.0 - lambda)
        val s2 = snap9(b2 / (1.0 - w2))
        val level = snap9(2.0 * s1 - s2)
        val trend = snap9(lambda / (1.0 - lambda) * (s1 - s2))
        val want = snap9(level + horizon.toDouble * trend)
        assert(got(i) == want, s"trial $trial λ=$lambda h=$horizon row $i: ${got(i)} vs $want")
      }
    }
  }
}
