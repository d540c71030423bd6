package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 extension of [[OracleFuzzSpec]]: randomized-parameter
  * replays for the eval/trend/mining/containment operator families
  * added this round. Same discipline — random inputs AND random
  * params per trial, checked against an independent plain-Scala
  * replay on the collected input; fixed seeds.
  */
class OracleFuzz2Spec extends SparkSpec {
  import spark.implicits._

  test("fuzz: auc matches the brute-force pair count under random ties and groups") {
    val rng = new scala.util.Random(211)
    for (trial <- 1 to 6) {
      val nGroups = 1 + rng.nextInt(3)
      val nLevels = 2 + rng.nextInt(30) // coarse scores force ties
      val rows = (0 until 100 + rng.nextInt(300)).map { _ =>
        ("g" + rng.nextInt(nGroups), rng.nextInt(2), rng.nextInt(nLevels).toDouble)
      }
      val got = EvalOps.auc(rows.toDF("grp", "y", "s"), "y", "s", Seq("grp"))
        .collect().map(r => r.getString(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      rows.groupBy(_._1).foreach { case (g, xs) =>
        val pos = xs.filter(_._2 == 1).map(_._3)
        val neg = xs.filter(_._2 == 0).map(_._3)
        if (pos.isEmpty || neg.isEmpty) assert(got(g).isEmpty, s"trial $trial $g")
        else {
          val wins = (for (p <- pos; n <- neg)
            yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
          val want = wins / (pos.size.toDouble * neg.size)
          assert(math.abs(got(g).get - want) < 1e-8, s"trial $trial $g: ${got(g).get} vs $want")
        }
      }
    }
  }

  test("fuzz: confusionMetrics counts match local replay at random thresholds") {
    val rng = new scala.util.Random(212)
    for (trial <- 1 to 6) {
      val thr = rng.nextDouble() * 10
      val rows = (0 until 100 + rng.nextInt(200)).map { _ =>
        (rng.nextInt(2), rng.nextDouble() * 10)
      }
      val r = EvalOps.confusionMetrics(rows.toDF("y", "s"), "y", "s", thr).head()
      val tp = rows.count(x => x._1 == 1 && x._2 >= thr).toLong
      val fp = rows.count(x => x._1 == 0 && x._2 >= thr).toLong
      val tn = rows.count(x => x._1 == 0 && x._2 < thr).toLong
      val fn = rows.count(x => x._1 == 1 && x._2 < thr).toLong
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((tp, fp, tn, fn)),
        s"trial $trial thr=$thr")
    }
  }

  test("fuzz: cohenKappa matches the closed form on random contingency tables") {
    val rng = new scala.util.Random(213)
    for (trial <- 1 to 6) {
      val cats = Seq("x", "y", "z", "w").take(2 + rng.nextInt(3))
      val rows = (0 until 80 + rng.nextInt(200)).map { _ =>
        (cats(rng.nextInt(cats.size)), cats(rng.nextInt(cats.size)))
      }
      val r = EvalOps.cohenKappa(rows.toDF("a", "b"), "a", "b").head()
      val n = rows.size.toDouble
      def snap(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
      val po = snap(rows.count(x => x._1 == x._2) / n)
      val pe = snap(cats.map(k => rows.count(_._1 == k).toDouble * rows.count(_._2 == k)).sum / (n * n))
      val want = if (pe < 1.0) Some(snap((po - pe) / (1 - pe))) else None
      val gotK = if (r.isNullAt(3)) None else Some(r.getDouble(3))
      assert(gotK == want, s"trial $trial: $gotK vs $want")
    }
  }

  test("fuzz: linearTrend recovers noiseless lines at random scales and offsets") {
    val rng = new scala.util.Random(214)
    for (trial <- 1 to 6) {
      val slope = (rng.nextDouble() - 0.5) * math.pow(10, rng.nextInt(3))
      val icept = (rng.nextDouble() - 0.5) * 100
      val x0 = rng.nextDouble() * math.pow(10, 2 + rng.nextInt(4))
      val rows = (0 until 20 + rng.nextInt(80)).map { i =>
        val x = x0 + i * (0.5 + rng.nextDouble())
        ("g", x, slope * x + icept)
      }
      val r = StatsOps.linearTrend(rows.toDF("g", "x", "y"), Seq("g"), "x", "y").head()
      assert(math.abs(r.getDouble(2) - slope) < math.max(1e-6, math.abs(slope) * 1e-5),
        s"trial $trial slope ${r.getDouble(2)} vs $slope")
      assert(math.abs(r.getDouble(4) - 1.0) < 1e-6, s"trial $trial r2 ${r.getDouble(4)}")
    }
  }

  test("fuzz: associationRules supports and confidence match a local replay") {
    val rng = new scala.util.Random(215)
    for (trial <- 1 to 5) {
      val nItems = 4 + rng.nextInt(8)
      val baskets = (0 until 30 + rng.nextInt(50)).map { b =>
        b.toString -> (0 until 1 + rng.nextInt(5)).map(_ => rng.nextInt(nItems).toLong).distinct
      }
      val rows = baskets.flatMap { case (b, is) => is.map(b -> _) }
      val minSupp = 1L + rng.nextInt(3)
      val got = MiningOps.associationRules(rows.toDF("b", "i"), "b", "i",
          minSupport = minSupp, minConfidence = 0.01)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(5))).toMap
      val supp = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val pairCount = baskets.flatMap { case (_, is) =>
        for (a <- is; bb <- is if a < bb) yield (a, bb)
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      def snap(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
      for (((a, b), c) <- pairCount if c >= minSupp) {
        val confAB = snap(c.toDouble / supp(a))
        if (confAB >= 0.01)
          assert(got((a, b)) == ((c, confAB)), s"trial $trial ($a,$b): ${got.get((a, b))} vs ($c,$confAB)")
      }
      // nothing extra emitted
      got.keys.foreach { case (a, b) =>
        val key = if (a < b) (a, b) else (b, a)
        assert(pairCount(key) >= minSupp, s"trial $trial spurious rule ($a,$b)")
      }
    }
  }

  test("fuzz: containmentPairs finds exactly the local exact-containment pairs") {
    val rng = new scala.util.Random(216)
    for (trial <- 1 to 5) {
      val vocab = (0 until 40).map(i => s"w$i")
      val thr = 0.6 + rng.nextDouble() * 0.35
      val docs = (0 until 20 + rng.nextInt(20)).map { i =>
        val len = 5 + rng.nextInt(30)
        (i.toLong, (0 until len).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      val got = DedupOps.containmentPairs(docs.toDF("id", "body"), "id", "body", 3, thr)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      // local replay with string 3-gram sets
      def shingles(s: String): Set[String] = {
        val t = s.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
        if (t.length >= 3) t.sliding(3).map(_.mkString(" ")).toSet
        else if (t.nonEmpty) Set(t.mkString(" ")) else Set.empty
      }
      val sh = docs.map { case (id, s) => id -> shingles(s) }.filter(_._2.nonEmpty)
      val want = (for {
        (ia, sa) <- sh; (ib, sb) <- sh
        if (sa.size < sb.size || (sa.size == sb.size && ia < ib))
        if sa.intersect(sb).size.toDouble / sa.size >= thr
      } yield (ia, ib)).toSet
      assert(got == want, s"trial $trial thr=$thr: extra=${got -- want} missing=${want -- got}")
    }
  }

  test("fuzz: momentsProfile matches local central moments at random scales") {
    val rng = new scala.util.Random(217)
    for (trial <- 1 to 6) {
      val scale = math.pow(10, rng.nextInt(4))
      val vals = (0 until 50 + rng.nextInt(150)).map(_ => rng.nextDouble() * scale)
      val r = StatsOps.momentsProfile(vals.map(("g", _)).toDF("g", "v"), Seq("g"), "v").head()
      val n = vals.size.toDouble
      val m = vals.sum / n
      val m2 = vals.map(v => (v - m) * (v - m)).sum / n
      val m3 = vals.map(v => math.pow(v - m, 3)).sum / n
      val m4 = vals.map(v => math.pow(v - m, 4)).sum / n
      assert(math.abs(r.getDouble(2) - m) < 1e-5 * math.max(1, m), s"trial $trial mean")
      assert(math.abs(r.getDouble(3) - m2) < 1e-4 * math.max(1, m2), s"trial $trial var")
      assert(math.abs(r.getDouble(4) - m3 / math.pow(m2, 1.5)) < 1e-3, s"trial $trial skew")
      assert(math.abs(r.getDouble(5) - (m4 / (m2 * m2) - 3)) < 1e-3, s"trial $trial kurt")
    }
  }

  test("fuzz: histogram counts match local binning at random ranges") {
    val rng = new scala.util.Random(218)
    for (trial <- 1 to 6) {
      val lo = rng.nextDouble() * 100 - 50
      val hi = lo + 1 + rng.nextDouble() * 200
      val bins = 2 + rng.nextInt(30)
      val vals = (0 until 100 + rng.nextInt(300)).map(_ => rng.nextDouble() * 400 - 100)
      val got = StatsOps.histogram(vals.map(("g", _)).toDF("g", "v"), Seq("g"), "v", lo, hi, bins)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      val width = (hi - lo) / bins
      val want = vals.groupBy(v =>
          math.min(math.max(math.floor((v - lo) / width), 0), bins - 1).toLong)
        .view.mapValues(_.size.toLong).toMap
      assert(got == want, s"trial $trial [$lo,$hi]x$bins")
    }
  }

  test("fuzz: multiSplitWith fractions hold exactly on a full bucket sweep") {
    val rng = new scala.util.Random(219)
    for (trial <- 1 to 5) {
      val f1 = 0.1 + rng.nextInt(6) * 0.1
      val f2 = (1.0 - f1) * (0.2 + rng.nextDouble() * 0.5)
      val f2r = math.floor(f2 * 100) / 100
      val f3 = 1.0 - f1 - f2r
      val df = (0L until 10000L).map(Tuple1(_)).toDF("id")
      val out = SplitOps.multiSplitWith(df, col("id"),
          Seq("a" -> f1, "b" -> f2r, "c" -> f3))
        .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val c1 = (f1 * 10000).toInt
      val c2 = (f2r * 10000).toInt
      assert(out("a") == c1.toLong && out("b") == c2.toLong && out("c") == (10000L - c1 - c2),
        s"trial $trial $f1/$f2r/$f3: $out")
    }
  }
}
