package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 wave-11/12 fuzz: randomized-parameter replays for the
  * temporal split, seasonal decomposition, power-law fit, Spearman
  * matrix, PR curve, OHLC bars and the Moro-probit INT. Fixed
  * seeds, independent plain-Scala replays.
  */
class OracleFuzz6Spec extends SparkSpec {
  import spark.implicits._

  private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
  private def ts(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)

  test("fuzz: temporalSplit cutoff replays the type-7 percentile at random fractions") {
    val rng = new scala.util.Random(611)
    for (trial <- 1 to 6) {
      val f = 0.05 + rng.nextDouble() * 0.9
      val gran = 1L + rng.nextInt(90)
      val rows = (1L to (20 + rng.nextInt(200)).toLong).map(i => (i, ts(rng.nextInt(1000000).toLong * 1000L)))
      val got = SplitOps.temporalSplit(rows.toDF("id", "ts"), "ts", f,
          granularitySeconds = gran)
        .collect().map(x => x.getLong(0) -> x.getString(2)).toMap
      def bucketOf(t: java.sql.Timestamp): Double =
        Math.floorDiv(t.getTime * 1000L, 1000000L * gran).toDouble
      // type-7 quantile over the DISTINCT-bucket frame with counts
      val all = rows.map(r => bucketOf(r._2)).sorted
      val h = (all.size - 1) * (1.0 - f)
      val lo = all(h.toInt)
      val cut = if (h.toInt + 1 < all.size)
        lo + (h - h.floor) * (all(h.toInt + 1) - lo) else lo
      rows.foreach { case (id, t) =>
        val want = if (bucketOf(t) <= cut) "train" else "test"
        assert(got(id) == want, s"trial $trial f=$f gran=$gran id=$id")
      }
    }
  }

  test("fuzz: seasonalDecompose replays at random season lengths") {
    val rng = new scala.util.Random(612)
    for (trial <- 1 to 5) {
      val m = 2 + rng.nextInt(6)
      val h = m / 2
      val xs = (0 until 20 + rng.nextInt(40)).map(_ => rng.nextDouble() * 50)
      val got = DriftOps.seasonalDecompose(
        xs.zipWithIndex.map { case (v, i) => ("k", i, v) }.toDF("k", "i", "v"),
        Seq("k"), Seq("i"), "v", m)
        .collect().map(r => r.getAs[Int]("i") ->
          (r.getAs[Int]("phase"), Option(r.getAs[Any]("trend")).map(_.asInstanceOf[Double]),
            Option(r.getAs[Any]("seasonal")).map(_.asInstanceOf[Double]))).toMap
      val n = xs.size
      val trend = xs.indices.map { i =>
        if (i - h >= 0 && i + h < n) Some(snap9(xs.slice(i - h, i + h + 1).sum / (2 * h + 1)))
        else None
      }
      val detr = xs.indices.map(i => trend(i).map(t => xs(i) - t))
      // integer nano-sum phase means (the sf1 half-grid fix): exact
      // long sums, correctly rounded quotient, floor(+0.5) to nanos
      def nanoMean(nanos: Seq[Long]): Double =
        math.floor(nanos.sum.toDouble / nanos.size + 0.5) / 1e9
      val raw = (0 until m).map { p =>
        val vs = xs.indices.filter(i => i % m == p).flatMap(detr)
          .map(d => math.floor(d * 1e9 + 0.5).toLong)
        p -> (if (vs.nonEmpty) Some(nanoMean(vs)) else None)
      }.toMap
      val present = raw.values.flatten.toSeq
      val adj = nanoMean(present.map(r0 => math.floor(r0 * 1e9 + 0.5).toLong))
      xs.indices.foreach { i =>
        val (p, t, s) = got(i)
        assert(p == i % m && t == trend(i), s"trial $trial m=$m i=$i trend")
        assert(s == raw(p).map(r0 => snap9(r0 - adj)), s"trial $trial m=$m i=$i seasonal")
      }
    }
  }

  test("fuzz: degreePowerLaw matches the direct MLE on random graphs") {
    val rng = new scala.util.Random(613)
    for (trial <- 1 to 6) {
      val dMin = 1L + rng.nextInt(3)
      val n = 8 + rng.nextInt(30)
      val edges = (1 to 30 + rng.nextInt(120)).map(_ =>
        (rng.nextInt(n).toString, rng.nextInt(n).toString)).filter(e => e._1 != e._2)
      val got = GraphOps.degreePowerLaw(edges.toDF("src", "dst"), dMin).collect().head
      val undirected = edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }.distinct
      val deg = (undirected.map(_._1) ++ undirected.map(_._2))
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val tail = deg.values.filter(_ >= dMin).toSeq
      assert(got.getLong(0) == deg.size && got.getLong(1) == tail.size)
      if (tail.size >= 2) {
        val lnsum = tail.map(d => snap9(math.log(d.toDouble / (dMin - 0.5)))).sum
        assert(got.getDouble(3) == snap9(1.0 + tail.size.toDouble / lnsum),
          s"trial $trial dMin=$dMin")
      } else assert(got.isNullAt(3))
    }
  }

  test("fuzz: spearmanMatrix equals the normalized-rank Pearson replay") {
    val rng = new scala.util.Random(614)
    for (trial <- 1 to 5) {
      val nEnt = 8 + rng.nextInt(20)
      val rows = (1 to nEnt).flatMap(e => Seq(
        (e.toLong, "x", (rng.nextInt(6) * 7).toDouble), // coarse → ties
        (e.toLong, "y", rng.nextDouble() * 100)))
      val got = StatsOps.spearmanMatrix(rows.toDF("e", "f", "v"), "e", "f", "v")
        .collect().head
      def normRanks(vs: Seq[Double]): Seq[Double] = {
        val sorted = vs.sorted
        vs.map { v =>
          val below = sorted.count(_ < v); val ties = sorted.count(_ == v)
          (below + 1 + (ties - 1) / 2.0) / vs.size
        }
      }
      val xs0 = rows.filter(_._2 == "x").sortBy(_._1).map(_._3)
      val ys0 = rows.filter(_._2 == "y").sortBy(_._1).map(_._3)
      val xs = normRanks(xs0); val ys = normRanks(ys0)
      val nn = xs.size.toDouble
      val mx = snap9(xs.sum / nn); val my = snap9(ys.sum / nn)
      val mxx = snap9(xs.map(a => a * a).sum / nn)
      val myy = snap9(ys.map(a => a * a).sum / nn)
      val mxy = snap9(xs.zip(ys).map(p => p._1 * p._2).sum / nn)
      val cov = snap9(mxy - mx * my)
      val vx = snap9(mxx - mx * mx); val vy = snap9(myy - my * my)
      if (vx > 0 && vy > 0)
        assert(math.abs(got.getDouble(3) - snap9(cov / math.sqrt(vx * vy))) <= 1e-9,
          s"trial $trial: ${got.getDouble(3)}")
      else assert(got.isNullAt(3))
    }
  }

  test("fuzz: inverseNormalTransform replays the Moro probit locally") {
    def probit(u: Double): Double = {
      val A = NormalizeOps.MoroA; val B = NormalizeOps.MoroB; val C = NormalizeOps.MoroC
      def horner(cs: Seq[Double], x: Double): Double =
        cs.init.foldRight(cs.last)((c, acc) => c + x * acc)
      val y = u - 0.5
      if (math.abs(y) <= 0.42) { val r = y * y; y * horner(A, r) / (1.0 + r * horner(B, r)) }
      else {
        val r = if (y > 0) 1.0 - u else u
        val t = horner(C, math.log(-math.log(r)))
        if (y >= 0) t else -t
      }
    }
    val rng = new scala.util.Random(615)
    for (trial <- 1 to 5) {
      val vs = (1 to 30 + rng.nextInt(100)).map(_ => (rng.nextInt(20) * 3).toDouble)
      val got = NormalizeOps.inverseNormalTransform(
        vs.zipWithIndex.map { case (v, i) => (i, "f", v) }.toDF("i", "f", "v"),
        "f", "v")
        .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
      val sorted = vs.sorted
      vs.zipWithIndex.foreach { case (v, i) =>
        val below = sorted.count(_ < v); val ties = sorted.count(_ == v)
        val rAvg = below + 1 + (ties - 1) / 2.0
        val p = (rAvg - 0.375) / (vs.size + 0.25)
        assert(got(i) == snap9(probit(p)), s"trial $trial i=$i v=$v")
      }
    }
  }

  test("fuzz: ohlcBars replays open/high/low/close at random bucket widths") {
    val rng = new scala.util.Random(616)
    for (trial <- 1 to 5) {
      val bucket = (1 + rng.nextInt(120)) * 60L
      val rows = (1 to 80 + rng.nextInt(200)).map(i =>
        (1L, ts(rng.nextInt(500000).toLong * 1000L), i.toLong, rng.nextDouble() * 100))
      val got = SequenceOps.ohlcBars(rows.toDF("k", "ts", "eid", "v"),
        Seq("k"), "ts", Seq("ts", "eid"), "v", bucket)
        .collect().map(r => r.getTimestamp(1).getTime ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
      rows.groupBy(r => (r._2.getTime / 1000) / bucket).foreach { case (b, xs) =>
        val o = xs.sortBy(r => (r._2.getTime, r._3)).head._4
        val c = xs.sortBy(r => (r._2.getTime, r._3)).last._4
        val want = (xs.size.toLong, o, xs.map(_._4).max, xs.map(_._4).min, c)
        assert(got(b * bucket * 1000L) == want, s"trial $trial bucket=$bucket b=$b")
      }
    }
  }
}
