package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 wave-7..10 fuzz: randomized-parameter replays for
  * attribution, active users, Holt-Winters, n-gram P/R/F1,
  * period-over-period, snapshot diff and golden record. Same
  * discipline as [[OracleFuzzSpec]]: random inputs AND params per
  * trial vs an independent plain-Scala replay; fixed seeds.
  */
class OracleFuzz5Spec extends SparkSpec {
  import spark.implicits._

  private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
  private def ts(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)

  test("fuzz: attribution credits replay at random lookbacks") {
    val rng = new scala.util.Random(511)
    for (trial <- 1 to 5) {
      val lookback = (1 + rng.nextInt(48)) * 3600L
      val events = (1 to 200 + rng.nextInt(200)).map { i =>
        val u = rng.nextInt(10).toLong
        val typ = Seq("view", "click", "buy")(rng.nextInt(3))
        (u, ts(rng.nextInt(100) * 3600000L), i.toLong, typ)
      }
      val got = FunnelOps.attribution(events.toDF("u", "ts", "eid", "typ"),
        "u", "ts", "eid", "typ", "buy", Seq("view", "click"), lookback)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
      // replay
      val convs = events.filter(_._4 == "buy")
      val touches = events.filter(e => e._4 == "view" || e._4 == "click")
      val credits = convs.flatMap { case (u, cts, cid, _) =>
        val ws = touches.filter { case (tu, tts, _, _) =>
          tu == u && tts.getTime <= cts.getTime &&
            tts.getTime >= cts.getTime - lookback * 1000L }
          .sortBy(t => (t._2.getTime, t._3))
        if (ws.isEmpty) Nil
        else {
          val n = ws.size
          ws.zipWithIndex.map { case ((_, _, tid, ch), i) =>
            (cid, ch, i == 0, i == n - 1, snap9(1.0 / n)) }
        }
      }
      val want = credits.groupBy(_._2).map { case (ch, xs) =>
        ch -> (xs.map(_._1).distinct.size.toLong, xs.size.toLong,
          xs.count(_._3).toLong, xs.count(_._4).toLong,
          snap9(xs.map(_._5).sum)) }
      assert(got == want, s"trial $trial lookback=$lookback: $got vs $want")
    }
  }

  test("fuzz: activeUsers replays at random windows") {
    val rng = new scala.util.Random(512)
    for (trial <- 1 to 5) {
      val w2 = 2 + rng.nextInt(10)
      val rows = (1 to 100 + rng.nextInt(200)).map { _ =>
        (rng.nextInt(20).toLong, ts(rng.nextInt(20) * 86400000L + rng.nextInt(86400000)))
      }
      val got = SequenceOps.activeUsers(rows.toDF("u", "ts"), "u", "ts", Seq(1, w2))
        .collect().map(r => r.getDate(0).toString ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      val ud = rows.map { case (u, t) => (u, t.toLocalDateTime.toLocalDate) }.distinct
      val days = ud.map(_._2).distinct
      val want = days.map { d =>
        val au1 = ud.count(_._2 == d).toLong
        val auW = ud.filter { case (_, ad) =>
          !ad.isAfter(d) && ad.isAfter(d.minusDays(w2)) }.map(_._1).distinct.size.toLong
        d.toString -> (au1, auW, snap9(au1.toDouble / auW))
      }.toMap
      assert(got == want, s"trial $trial w=$w2")
    }
  }

  test("fuzz: holtWinters replays at random season length and exact-binary weights") {
    val rng = new scala.util.Random(513)
    for (trial <- 1 to 5) {
      val m = 2 + rng.nextInt(6)
      val a = Seq(0.5, 0.25, 0.75)(rng.nextInt(3))
      val b = Seq(0.25, 0.125, 0.5)(rng.nextInt(3))
      val g = Seq(0.125, 0.25, 0.0625)(rng.nextInt(3))
      val xs = (1 to 20 + rng.nextInt(40)).map(_ => rng.nextDouble() * 100)
      val got = DriftOps.holtWinters(
        xs.zipWithIndex.map { case (v, i) => ("k", i, v) }.toDF("k", "i", "v"),
        Seq("k"), Seq("i"), "v", m, a, b, g)
        .orderBy("i").select("level", "trend", "seasonal", "forecast").collect()
      var init = false; var l = 0.0; var tr = 0.0; var i = 0L
      val s = Array.fill(m)(0.0)
      xs.zipWithIndex.foreach { case (x, row) =>
        val idx = (i % m).toInt; i += 1
        if (!init) {
          init = true; l = x; tr = 0.0
          assert(got(row).getDouble(0) == x && got(row).isNullAt(3))
        } else {
          val sHat = s(idx)
          val fc = snap9(l + tr + sHat)
          val lN = snap9(a * (x - sHat) + (1.0 - a) * (l + tr))
          tr = snap9(b * (lN - l) + (1.0 - b) * tr)
          s(idx) = snap9(g * (x - lN) + (1.0 - g) * sHat)
          l = lN
          assert(got(row).getDouble(0) == l && got(row).getDouble(1) == tr &&
            got(row).getDouble(2) == s(idx) && got(row).getDouble(3) == fc,
            s"trial $trial m=$m row $row")
        }
      }
    }
  }

  test("fuzz: ngramPrf replays at random n over random token streams") {
    val rng = new scala.util.Random(514)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    for (trial <- 1 to 6) {
      val n = 1 + rng.nextInt(3)
      def text() = (1 to 3 + rng.nextInt(15)).map(_ => vocab(rng.nextInt(5))).mkString(" ")
      val pairs = (1L to 10L).map(id => (id, text(), text()))
      val got = EvalOps.ngramPrf(pairs.toDF("id", "c", "r"), "id", "c", "r", n)
        .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
      def grams(t: String): Seq[String] = {
        val toks = t.split(" ").toSeq
        if (toks.size < n) Nil else toks.sliding(n).map(_.mkString(" ")).toSeq
      }
      pairs.foreach { case (id, c, r) =>
        val gc = grams(c).groupBy(identity).view.mapValues(_.size).toMap
        val gr = grams(r).groupBy(identity).view.mapValues(_.size).toMap
        val overlap = gc.map { case (g, cc) => math.min(cc, gr.getOrElse(g, 0)) }.sum
        assert(got(id) == ((gc.values.sum.toLong, gr.values.sum.toLong, overlap.toLong)),
          s"trial $trial n=$n id=$id")
      }
    }
  }

  test("fuzz: snapshotDiff statuses replay on random mutations") {
    val rng = new scala.util.Random(515)
    for (trial <- 1 to 5) {
      val oldRows = (1L to 50L).map(k => (k, rng.nextInt(5).toDouble, rng.nextInt(3).toString))
      val newRows = oldRows.collect {
        case (k, v, s) if rng.nextDouble() > 0.2 =>
          if (rng.nextDouble() < 0.3) (k, v + 1.0, s)
          else if (rng.nextDouble() < 0.2) (k, v, s + "x")
          else (k, v, s)
      } ++ (51L to 55L).map(k => (k, 0.0, "n"))
      val got = MergeOps.snapshotDiff(oldRows.toDF("k", "v", "s"),
        newRows.toDF("k", "v", "s"), Seq("k"), Seq("s", "v"))
        .collect().map(x => x.getLong(0) -> (x.getString(1), Option(x.getString(2)))).toMap
      val om = oldRows.map(r => r._1 -> r).toMap
      val nm = newRows.map(r => r._1 -> r).toMap
      (om.keySet ++ nm.keySet).foreach { k =>
        (om.get(k), nm.get(k)) match {
          case (Some(_), None) => assert(got(k)._1 == "removed")
          case (None, Some(_)) => assert(got(k)._1 == "added")
          case (Some(o), Some(n)) =>
            val ch = Seq("s" -> (o._3 != n._3), "v" -> (o._2 != n._2))
              .collect { case (c, true) => c }
            if (ch.isEmpty) assert(!got.contains(k))
            else assert(got(k) == (("changed", Some(ch.mkString(",")))), s"k=$k")
          case _ => fail()
        }
      }
    }
  }

  test("fuzz: goldenRecord picks the latest non-null under random null patterns") {
    val rng = new scala.util.Random(516)
    for (trial <- 1 to 5) {
      val rows = (1 to 100).map { i =>
        (rng.nextInt(10).toLong, i.toLong,
          if (rng.nextDouble() < 0.4) None else Some(rng.nextInt(100).toDouble))
      }
      val got = MergeOps.goldenRecord(rows.toDF("c", "ver", "v"), "c", Seq("ver"), Seq("v"))
        .collect().map(x => x.getLong(0) ->
          (x.getLong(1), if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toMap
      rows.groupBy(_._1).foreach { case (c, xs) =>
        val want = xs.filter(_._3.isDefined).sortBy(_._2).lastOption.flatMap(_._3)
        assert(got(c) == ((xs.size.toLong, want)), s"trial $trial cluster $c")
      }
    }
  }

  test("fuzz: periodOverPeriod day-granularity replay") {
    val rng = new scala.util.Random(517)
    for (trial <- 1 to 4) {
      val rows = (1 to 100 + rng.nextInt(100)).map { _ =>
        ("k", ts(rng.nextInt(15) * 86400000L + 3600000L), rng.nextDouble() * 10)
      }
      val got = SequenceOps.periodOverPeriod(rows.toDF("k", "ts", "v"),
        Seq("k"), "ts", "v", "day")
        .collect().map(r => r.getDate(1).toString ->
          (r.getLong(2), r.getDouble(3), if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap
      val byDay = rows.groupBy(_._2.toLocalDateTime.toLocalDate).toSeq.sortBy(_._1.toString)
      byDay.zipWithIndex.foreach { case ((d, xs), i) =>
        val total = snap9(xs.map(_._3).sum)
        val (n, t, delta) = got(d.toString)
        assert(n == xs.size.toLong && math.abs(t - total) < 2e-9, s"trial $trial day $d")
        if (i > 0) {
          val prev = snap9(byDay(i - 1)._2.map(_._3).sum)
          assert(delta.isDefined && math.abs(delta.get - snap9(t - prev)) < 2e-9)
        } else assert(delta.isEmpty)
      }
    }
  }
}
