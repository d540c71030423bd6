package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized-parameter oracle fuzzing for the closed-form
  * operators: every trial draws random inputs AND random operator
  * params (thresholds, shingle sizes, bin widths, fractions, seeds)
  * and checks the distributed result against an independent local
  * replay computed with plain Scala on the collected input — the
  * parameter-space edges fixed fixtures never reach. Seeds are
  * fixed so failures reproduce.
  */
class OracleFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("fuzz: TSS / CLR / z-score / min-max match local replays under random data and groups") {
    val rng = new scala.util.Random(101)
    for (trial <- 1 to 8) {
      val nGroups = 1 + rng.nextInt(6)
      val rows = (0 until 50 + rng.nextInt(200)).map { i =>
        ("g" + rng.nextInt(nGroups), i.toLong, math.abs(rng.nextGaussian()) * math.pow(10, rng.nextInt(4)) + 0.001)
      }
      val df = rows.toDF("grp", "id", "v")
      val tol = 1e-9

      val tss = NormalizeOps.tss(df, "grp", "v").select("grp", "id", "tss")
        .as[(String, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
      val sums = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      rows.foreach { case (g, id, v) =>
        assert(math.abs(tss((g, id)) - v / sums(g)) < tol, s"trial $trial tss ($g,$id)") }

      val pc = rng.nextDouble() * 0.5
      val clr = NormalizeOps.clr(df, "grp", "v", pseudocount = pc).select("grp", "id", "clr")
        .as[(String, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
      val logMeans = rows.groupBy(_._1).view
        .mapValues(xs => xs.map(x => math.log(x._3 + pc)).sum / xs.size).toMap
      rows.foreach { case (g, id, v) =>
        assert(math.abs(clr((g, id)) - (math.log(v + pc) - logMeans(g))) < tol, s"trial $trial clr ($g,$id)") }

      val z = NormalizeOps.zscore(df, "grp", "v").select("grp", "id", "zscore")
        .as[(String, Long, Option[Double])].collect().map(r => (r._1, r._2) -> r._3).toMap
      val stats = rows.groupBy(_._1).view.mapValues { xs =>
        val m = xs.map(_._3).sum / xs.size
        val sd = if (xs.size < 2) 0.0
          else math.sqrt(xs.map(x => (x._3 - m) * (x._3 - m)).sum / (xs.size - 1))
        (m, sd)
      }.toMap
      rows.foreach { case (g, id, v) =>
        val (m, sd) = stats(g)
        val expect = if (sd == 0.0) None else Some((v - m) / sd)
        (z((g, id)), expect) match {
          case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-6, s"trial $trial z ($g,$id)")
          case (a, b)             => assert(a.isEmpty == b.isEmpty, s"trial $trial z null ($g,$id)")
        }
      }

      val mm = NormalizeOps.minmax(df, "grp", "v").select("grp", "id", "minmax")
        .as[(String, Long, Option[Double])].collect().map(r => (r._1, r._2) -> r._3).toMap
      val ranges = rows.groupBy(_._1).view.mapValues(xs => (xs.map(_._3).min, xs.map(_._3).max)).toMap
      rows.foreach { case (g, id, v) =>
        val (lo, hi) = ranges(g)
        if (hi == lo) assert(mm((g, id)).isEmpty, s"trial $trial mm const ($g,$id)")
        else assert(math.abs(mm((g, id)).get - (v - lo) / (hi - lo)) < tol, s"trial $trial mm ($g,$id)")
      }
    }
  }

  test("fuzz: pointInInterval equals the local nested-loop join for random bin widths and intervals") {
    val rng = new scala.util.Random(103)
    for (trial <- 1 to 8) {
      val pts = (0 until 100 + rng.nextInt(300)).map(i => (i.toLong, rng.nextDouble() * 1000 - 200))
      val ivs = (0 until 1 + rng.nextInt(60)).map { j =>
        val lo = rng.nextDouble() * 1000 - 250
        (j.toLong, lo, lo + rng.nextDouble() * math.pow(10, rng.nextInt(3)))
      }
      val binWidth = 0.5 + rng.nextDouble() * 300
      val got = RangeJoinOps.pointInInterval(
          pts.toDF("p_id", "x"), "x", ivs.toDF("iv_id", "lo", "hi"), "lo", "hi",
          binWidth = binWidth, broadcastIntervals = rng.nextBoolean())
        .select("p_id", "iv_id").as[(Long, Long)].collect().sorted.toSeq
      val want = (for {
        (pid, x) <- pts
        (ivid, lo, hi) <- ivs
        if x >= lo && x <= hi
      } yield (pid, ivid)).sorted
      assert(got == want, s"trial $trial binWidth=$binWidth: ${got.size} vs ${want.size}")
    }
  }

  test("fuzz: split operators hold exact invariants for random fractions, k, and seeds") {
    val rng = new scala.util.Random(107)
    for (trial <- 1 to 8) {
      val labels = (0 until 2 + rng.nextInt(4)).map("l" + _)
      val rows = (0 until 100 + rng.nextInt(400)).map(i =>
        (i.toLong, labels(rng.nextInt(labels.size))))
      val df = rows.toDF("id", "label")
      val f = 0.05 + rng.nextDouble() * 0.9
      val seed = rng.nextLong()

      // train/test: exhaustive, disjoint, deterministic under the same seed
      val s1 = SplitOps.trainTestSplit(df, Seq("id"), f, seed).select("id", "split")
        .as[(Long, String)].collect().toMap
      val s2 = SplitOps.trainTestSplit(df, Seq("id"), f, seed).select("id", "split")
        .as[(Long, String)].collect().toMap
      assert(s1 == s2 && s1.size == rows.size && s1.values.forall(v => v == "train" || v == "test"),
        s"trial $trial trainTest determinism")

      // stratified: per-label test count is exactly floor(n * f)
      val strat = SplitOps.stratifiedSplit(df, "label", Seq("id"), f, seed)
        .groupBy("label").agg(sum(when(col("split") === "test", 1).otherwise(0)).as("t"),
          count(lit(1)).as("n"))
        .as[(String, Long, Long)].collect()
      strat.foreach { case (l, t, n) =>
        assert(t == math.floor(n * f).toLong, s"trial $trial strat $l: $t of $n at $f") }

      // k-fold: folds in [0,k), same key → same fold (duplicate keys planted)
      val k = 2 + rng.nextInt(8)
      val dup = df.union(df.limit(20))
      val folds = SplitOps.kFold(dup, Seq("id"), k, seed).select("id", "fold")
        .as[(Long, Int)].collect()
      assert(folds.forall(x => x._2 >= 0 && x._2 < k), s"trial $trial fold range")
      assert(folds.groupBy(_._1).forall(_._2.map(_._2).distinct.size == 1),
        s"trial $trial fold key-consistency")
    }
  }

  test("fuzz: prevalenceFilter(exact) matches the local replay for random thresholds") {
    val rng = new scala.util.Random(109)
    for (trial <- 1 to 8) {
      val nSamp = 5 + rng.nextInt(30)
      val nFeat = 3 + rng.nextInt(20)
      val rows = for {
        s <- 0 until nSamp; fIdx <- 0 until nFeat
        if rng.nextInt(3) > 0
      } yield (s.toLong, "f" + fIdx, if (rng.nextInt(4) == 0) 0.0 else rng.nextDouble())
      val minFrac = rng.nextDouble()
      val got = FilterOps.prevalenceFilter(rows.toDF("samp", "feat", "v"),
          "samp", "feat", "v", minFrac, exact = true)
        .select("samp", "feat").as[(Long, String)].collect().sorted.toSeq
      val observed = rows.filter(_._3 != 0.0)
      val total = observed.map(_._1).distinct.size
      val keptFeats = observed.groupBy(_._2).view
        .mapValues(_.map(_._1).distinct.size).toMap
        .filter { case (_, n) => n >= minFrac * math.max(total, 1) }.keySet
      val want = rows.collect { case (s, ft, _) if keptFeats(ft) => (s, ft) }.sorted
      assert(got == want, s"trial $trial minFrac=$minFrac: ${got.size} vs ${want.size}")
    }
  }

  test("fuzz: ngramJaccard and spanOverlapPairs equal brute-force local replays") {
    val rng = new scala.util.Random(113)
    def tokensOf(text: String): Seq[String] =
      text.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq
    for (trial <- 1 to 6) {
      val vocab = (0 until 6 + rng.nextInt(10)).map("w" + _)
      val docs = (0 until 40 + rng.nextInt(60)).map { i =>
        (i.toLong, (0 until 5 + rng.nextInt(8)).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")

      val n = 2 + rng.nextInt(2)
      val thr = 0.3 + rng.nextDouble() * 0.65
      val shingles = docs.map { case (id, t) =>
        id -> tokensOf(t).sliding(n).filter(_.size == n).map(_.mkString(" ")).toSet
      }.toMap
      val wantNg = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        sa = shingles(a); sb = shingles(b)
        if sa.nonEmpty && sb.nonEmpty
        j = (sa & sb).size.toDouble / (sa | sb).size
        if j >= thr
      } yield (a, b)).sorted
      val gotNg = DedupOps.ngramJaccard(df, "doc_id", "text", shingleSize = n,
          threshold = thr, orderByFrequency = rng.nextBoolean())
        .select("id_a", "id_b").as[(Long, Long)].collect()
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.sorted.toSeq
      assert(gotNg == wantNg, s"trial $trial ngram n=$n thr=$thr: ${gotNg.size} vs ${wantNg.size}")

      val k = 2 + rng.nextInt(4)
      val spans = docs.map { case (id, t) =>
        id -> tokensOf(t).sliding(k).filter(_.size == k).map(_.mkString(" ")).toSet
      }.toMap
      val wantSpan = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        if tokensOf(docs(a.toInt)._2).size >= k && tokensOf(docs(b.toInt)._2).size >= k
        if (spans(a) & spans(b)).nonEmpty
      } yield (a, b)).sorted
      val gotSpan = DedupOps.spanOverlapPairs(df, "doc_id", "text", k = k)
        .select("id_a", "id_b").as[(Long, Long)].collect()
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.sorted.toSeq
      assert(gotSpan == wantSpan, s"trial $trial span k=$k: ${gotSpan.size} vs ${wantSpan.size}")
    }
  }

  test("fuzz: bm25TopK matches a local BM25 replay for random corpora, queries, and k1/b") {
    val rng = new scala.util.Random(107)
    for (trial <- 1 to 6) {
      val vocab = (0 until 8 + rng.nextInt(12)).map("t" + _)
      val docs = (0 until 30 + rng.nextInt(70)).map { i =>
        (i.toLong, (0 until 3 + rng.nextInt(15)).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val query = rng.shuffle(vocab).take(1 + rng.nextInt(4))
      val k1 = 0.5 + rng.nextDouble() * 2
      val b = rng.nextDouble()
      val k = 1 + rng.nextInt(20)

      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      val nDocs = docs.size.toDouble
      val avgdl = toks.values.map(_.size).sum.toDouble / nDocs
      val qTerms = query.distinct
      val dfreq = qTerms.map(t => t -> toks.values.count(_.contains(t)).toDouble).toMap
      val want = docs.flatMap { case (id, _) =>
        val ts = toks(id)
        val s = qTerms.filter(t => ts.contains(t)).map { t =>
          val tf = ts.count(_ == t).toDouble
          val idf = math.log(1.0 + (nDocs - dfreq(t) + 0.5) / (dfreq(t) + 0.5))
          idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * ts.size / avgdl))
        }.sum
        if (s > 0.0) Some(id -> math.floor(s * 1e6 + 0.5) / 1e6) else None
      }.sortBy { case (id, s) => (-s, id) }.take(k)
      val got = RetrievalOps.bm25TopK(df, "text", "doc_id", query, k, k1, b)
        .select("doc_id", "score").as[(Long, Double)].collect().toSeq
      assert(got == want, s"trial $trial q=$query k1=$k1 b=$b k=$k: $got vs $want")
    }
  }

  test("fuzz: kmeans fitTransform matches a local Lloyd replay for random k, dim, iters") {
    val rng = new scala.util.Random(109)
    for (trial <- 1 to 5) {
      val dim = 2 + rng.nextInt(4)
      val n = 30 + rng.nextInt(60)
      val pts = (0 until n).map(i => (i.toLong, Array.fill(dim)(rng.nextGaussian() * 10)))
      val df = pts.map { case (id, v) => (id, v.toSeq) }.toDF("id", "vec")
      val k = 2 + rng.nextInt(6)
      val iters = rng.nextInt(4)

      def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
        var best = 0; var bd = Double.MaxValue
        for (c <- cs.indices) {
          var d = 0.0; var j = 0
          while (j < dim) { val t = v(j) - cs(c)(j); d += t * t; j += 1 }
          if (d < bd) { bd = d; best = c }
        }
        best
      }
      var cents = pts.sortBy(_._1).take(k).map(_._2.clone).toArray
      for (_ <- 1 to iters) {
        val groups = pts.groupBy(p => nearest(p._2, cents))
        val next = cents.map(_.clone)
        groups.foreach { case (c, ps) =>
          for (j <- 0 until dim) {
            val m = ps.map(_._2(j)).sum / ps.size
            next(c)(j) = math.floor(m * 1e9 + 0.5) / 1e9
          }
        }
        cents = next
      }
      val want = pts.map { case (id, v) =>
        val c = nearest(v, cents)
        var d = 0.0; var j = 0
        while (j < dim) { val t = v(j) - cents(c)(j); d += t * t; j += 1 }
        (id, c, math.floor(d * 1e6 + 0.5) / 1e6)
      }.sortBy(_._1)
      val got = KMeansOps.fitTransform(df, "vec", "id", k, iters)
        .select("id", "cluster", "dist2").as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
      assert(got == want, s"trial $trial k=$k iters=$iters dim=$dim")
    }
  }

  test("fuzz: connectedComponents matches a local union-find for random graphs") {
    val rng = new scala.util.Random(113)
    for (trial <- 1 to 6) {
      val nNodes = 10 + rng.nextInt(60)
      val edges = (0 until rng.nextInt(120)).map(_ =>
        (rng.nextInt(nNodes).toLong, rng.nextInt(nNodes).toLong))
      val real = edges.filter(e => e._1 != e._2)
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      real.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = real.flatMap { case (a, b) => Seq(a, b) }.distinct
        .map(nd => (nd, find(nd))).sorted
      // self-loop-only nodes drop on both sides; empty edge sets allowed
      val got =
        if (edges.isEmpty) Seq.empty
        else GraphOps.connectedComponents(edges.toDF("src", "dst"))
          .select("id", "component").as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, s"trial $trial edges=${real.size}: ${got.size} vs ${want.size}")
    }
  }

  test("fuzz: withZValue matches a local integer quantize+interleave replay") {
    val rng = new scala.util.Random(127)
    for (trial <- 1 to 6) {
      val nCols = 1 + rng.nextInt(3)
      val bits = 2 + rng.nextInt(14) // nCols * bits ≤ 45 < 62
      val n = 40 + rng.nextInt(100)
      val span = 1L << (3 + rng.nextInt(30)) // narrow and wide key ranges
      val rows = (0 until n).map { i =>
        (i.toLong, Seq.fill(nCols)(rng.nextLong() % span))
      }
      val cols = (0 until nCols).map("c" + _)
      val df = rows.map { case (id, vs) =>
        org.apache.spark.sql.Row.fromSeq(id +: vs)
      }
      val schema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType) +:
          cols.map(c => org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.LongType)))
      val sdf = spark.createDataFrame(spark.sparkContext.parallelize(df, 4), schema)

      val mins = (0 until nCols).map(j => rows.map(_._2(j)).min)
      val maxs = (0 until nCols).map(j => rows.map(_._2(j)).max)
      def quant(x: Long, j: Int): Long =
        if (maxs(j) == mins(j)) 0L
        else (BigInt(x - mins(j)) * ((1L << bits) - 1) / BigInt(maxs(j) - mins(j))).toLong
      val want = rows.map { case (id, vs) =>
        var acc = 0L
        for (i <- 0 until bits; j <- 0 until nCols)
          acc |= ((quant(vs(j), j) >> i) & 1L) << (i * nCols + j)
        (id, acc)
      }.sortBy(_._1)
      val got = LayoutOps.withZValue(sdf, cols, bits)
        .select("id", "zvalue").as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == want, s"trial $trial nCols=$nCols bits=$bits span=$span")
    }
  }

  // ---- r8 additions: the r7-late operator families under random
  //      parameters, each against an independent local replay ----

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
  private def snap6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("fuzz: HLL estimate matches the local md5-register replay across p") {
    val rng = new scala.util.Random(211)
    for (trial <- 1 to 6) {
      val p = Seq(4, 8, 12)(rng.nextInt(3))
      val m = 1 << p
      val rows = (0 until 200 + rng.nextInt(800))
        .map(_ => ("g" + rng.nextInt(3), (rng.nextInt(500) * 7919L).toString))
      val got = SketchOps.hllCardinality(rows.toDF("g", "v"), Seq("g"), "v", p)
        .as[(String, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      rows.groupBy(_._1).foreach { case (g, grp) =>
        val regs = scala.collection.mutable.Map[Int, Int]()
        grp.map(_._2).distinct.foreach { v =>
          val h = md5hex(v)
          val idx = h.take(p / 4).foldLeft(0)((a, c) => a * 16 + Integer.parseInt(c.toString, 16))
          val rest = h.substring(p / 4, p / 4 + 13)
          val z = rest.takeWhile(_ == '0').length
          val rank = if (z == 13) 53 else {
            val fd = Integer.parseInt(rest(z).toString, 16)
            val lz4 = if (fd >= 8) 0 else if (fd >= 4) 1 else if (fd >= 2) 2 else 3
            z * 4 + lz4 + 1
          }
          regs(idx) = math.max(regs.getOrElse(idx, 0), rank)
        }
        val alpha = p match {
          case 4 => 0.673
          case 8 => 0.7182725932495458
          case _ => 0.7213 / (1.0 + 1.079 / m)
        }
        val two53 = BigInt(1) << 53
        val sFull = (regs.values.map(r => BigInt(1) << (53 - r)).sum +
          BigInt(m - regs.size) * two53).toDouble
        val raw = alpha * m.toDouble * m.toDouble * 9007199254740992d / sFull
        val v0 = m - regs.size
        val est = if (raw <= 2.5 * m && v0 > 0) m.toDouble * math.log(m.toDouble / v0) else raw
        assert(got(g) == ((snap6(est), regs.size.toLong)), s"trial $trial p=$p g=$g")
        // estimate quality: within the standard error envelope
        val exact = grp.map(_._2).distinct.size
        assert(math.abs(est - exact) < math.max(6.0 / math.sqrt(m) * exact, 3.0),
          s"trial $trial p=$p g=$g est=$est exact=$exact")
      }
    }
  }

  test("fuzz: CMS estimates match the local grid replay and dominate true counts across d/w") {
    val rng = new scala.util.Random(223)
    for (trial <- 1 to 6) {
      val d = 1 + rng.nextInt(6)
      val w = Seq(2, 16, 256, 1024)(rng.nextInt(4))
      val rows = (0 until 300 + rng.nextInt(500))
        .map(_ => ("g" + rng.nextInt(2), math.abs(rng.nextGaussian() * 30).toInt.toString))
      val df = rows.toDF("g", "v")
      val probeVals = (rows.map(_._2).distinct.take(20) ++ Seq("never-seen")).distinct
      val probes = probeVals.flatMap(v => Seq(("g0", v), ("g1", v))).toDF("g", "pv")
      val sk = SketchOps.cmsSketch(df, Seq("g"), "v", d, w)
      val got = SketchOps.cmsEstimate(sk, Seq("g"), probes, "pv", d, w)
        .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
      def bucket(j: Int, v: String): Int = {
        val h = md5hex(s"$j:$v")
        h.take(4).foldLeft(0)((a, c) => a * 16 + Integer.parseInt(c.toString, 16)) % w
      }
      for (g <- Seq("g0", "g1"); v <- probeVals) {
        val grid = scala.collection.mutable.Map[(Int, Int), Long]()
        rows.filter(_._1 == g).foreach { case (_, x) =>
          (0 until d).foreach(j => grid((j, bucket(j, x))) = grid.getOrElse((j, bucket(j, x)), 0L) + 1) }
        val want = (0 until d).map(j => grid.getOrElse((j, bucket(j, v)), 0L)).min
        assert(got((g, v)) == want, s"trial $trial d=$d w=$w ($g,$v)")
        val truth = rows.count(r => r._1 == g && r._2 == v)
        assert(want >= truth, s"trial $trial CMS must over-estimate")
      }
    }
  }

  test("fuzz: KMV estimate and pairwise Jaccard match the local bottom-k replay across k") {
    val rng = new scala.util.Random(227)
    for (trial <- 1 to 6) {
      val k = 2 + rng.nextInt(63)
      val rows = (0 until 300 + rng.nextInt(600)).map { _ =>
        val g = "g" + rng.nextInt(3)
        // overlapping value ranges so Jaccard is non-trivial
        (g, (rng.nextInt(150) + (if (g == "g2") 75 else 0)).toString)
      }
      val sk = SketchOps.kmvSketch(rows.toDF("g", "v"), Seq("g"), "v", k)
      def h52(v: String): Long =
        md5hex(v).take(13).foldLeft(0L)((a, c) => a * 16 + Integer.parseInt(c.toString, 16))
      val bottoms = rows.groupBy(_._1).view
        .mapValues(_.map(_._2).distinct.map(h52).sorted.take(k)).toMap
      val gotSk = sk.as[(String, Long, Int)].collect().groupBy(_._1).view
        .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
      assert(gotSk == bottoms.mapValues(_.toSeq).toMap, s"trial $trial k=$k sketch")
      val est = SketchOps.kmvEstimate(sk, Seq("g"), k)
        .as[(String, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      bottoms.foreach { case (g, hs) =>
        val nd = rows.filter(_._1 == g).map(_._2).distinct.size
        val want = if (hs.size < k) hs.size.toDouble
          else (k - 1).toDouble / (hs.last.toDouble / 4503599627370496d)
        assert(est(g) == ((snap6(want), hs.size.toLong)), s"trial $trial k=$k est $g")
        if (hs.size < k) assert(want == nd, "under-k sketch must be exact")
      }
      val jac = SketchOps.kmvJaccard(sk, "g", k)
        .as[(String, String, Double, Int)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      for (Seq(a, b) <- bottoms.keys.toSeq.sorted.combinations(2)) {
        val merged = (bottoms(a) ++ bottoms(b)).distinct.sorted.take(k)
        val inter = merged.count(h => bottoms(a).contains(h) && bottoms(b).contains(h))
        assert(jac((a, b)) == ((snap6(inter.toDouble / merged.size), merged.size)),
          s"trial $trial k=$k jaccard ($a,$b)")
      }
    }
  }

  test("fuzz: retention matches the local cohort replay for week AND month periods") {
    val rng = new scala.util.Random(229)
    import java.time.{LocalDateTime, ZoneOffset}
    for (trial <- 1 to 6) {
      val period = if (rng.nextBoolean()) "week" else "month"
      val base = LocalDateTime.of(2024, 1, 5, 0, 0)
      val rows = (0 until 200 + rng.nextInt(400)).map { _ =>
        (rng.nextInt(25).toLong,
          java.sql.Timestamp.from(
            base.plusMinutes(rng.nextInt(120 * 24 * 60)).toInstant(ZoneOffset.UTC)))
      }
      val got = FunnelOps.retention(rows.toDF("u", "ts"), "u", "ts", period)
        .select(expr("unix_micros(cohort)"), col("offset"), col("n_active"),
          col("cohort_size"), col("retention"))
        .as[(Long, Long, Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
      def trunc(ts: java.sql.Timestamp): LocalDateTime = {
        val d = ts.toInstant.atOffset(ZoneOffset.UTC).toLocalDate
        val t = if (period == "week") d.minusDays(d.getDayOfWeek.getValue - 1)
          else d.withDayOfMonth(1)
        t.atStartOfDay()
      }
      val perUser = rows.groupBy(_._1).view.mapValues(_.map(r => trunc(r._2)).distinct).toMap
      val active = scala.collection.mutable.Map[(LocalDateTime, Long), Long]()
      perUser.foreach { case (_, ps) =>
        val cohort = ps.minBy(_.toInstant(ZoneOffset.UTC))
        ps.foreach { pp =>
          val off = if (period == "week")
            java.time.temporal.ChronoUnit.DAYS.between(cohort, pp) / 7
          else (pp.getYear - cohort.getYear) * 12L + (pp.getMonthValue - cohort.getMonthValue)
          active((cohort, off)) = active.getOrElse((cohort, off), 0L) + 1
        }
      }
      val want = active.map { case ((c, off), n) =>
        val size = active((c, 0L))
        (c.toInstant(ZoneOffset.UTC).toEpochMilli * 1000L, off) ->
          (n, size, snap6(n.toDouble / size))
      }.toMap
      assert(got == want, s"trial $trial period=$period")
    }
  }

  test("fuzz: ewmaChart matches the local sequential replay across lambda/nSigma/minPrior") {
    val rng = new scala.util.Random(233)
    for (trial <- 1 to 6) {
      val lambda = 0.05 + rng.nextDouble() * 0.9
      val nSigma = 1.0 + rng.nextDouble() * 3.0
      val minPrior = 2 + rng.nextInt(5)
      val rows = (0 until 150 + rng.nextInt(200)).map { i =>
        ("k" + rng.nextInt(4), i.toLong,
          if (rng.nextInt(10) == 0) None else Some(rng.nextGaussian() * 5 + 20))
      }
      val df = rows.toDF("k", "seq", "v")
      val got = DriftOps.ewmaChart(df, Seq("k"), Seq("seq"), "v", lambda, nSigma, minPrior)
        .select("k", "seq", "ewma", "is_anomaly")
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)),
            if (r.isNullAt(3)) None else Some(r.getBoolean(3)))).toMap
      rows.groupBy(_._1).foreach { case (key, grp0) =>
        val grp = grp0.sortBy(_._2)
        var b = 0.0; var w = 1.0
        var cnt = 0L; var s1 = 0.0; var s2 = 0.0
        var prevRaw: Option[Double] = None
        var prevCnt = 0L; var prevS1 = 0.0; var prevS2 = 0.0
        grp.foreach { case (_, seq, vo) =>
          prevCnt = cnt; prevS1 = s1; prevS2 = s2
          val lagRaw = prevRaw
          vo.foreach { v =>
            b = snap9(lambda * v + (1.0 - lambda) * b)
            w = w * (1.0 - lambda)
            cnt += 1; s1 += v; s2 += v * v
          }
          val raw = if (w == 1.0) None else Some(b / (1.0 - w))
          val anomaly: Option[Boolean] =
            if (vo.isDefined && prevCnt >= minPrior && lagRaw.isDefined) {
              val np = prevCnt.toDouble
              val variance = math.max((prevS2 - prevS1 * prevS1 / np) / np, 0.0)
              val sigma = snap9(math.sqrt(variance))
              Some(snap9(math.abs(vo.get - lagRaw.get)) > snap9(nSigma * sigma))
            } else None
          val (gotE, gotA) = got((key, seq))
          assert(gotE == raw.map(snap9), s"trial $trial $key/$seq ewma")
          assert(gotA == anomaly, s"trial $trial $key/$seq anomaly")
          prevRaw = raw
        }
      }
    }
  }

  test("fuzz: chi2 independence matches the local survival replay across dof") {
    val rng = new scala.util.Random(239)
    for (trial <- 1 to 8) {
      val ka = 2 + rng.nextInt(6) // up to 7 levels
      val kb = 2 + rng.nextInt(2) // 2-3 levels => dof up to 12
      val rows = (0 until 200 + rng.nextInt(400)).map { _ =>
        ("g", "a" + rng.nextInt(ka), "b" + rng.nextInt(kb))
      }
      val row = StatsOps.chiSquaredIndependence(rows.toDF("g", "av", "bv"), Seq("g"), "av", "bv")
        .collect().head
      val (gotChi, gotP) = (row.getDouble(3),
        if (row.isNullAt(4)) None else Some(row.getDouble(4)))
      // local full-grid replay
      val obs = rows.groupBy(r => (r._2, r._3)).view.mapValues(_.size.toLong).toMap
      val as = rows.map(_._2).distinct.sorted; val bs = rows.map(_._3).distinct.sorted
      val ra = as.map(a => a -> obs.filter(_._1._1 == a).values.sum).toMap
      val rb = bs.map(b => b -> obs.filter(_._1._2 == b).values.sum).toMap
      val n = rows.size.toDouble
      val chi = snap9((for (a <- as; b <- bs) yield {
        val e = ra(a) * rb(b) / n
        val o = obs.getOrElse((a, b), 0L).toDouble
        snap9((o - e) * (o - e) / e)
      }).sum)
      assert(gotChi == chi, s"trial $trial chi2 $gotChi vs $chi")
      val dof = (as.size - 1) * (bs.size - 1)
      def survival(x: Double, df: Int): Double = {
        val half = x / 2.0
        if (df % 2 == 0)
          math.exp(-half) * (0 until df / 2).map(i =>
            math.pow(half, i) / (1 to i).foldLeft(1.0)(_ * _)).sum
        else {
          val z = math.sqrt(x) / math.sqrt(2.0)
          val s = 1.0 / (1.0 + 0.3275911 * z)
          val erfc = s * (0.254829592 + s * (-0.284496736 + s * (1.421413741 +
            s * (-1.453152027 + s * 1.061405429)))) * math.exp(-z * z)
          def gammaHalf(i: Int) = (1 to i).foldLeft(math.sqrt(math.Pi))((g, j) => g * (j - 0.5))
          erfc + math.exp(-half) * (1 to (df - 1) / 2).map(i =>
            math.pow(half, i - 0.5) / gammaHalf(i)).sum
        }
      }
      val wantP = if (dof <= 12) Some(snap9(survival(chi, dof))) else None
      // local float survival vs codegen'd column survival: identical
      // formula, but allow the last grid cell on the 1e-9 snap
      (gotP, wantP) match {
        case (Some(g), Some(w)) => assert(math.abs(g - w) <= 1e-9 + 1e-12, s"trial $trial dof=$dof p")
        case (g, w) => assert(g.isEmpty == w.isEmpty, s"trial $trial dof=$dof nullness")
      }
    }
  }

  test("fuzz: funnel matches the local greedy-chain replay under step permutations") {
    val rng = new scala.util.Random(241)
    val types = Seq("view", "click", "signup", "purchase", "error")
    for (trial <- 1 to 8) {
      val nSteps = 2 + rng.nextInt(3)
      val steps = rng.shuffle(types).take(nSteps)
      val rows = (0 until 300 + rng.nextInt(300)).map { i =>
        (rng.nextInt(30).toLong, (i * 997 + rng.nextInt(800)).toLong, types(rng.nextInt(types.size)))
      }
      val got = FunnelOps.funnel(rows.toDF("u", "ts", "et"), "u", "ts", "et", steps)
        .collect().map { r =>
          r.getLong(0) -> ((1 to nSteps).map(i =>
            if (r.isNullAt(i)) None else Some(r.getLong(i))), r.getInt(nSteps + 1))
        }.toMap
      rows.groupBy(_._1).foreach { case (u, evs0) =>
        if (evs0.exists(e => steps.contains(e._3))) {
          val evs = evs0
          var chain = Vector.empty[Option[Long]]
          steps.zipWithIndex.foreach { case (s, i) =>
            val cands = evs.filter(_._3 == s).map(_._2)
            val t: Option[Long] =
              if (i == 0) if (cands.nonEmpty) Some(cands.min) else None
              else chain.last match {
                case Some(prev) =>
                  val later = cands.filter(_ > prev)
                  if (later.nonEmpty) Some(later.min) else None
                case None => None
              }
            chain :+= t
          }
          val (gotTimes, gotReached) = got(u)
          assert(gotTimes == chain, s"trial $trial user $u steps=$steps")
          assert(gotReached == chain.count(_.isDefined), s"trial $trial user $u reached")
        } else assert(!got.contains(u), s"trial $trial user $u should be absent")
      }
    }
  }
}
