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
}
