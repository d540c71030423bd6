package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded randomized property checks for the curation/mixing
  * kernels \u2014 many small random instances per property, fixed seeds
  * so failures reproduce.
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  test("property: FFD packing invariants hold over random instances") {
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val cap = 64L + rng.nextInt(512)
      val n = 20 + rng.nextInt(150)
      val docs = (1 to n).map(i => (i.toLong, 1L + rng.nextInt(2 * cap.toInt).toLong))
      val df = docs.toDF("doc_id", "n_tokens").repartition(1 + rng.nextInt(4))
      val packed = MixOps.packSequences(df, "doc_id", "n_tokens", cap).cache()
      try {
        assert(packed.count() == n, s"trial $trial: doc count")
        assert(packed.select("doc_id").distinct().count() == n, s"trial $trial: each doc once")
        assert(packed.agg(sum("n_tokens")).as[Long].collect()(0) == docs.map(_._2).sum,
          s"trial $trial: token totals")
        val bad = packed.groupBy("bin_id")
          .agg(sum("n_tokens").as("tok"), count(lit(1)).as("nd"))
          .filter(col("tok") > cap && col("nd") > 1).count()
        assert(bad == 0, s"trial $trial: multi-doc bin over cap=$cap")
      } finally packed.unpersist()
    }
  }

  test("property: repetitionStats matches a direct reimplementation on random multi-line docs") {
    val rng = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    val docs = (1L to 30L).map { id =>
      val lines = (0 until 1 + rng.nextInt(5)).map(_ =>
        (0 until 1 + rng.nextInt(6)).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
      (id, lines.mkString("\n"))
    }
    val out = TextOps.repetitionStats(docs.toDF("id", "text"), "text")
      .select("id", "dup_line_frac", "dup_line_char_frac", "dup_3gram_frac")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    def h6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    for ((id, text) <- docs) {
      val lines = text.split("\n", -1).toSeq
      val expectLine = h6(1.0 - lines.distinct.size.toDouble / lines.size)
      val lc = lines.map(_.length).sum.toDouble
      val expectChar = h6((lc - lines.distinct.map(_.length).sum) / math.max(lc, 1.0))
      val toks = text.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq
      val grams = if (toks.size >= 3) toks.sliding(3).map(_.mkString(" ")).toSeq else Nil
      val expectGram = h6(if (grams.nonEmpty) 1.0 - grams.distinct.size.toDouble / grams.size else 0.0)
      val (a, b, c) = out(id)
      assert(a == expectLine && b == expectChar && c == expectGram,
        s"doc $id: got ($a,$b,$c) want ($expectLine,$expectChar,$expectGram) for '$text'")
      assert(a >= 0 && a <= 1 && b >= 0 && b <= 1 && c >= 0 && c <= 1)
    }
  }

  test("property: normalizeText is idempotent and matches the JDK normalizer on random unicode") {
    val rng = new scala.util.Random(13)
    val pool = "abcXYZ 09.\t\n" + "\u0301\u030a\ufb01\u00e9\u212b\u00c5"
    val strs = (1L to 40L).map { id =>
      (id, (0 until 2 + rng.nextInt(24)).map(_ => pool(rng.nextInt(pool.length))).mkString)
    }
    val once = TextOps.normalizeText(strs.toDF("id", "text"), "text")
      .select("id", "text_norm").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val twice = TextOps.normalizeText(once.toSeq.toDF("id", "text"), "text")
      .select("id", "text_norm").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, raw) <- strs) {
      val jdk = java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.NFC)
        .toLowerCase.replaceAll("\\s+", " ").trim
      assert(once(id) == jdk, s"id $id: '${once(id)}' vs jdk '$jdk'")
      assert(twice(id) == once(id), s"id $id not idempotent")
    }
  }

  test("jacobiEigen converges on equal diagonal entries (the signum(0) pivot case)") {
    // cov [[2,1],[1,2]]: theta = 0 exactly; a signum-based pivot
    // would skip the rotation and never annihilate the off-diagonal
    val (values, vectors) = IvfKnnOps.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(values.sorted.zip(Seq(1.0, 3.0)).forall { case (a, b) => math.abs(a - b) < 1e-9 },
      values.mkString(","))
    // eigenvector check: A v = lambda v
    for (c <- 0 until 2) {
      val v = Array(vectors(0)(c), vectors(1)(c))
      val av = Array(2 * v(0) + v(1), v(0) + 2 * v(1))
      val lam = values(c)
      assert(math.abs(av(0) - lam * v(0)) < 1e-9 && math.abs(av(1) - lam * v(1)) < 1e-9)
    }
    // duplicated-dimension residuals (perfectly correlated, equal
    // variance) must still yield an orthogonal rotation
    val rng = new scala.util.Random(3)
    val res = Array.fill(500) { val a = rng.nextGaussian(); val b = rng.nextGaussian()
      Array(a, a, b, b) }
    val rot = IvfKnnOps.opqRotation(res, m = 2)
    for (i <- 0 until 4; j <- 0 until 4) {
      val dot = (0 until 4).map(k => rot(i)(k) * rot(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-8, s"dup-dim RRt[$i][$j]=$dot")
    }
  }

  test("packSequences: zero-token docs never join a zero-capacity oversize bin") {
    val docs = Seq((1L, 700L), (2L, 0L), (3L, 0L), (4L, 100L)).toDF("doc_id", "n_tokens")
      .repartition(1)
    val packed = MixOps.packSequences(docs, "doc_id", "n_tokens", 512L)
    val binOf = packed.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(binOf(2L) != binOf(1L) && binOf(3L) != binOf(1L),
      s"zero-token docs joined the oversize bin: $binOf")
    val bins = packed.groupBy("bin_id")
      .agg(sum("n_tokens").as("tok"), count(lit(1)).as("nd"))
    assert(bins.filter(col("tok") > 512L && col("nd") > 1).count() == 0)
  }

  test("property: opqRotation stays orthogonal across random shapes") {
    val rng = new scala.util.Random(29)
    for ((dim, m) <- Seq((8, 2), (16, 4), (12, 3))) {
      val scale = Array.tabulate(dim)(_ => math.pow(10, rng.nextInt(4) - 2))
      val res = Array.fill(300)(Array.tabulate(dim)(d => rng.nextGaussian() * scale(d)))
      val rot = IvfKnnOps.opqRotation(res, m)
      for (i <- 0 until dim; j <- 0 until dim) {
        val dot = (0 until dim).map(k => rot(i)(k) * rot(j)(k)).sum
        assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-8, s"dim=$dim m=$m RRt[$i][$j]=$dot")
      }
      // rotation preserves norms (orthogonality seen through data)
      for (r <- res.take(20)) {
        val n1 = math.sqrt(r.map(x => x * x).sum)
        val rr = IvfKnnOps.matVec(rot, r)
        val n2 = math.sqrt(rr.map(x => x * x).sum)
        assert(math.abs(n1 - n2) < 1e-8 * math.max(1.0, n1))
      }
    }
  }
}
