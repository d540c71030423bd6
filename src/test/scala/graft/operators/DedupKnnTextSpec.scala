package graft.operators

import graft.SparkSpec
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import org.apache.spark.sql.functions._

class DedupKnnTextSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bend today"), // near dup of 1
    (4L, "completely different text about spark catalyst optimizer rules and plans"),
    (5L, "numbers 12345 and punctuation!!! everywhere, truly: chaotic; text?")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min-id survivor per content key") {
    val kept = DedupOps.exact(docs, "doc_id", md5(col("text")))
    assert(kept.count() == 4)
    assert(kept.filter($"doc_id" === 2).count() == 0)
    val groups = DedupOps.exactGroups(docs, "doc_id", md5(col("text")))
    assert(groups.filter($"n_copies" === 2).select("keep_id").as[Long].head() == 1L)
  }

  test("minhashLsh finds exact and near dup pairs, not unrelated ones") {
    val pairs = DedupOps.minhashLsh(docs, "doc_id", "text", shingleSize = 3, numHashes = 64, rowsPerBand = 4, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash: identical docs at hamming 0; dissimilar docs far") {
    val pairs = DedupOps.simhash(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
    assert(!pairs.exists(p => p._2 == 4L))
  }

  test("ngramJaccard verifies exact jaccard on candidates") {
    val pairs = DedupOps.ngramJaccard(docs, "doc_id", "text", shingleSize = 3, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L)))
  }

  test("ngram adaptive ordering: collision probe separates dup-heavy from unique corpora; auto output matches both explicit orders") {
    // 40 distinct docs vs the same docs replicated 10x
    // every token carries the doc index — no shared shingles at all
    val base = (1 to 40).map(i => (i.toLong,
      (0 until 8).map(w => s"w${i}x$w").mkString(" ")))
    val uniq = base.toDF("doc_id", "text")
    val dup = (0 until 10).flatMap(r => base.map { case (id, t) => (id + r * 1000L, t) }).toDF("doc_id", "text")
    val rUniq = DedupOps.ngramPrefixCollisionRatio(uniq, "text", sampleSize = 1000)
    val rDup = DedupOps.ngramPrefixCollisionRatio(dup, "text", sampleSize = 1000)
    assert(rUniq > 0.9, s"unique corpus ratio $rUniq")
    assert(rDup < 0.2, s"10x-dup corpus ratio $rDup")
    // auto result == both explicit orders (ordering changes the plan, never the output)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val auto = pairs(DedupOps.ngramJaccardAuto(dup, "doc_id", "text", threshold = 0.7, sampleSize = 1000))
    assert(auto == pairs(DedupOps.ngramJaccard(dup, "doc_id", "text", threshold = 0.7, orderByFrequency = true)))
    assert(auto == pairs(DedupOps.ngramJaccard(dup, "doc_id", "text", threshold = 0.7, orderByFrequency = false)))
    assert(auto.nonEmpty)
  }

  test("dedupAll keeps one representative per exact+near dup cluster") {
    val out = DedupOps.dedupAll(docs, "doc_id", "text", shingleSize = 3, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    // 2 is an exact dup of 1; 3 is a near dup of 1 → both dropped
    assert(out == Set(1L, 4L, 5L))
  }

  test("jaccard bounds and behavior") {
    val df = Seq((Seq("a", "b"), Seq("b", "c"))).toDF("x", "y")
    val j = df.select(TF.jaccard(col("x"), col("y"))).as[Double].head()
    assert(math.abs(j - 1.0 / 3.0) < 1e-12)
  }

  test("embeddingDedup finds planted duplicate vectors") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.001f, 0.0f, 0.0f)), // near dup of 1
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = DedupOps.embeddingDedup(vecs, "vec_id", "embedding", threshold = 0.99, nBits = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhash ignores null-text docs instead of pairing them at hamming 0") {
    val withNulls = docs.union(Seq(
      (6L, null.asInstanceOf[String]),
      (7L, null.asInstanceOf[String]),
      (8L, null.asInstanceOf[String])
    ).toDF("doc_id", "text"))
    val pairs = DedupOps.simhash(withNulls, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!pairs.exists(p => p._1 >= 6L || p._2 >= 6L), s"null-text docs must not pair: $pairs")
    assert(pairs.contains((1L, 2L))) // real dups still found
  }

  test("embeddingDedup ignores null-vector rows instead of crashing") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.001f, 0.0f, 0.0f)),
      (3L, null.asInstanceOf[Array[Float]]),
      (4L, null.asInstanceOf[Array[Float]])
    ).toDF("vec_id", "embedding")
    val pairs = DedupOps.embeddingDedup(vecs, "vec_id", "embedding", threshold = 0.99, nBits = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("dupClusters: clamped probe limit near Long.MaxValue still resolves on the driver") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val clusters = DedupOps.dupClusters(pairs, driverEdgeThreshold = Long.MaxValue)
      .as[(Long, Long)].collect().toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("dupClusters: probe that exactly fills the limit falls through to the distributed path") {
    // 3 edges, threshold 2 → probeLimit 3; collect fills it exactly,
    // so union-find must NOT run on a possibly-partial edge set
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val clusters = DedupOps.dupClusters(pairs, driverEdgeThreshold = 2L)
      .as[(Long, Long)].collect().toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("bruteForceTopK ranks by cosine with deterministic ties") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = KnnOps.bruteForceTopK(vecs.filter($"vec_id" === 1), vecs, "vec_id", "embedding", 2)
    val ranked = out.orderBy("rank").select("neighbor_id").as[Long].collect()
    assert(ranked.toSeq == Seq(2L, 3L))
  }

  test("lshTopK achieves full recall on a planted identical vector") {
    val base = (1 to 50).map(i => (i.toLong, Array.tabulate(8)(d => math.sin(i * 13.7 + d).toFloat)))
    val vecs = (base :+ (99L, base.head._2)).toDF("vec_id", "embedding")
    val out = KnnOps.lshTopK(vecs.filter($"vec_id" === 99), vecs, "vec_id", "embedding", 1, nBits = 6)
    assert(out.select("neighbor_id").as[Long].head() == 1L)
  }

  test("langId spots obvious languages") {
    val df = Seq(
      (1, "the cat is on the mat and it is happy with this"),
      (2, "el gato que se sienta en la casa es de la familia"),
      (3, "xyzzy plugh qwop")
    ).toDF("id", "text")
    val out = TextOps.langId(df, "text").select("id", "lang_pred").as[(Int, String)].collect().toMap
    assert(out(1) == "en" && out(2) == "es" && out(3) == "und")
  }

  test("quality scoring penalizes punctuation/digit-heavy short text") {
    val out = TextOps.qualityScore(docs, "text")
      .select("doc_id", "quality").as[(Long, Double)].collect().toMap
    assert(out(1L) > out(5L))
    assert(out.values.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("token counts: ws tokens and bpe-ish supertokens") {
    val df = Seq("Hello, world! 42 times.").toDF("text")
    val out = TextOps.tokenCounts(df, "text").select("n_tokens_ws", "n_tokens_bpeish").head()
    assert(out.getInt(0) == 4) // hello world 42 times
    assert(out.getInt(1) >= 7) // words + punctuation marks
  }

  test("fingerprint: equal text equal hash, different text different hash") {
    val out = TextOps.fingerprint(docs, "text").select("doc_id", "fingerprint").as[(Long, Long)].collect().toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(4L))
  }

  test("redactPii scrubs urls, emails, ips, and phone runs; clean text unchanged") {
    val df = Seq(
      (1L, "mail me at a.b+c@ex-ample.org now"),
      (2L, "see https://a.io/x?q=2 and http://b.co"),
      (3L, "host 192.168.0.1 called +44 20 7946 0958 twice"),
      (4L, "a perfectly clean sentence with the number 7")
    ).toDF("id", "text")
    val out = TextOps.redactPii(df, "text").select("id", "text_redacted")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "mail me at <EMAIL> now")
    assert(out(2L) == "see <URL> and <URL>")
    assert(out(3L) == "host <IP> called <PHONE> twice")
    assert(out(4L) == "a perfectly clean sentence with the number 7")
  }

  test("vector functions: cosine/dot/norm/hamming") {
    val df = Seq((Array(3.0f, 4.0f), Array(4.0f, 3.0f))).toDF("a", "b")
    val r = df.select(
      VF.dotProduct(col("a"), col("b")),
      VF.l2Norm(col("a")),
      VF.cosineSimilarity(col("a"), col("a")),
      VF.hammingDistance(lit(0b1011L), lit(0b0010L))
    ).head()
    assert(r.getDouble(0) == 24.0)
    assert(r.getDouble(1) == 5.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(r.getInt(3) == 2)
  }

  test("recallAtK: per-query hit fractions against exact retrieval; rank rows past k ignored") {
    // exact top-2 per query vs an approx that got one of two right
    // for q1, both for q2, none for q3 (and q3 missing from approx
    // entirely must still report 0, not vanish)
    val exact = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 99L, 3), // rank 3 ignored at k=2
      (2L, 20L, 1), (2L, 21L, 2),
      (3L, 30L, 1), (3L, 31L, 2)
    ).toDF("query_id", "neighbor_id", "rank")
    val approx = Seq(
      (1L, 10L, 1), (1L, 77L, 2),
      (2L, 21L, 1), (2L, 20L, 2), // order differs — membership is what counts
      (1L, 99L, 3)                // past-k approx row must not count
    ).toDF("query_id", "neighbor_id", "rank")
    val got = KnnOps.recallAtK(approx, exact, 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((1L, 2L, 0.5)), s"q1: ${got(1L)}")
    assert(got(2L) == ((2L, 2L, 1.0)), s"q2: ${got(2L)}")
    assert(got(3L) == ((0L, 2L, 0.0)), s"q3: ${got(3L)}")
    // rank-less frames: everything present counts
    val noRank = KnnOps.recallAtK(
      approx.select("query_id", "neighbor_id"),
      exact.filter($"rank" <= 2).select("query_id", "neighbor_id"), 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(noRank(2L) == 1.0 && noRank(3L) == 0.0)
  }

  test("overflow telemetry names exactly what the capped collect drops (planted 20x-dup bucket)") {
    // 20 identical docs + 2 unrelated ones; maxBucket 10 → every
    // band the twins share overflows; the unrelated docs' bands don't
    val twins = (1L to 20L).map(i => (i, "the same duplicated boilerplate sentence appears in every one of these documents"))
    val others = Seq(
      (100L, "completely unrelated text about catalyst physical plans and shuffle exchanges"),
      (101L, "another distinct document concerning parquet footers and column statistics"))
    val df = (twins ++ others).toDF("doc_id", "text")

    val report = DedupOps.minhashOverflowReport(df, "doc_id", "text",
      shingleSize = 3, numHashes = 64, rowsPerBand = 4, maxBucket = 10)
      .collect()
    // identical docs share ALL 16 bands, each with the full 20 members
    assert(report.length == 16, s"bands overflowed: ${report.length}")
    assert(report.forall(_.getAs[Long]("n_members") == 20L))
    assert(report.forall(_.getAs[Long]("n_lost_pairs") == 190L))

    // consistency: the capped pass emits ZERO pairs for the planted
    // bucket at this cap — the report accounts for every lost pair
    val pairs = DedupOps.minhashLsh(df, "doc_id", "text",
      shingleSize = 3, numHashes = 64, rowsPerBand = 4, threshold = 0.7, maxBucket = 10)
    assert(pairs.count() == 0)
    // ...and with the cap raised past the bucket, all 190 pairs surface
    val uncapped = DedupOps.minhashLsh(df, "doc_id", "text",
      shingleSize = 3, numHashes = 64, rowsPerBand = 4, threshold = 0.7, maxBucket = 100)
    assert(uncapped.count() == 190)

    // span-hash flavor: every 3-token span of the twin text overflows
    val spanReport = DedupOps.spanOverflowReport(df, "doc_id", "text", k = 3, maxBucket = 10)
    assert(spanReport.collect().forall(_.getAs[Long]("n_members") == 20L))
    assert(spanReport.count() > 0)

    // simhash flavor: the 4 quarter-buckets of the shared signature
    val simReport = DedupOps.simhashOverflowReport(df, "doc_id", "text", maxBucket = 10)
    assert(simReport.count() == 4)
    assert(simReport.collect().forall(_.getAs[Long]("n_members") >= 20L))
  }

  test("keepFirstOccurrence keeps earliest (doc, chunk) copy of each segment") {
    import spark.implicits._
    val chunks = Seq(
      (1L, 0L, "a"), (1L, 1L, "b"), (2L, 0L, "a"), (0L, 5L, "a")
    ).toDF("doc_id", "chunk_id", "chunk_text")
    val kept = DedupOps.keepFirstOccurrence(chunks, col("chunk_text"),
        Seq(col("doc_id"), col("chunk_id")))
      .select("doc_id", "chunk_id").as[(Long, Long)].collect().toSet
    // "a" first occurs at (0,5); "b" at (1,1)
    assert(kept == Set((0L, 5L), (1L, 1L)))
    intercept[IllegalArgumentException] {
      DedupOps.keepFirstOccurrence(chunks, col("chunk_text"), Seq.empty)
    }
  }
}
