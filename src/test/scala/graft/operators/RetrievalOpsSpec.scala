package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "apple banana apple cherry"),
    (1L, "banana banana banana"),
    (2L, "cherry date elderberry fig grape"),
    (3L, "apple apple apple apple banana banana")
  ).toDF("doc_id", "text")

  test("postings: tf and dl per (term, doc)") {
    val p = RetrievalOps.postings(docs, "text", "doc_id")
      .as[(String, Long, Int, Long)].collect().toSet
    assert(p.contains(("apple", 0L, 4, 2L)))
    assert(p.contains(("banana", 1L, 3, 3L)))
    assert(p.contains(("apple", 3L, 6, 4L)))
    // one row per distinct (term, doc)
    assert(p.count(_._1 == "banana") == 3)
  }

  test("bm25TopK matches the closed-form score on a hand fixture") {
    // Single term "apple": df=2, N=4, avgdl = (4+3+5+6)/4 = 4.5
    val idf = math.log(1.0 + (4.0 - 2.0 + 0.5) / (2.0 + 0.5))
    def s(tf: Double, dl: Double) =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 4.5))
    def snap(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val got = RetrievalOps.bm25TopK(docs, "text", "doc_id", Seq("apple"), k = 10)
      .select("doc_id", "score", "rank")
      .as[(Long, Double, Int)].collect().toList
    assert(got.map(_._1) == List(3L, 0L)) // tf=4 beats tf=2
    assert(got.map(_._2) == List(snap(s(4, 6)), snap(s(2, 4))))
    assert(got.map(_._3) == List(1, 2))
  }

  test("queries lowercase and dedupe; ties in score break by doc_id") {
    val tied = Seq((7L, "kiwi melon"), (5L, "kiwi melon")).toDF("doc_id", "text")
    val got = RetrievalOps.bm25TopK(tied, "text", "doc_id", Seq("KIWI", "kiwi"), k = 1)
      .select("doc_id").as[Long].collect().toList
    assert(got == List(5L)) // identical scores — lower doc_id wins the cut
  }

  test("saveIndex/searchIndex round-trip reproduces direct scoring and prunes partitions") {
    val path = java.nio.file.Files.createTempDirectory("bm25spec").toString + "/idx"
    RetrievalOps.saveIndex(docs, "text", "doc_id", path, nBuckets = 8)
    val direct = RetrievalOps.bm25TopK(docs, "text", "doc_id", Seq("apple", "cherry"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toList
    val viaIdx = RetrievalOps.searchIndex(spark, path, Seq("apple", "cherry"), k = 10)
    val got = viaIdx.collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toList
    assert(got == direct)
    // the postings scan must carry a partition filter on the term bucket
    val plan = viaIdx.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") && plan.contains("bkt"), plan)
  }

  test("appendToIndex: incremental build scores identically to a fresh one") {
    val base = java.nio.file.Files.createTempDirectory("bm25app").toString
    val fresh = base + "/fresh"
    val grown = base + "/grown"
    RetrievalOps.saveIndex(docs, "text", "doc_id", fresh, nBuckets = 8)
    RetrievalOps.saveIndex(docs.filter($"doc_id" < 2), "text", "doc_id", grown, nBuckets = 8)
    RetrievalOps.appendToIndex(spark, docs.filter($"doc_id" === 2), "text", "doc_id", grown)
    RetrievalOps.appendToIndex(spark, docs.filter($"doc_id" === 3), "text", "doc_id", grown)
    // empty append is a no-op
    RetrievalOps.appendToIndex(spark, docs.filter($"doc_id" > 99), "text", "doc_id", grown)
    val q = Seq("apple", "banana", "cherry")
    val a = RetrievalOps.searchIndex(spark, fresh, q, 10).collect().map(_.toSeq).toList
    val b = RetrievalOps.searchIndex(spark, grown, q, 10).collect().map(_.toSeq).toList
    assert(a == b)
    // merged stats are exactly the fresh-build stats
    val sf = spark.read.parquet(s"$fresh/stats").select("n_docs", "avgdl", "dl_sum").head()
    val sg = spark.read.parquet(s"$grown/stats").select("n_docs", "avgdl", "dl_sum").head()
    assert(sf == sg)
  }

  test("hotTermReport surfaces the stopword-grade term with exact df and shares") {
    // 'banana' in 3 of 4 docs (75%), 'apple' in 2 (50%); total
    // postings = distinct (term, doc) pairs = 11
    val post = RetrievalOps.postings(docs, "text", "doc_id")
    val got = RetrievalOps.hotTermReport(post, nDocs = 4, nBuckets = 8, minDfFrac = 0.6)
      .select("term", "df", "df_frac", "postings_share", "bucket_share")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toList
    assert(got == List(("banana", 3L, 0.75, 0.272727)), got.toString)
    // lower gate pulls in the 50% term too, sorted df desc
    val both = RetrievalOps.hotTermReport(post, nDocs = 4, nBuckets = 8, minDfFrac = 0.5)
      .select("term").as[String].collect().toList
    assert(both == List("banana", "apple", "cherry"), both.toString) // cherry: also 2 of 4
  }

  test("maxDfFrac gates hot terms out of the build, visibly, and search scores them as absent") {
    val base = java.nio.file.Files.createTempDirectory("bm25gate").toString
    val gatedPath = base + "/gated"
    RetrievalOps.saveIndex(docs, "text", "doc_id", gatedPath, nBuckets = 8, maxDfFrac = 0.6)
    // the dropped sidecar names exactly the gated term with its df
    val dropped = spark.read.parquet(s"$gatedPath/dropped_terms")
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(dropped == List(("banana", 3L)), dropped.toString)
    // no gated postings on disk; ungated terms score EXACTLY as if
    // the query had omitted the gated term (stats keep full corpus)
    val viaGated = RetrievalOps.searchIndex(spark, gatedPath, Seq("banana", "apple"), k = 10)
      .collect().map(_.toSeq).toList
    val fresh = base + "/fresh"
    RetrievalOps.saveIndex(docs, "text", "doc_id", fresh, nBuckets = 8)
    val appleOnly = RetrievalOps.searchIndex(spark, fresh, Seq("apple"), k = 10)
      .collect().map(_.toSeq).toList
    assert(viaGated == appleOnly, s"$viaGated vs $appleOnly")
    // maxDfFrac = 1.0 (default) gates nothing but still writes an
    // EMPTY sidecar — the sidecar always describes the postings
    val ungatedSidecar = spark.read.parquet(s"$fresh/dropped_terms")
    assert(ungatedSidecar.columns.toList == List("term", "df"))
    assert(ungatedSidecar.count() == 0)
    // rebuilding UNGATED at a previously-gated path must clear the
    // stale sidecar (the r15 advice scenario)
    RetrievalOps.saveIndex(docs, "text", "doc_id", gatedPath, nBuckets = 8)
    assert(spark.read.parquet(s"$gatedPath/dropped_terms").count() == 0)
  }

  test("compactIndex re-gates after appends and matches a fresh gated build") {
    // 10 docs: 'hot' everywhere, 'grow' in odd docs only, query
    // terms well under the 0.4 gate, one unique filler per doc.
    // Build gated on evens (drops hot), append odds gate-FREE (hot
    // re-leaks, grow crosses the gate after the fact), compact.
    val all = (0L to 9L).map { i =>
      val words = Seq("hot") ++
        (if (i % 2 == 1) Seq("grow") else Nil) ++
        (if (i <= 2) Seq("apple") else Nil) ++
        (if (i == 4 || i == 5) Seq("cherry") else Nil) ++
        Seq(s"w$i")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("bm25cmp").toString
    val grown = base + "/grown"
    val fresh = base + "/fresh"
    RetrievalOps.saveIndex(all.filter($"doc_id" % 2 === 0), "text", "doc_id", grown,
      nBuckets = 8, maxDfFrac = 0.4)
    RetrievalOps.appendToIndex(spark, all.filter($"doc_id" % 2 === 1), "text", "doc_id", grown)
    // the leak is real before compaction: 'hot' scores via its
    // appended odd-doc postings
    val leaked = RetrievalOps.searchIndex(spark, grown, Seq("hot"), k = 10).count()
    assert(leaked > 0, "fixture must exhibit the post-append leak")
    RetrievalOps.compactIndex(spark, grown, maxDfFrac = 0.4)
    RetrievalOps.saveIndex(all, "text", "doc_id", fresh, nBuckets = 8, maxDfFrac = 0.4)
    val q = Seq("apple", "cherry", "hot", "grow")
    val a = RetrievalOps.searchIndex(spark, fresh, q, 10).collect().map(_.toSeq).toList
    val b = RetrievalOps.searchIndex(spark, grown, q, 10).collect().map(_.toSeq).toList
    assert(a == b, s"$a vs $b")
    assert(a.nonEmpty) // the ungated query terms must actually score
    // the ledger sums postings ever removed: hot = 5 (build, evens)
    // + 5 (compact, the appended odds); grow = 5 (compact)
    val ledger = spark.read.parquet(s"$grown/dropped_terms")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(ledger == Map("hot" -> 10L, "grow" -> 5L), ledger.toString)
    // staged-swap hygiene: no staging/old leftovers
    for (n <- Seq("postings_staging", "postings_old", "dropped_terms_staging", "dropped_terms_old"))
      assert(!new java.io.File(s"$grown/$n").exists(), n)
    // compacting an UNGATED build+append equals the same fresh gated
    // build too (df measured on full postings = corpus df)
    val ungated = base + "/ungated"
    RetrievalOps.saveIndex(all.filter($"doc_id" % 2 === 0), "text", "doc_id", ungated, nBuckets = 8)
    RetrievalOps.appendToIndex(spark, all.filter($"doc_id" % 2 === 1), "text", "doc_id", ungated)
    RetrievalOps.compactIndex(spark, ungated, maxDfFrac = 0.4)
    val c = RetrievalOps.searchIndex(spark, ungated, q, 10).collect().map(_.toSeq).toList
    assert(c == a, s"$c vs $a")
    intercept[IllegalArgumentException](RetrievalOps.compactIndex(spark, ungated, 1.0))
  }

  test("input validation") {
    intercept[IllegalArgumentException](
      RetrievalOps.bm25TopK(docs, "text", "doc_id", Nil, k = 5))
    intercept[IllegalArgumentException](
      RetrievalOps.bm25TopK(docs, "text", "doc_id", Seq("a"), k = 0))
    intercept[IllegalArgumentException](
      RetrievalOps.saveIndex(docs, "text", "doc_id", "/tmp/x", nBuckets = 0))
  }

  test("tfidfTopK matches the closed-form sublinear smoothed-idf score") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark flink"),   // tf(spark)=3
      (2L, "spark flink flink"),         // tf(spark)=1, tf(flink)=2
      (3L, "beam beam beam beam"),       // no query terms
      (4L, "spark")                      // tf(spark)=1
    ).toDF("doc_id", "text")
    val got = RetrievalOps.tfidfTopK(docs, "text", "doc_id", Seq("spark", "flink"), k = 10)
      .select("doc_id", "score", "rank").as[(Long, Double, Int)].collect()
    val n = 4.0
    def idf(df: Double) = math.log((n + 1.0) / (df + 1.0)) + 1.0
    def w(tf: Double, df: Double) = (1.0 + math.log(tf)) * idf(df)
    def snap(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val want = Map( // df(spark)=3, df(flink)=2
      1L -> snap(w(3, 3) + w(1, 2)),
      2L -> snap(w(1, 3) + w(2, 2)),
      4L -> snap(w(1, 3)))
    assert(got.map(r => r._1 -> r._2).toMap == want)
    // doc 3 contains no query term -> absent; ranking by score desc
    assert(got.map(_._1).toSeq == got.sortBy(-_._2).map(_._1).toSeq)
    assert(!got.map(_._1).contains(3L))
    intercept[IllegalArgumentException](RetrievalOps.tfidfTopK(docs, "text", "doc_id", Nil, 5))
    intercept[IllegalArgumentException](RetrievalOps.tfidfTopK(docs, "text", "doc_id", Seq("a"), 0))
  }

  test("rrfFuse sums 1/(c+rank) across lists and ranks by fused score") {
    import spark.implicits._
    val l1 = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "r")
    val l2 = Seq((2L, 1), (3L, 2), (4L, 3)).toDF("id", "r")
    val fused = RetrievalOps.rrfFuse(Seq(l1, l2), "id", "r", k = 3)
      .select("doc_id", "score", "rank").as[(Long, Double, Int)].collect()
    // 2: 1/61+1/62 = .032522; 3: 1/62+1/63 = .032002; 1: 1/61 = .016393
    assert(fused.map(_._1).toSeq == Seq(2L, 3L, 1L))
    assert(fused.map(_._3).toSeq == Seq(1, 2, 3))
    assert(fused(0)._2 == 0.032522 && fused(1)._2 == 0.032002 && fused(2)._2 == 0.016393)
    intercept[IllegalArgumentException](RetrievalOps.rrfFuse(Nil, "id", "r", 3))
    intercept[IllegalArgumentException](RetrievalOps.rrfFuse(Seq(l1), "id", "r", 0))
    intercept[IllegalArgumentException](RetrievalOps.rrfFuse(Seq(l1), "id", "r", 3, c = -1))
  }
}
