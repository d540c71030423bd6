package graft.operators

import graft.SparkSpec
import graft.functions.CurationExpressions
import org.apache.spark.sql.functions._

/** Curation operators: Unicode normalization, Gopher-style
  * repetition signals, Bloom-gated corpus-membership dedup, n-gram
  * decontamination.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("unicodeNormalize composes decomposed accents under NFC and folds compatibility chars under NFKC (strict codegen)") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq(
        ("cafe\u0301", 1), // e + combining acute -> \u00e9 under NFC
        ("\ufb01le", 2), // fi ligature U+FB01: NFC keeps, NFKC expands to "fi"
        ("plain", 3)
      ).toDF("s", "id")
      val out = df.select(
        col("id"),
        CurationExpressions.unicodeNormalize(col("s"), "NFC").as("nfc"),
        CurationExpressions.unicodeNormalize(col("s"), "NFKC").as("nfkc")
      ).collect().map(r => r.getInt(0) -> (r.getString(1), r.getString(2))).toMap
      assert(out(1)._1 == "caf\u00e9" && out(1)._2 == "caf\u00e9")
      assert(out(2)._1 == "\ufb01le" && out(2)._2 == "file")
      assert(out(3)._1 == "plain" && out(3)._2 == "plain")
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("unicodeNormalize: interpreted eval matches codegen") {
    val rows = Seq("cafe\u0301", "\ufb01le", "mixed \u212b text", "ascii only").toDF("s")
    def run(): Seq[String] =
      rows.select(CurationExpressions.unicodeNormalize(col("s"), "NFKC")).as[String].collect().toSeq
    val gend = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try run() finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(gend == interp)
  }

  test("normalizeText: NFC + lowercase + whitespace collapse makes spelling variants hash-identical") {
    val df = Seq(
      (1L, "The   Cafe\u0301\tMenu"),
      (2L, "the caf\u00e9 menu") // composed + already lowered + single spaces
    ).toDF("id", "text")
    val out = TextOps.normalizeText(df, "text").select("id", "text_norm")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "the caf\u00e9 menu")
    assert(out(1L) == out(2L))
  }

  test("repetitionStats: known line and 3-gram repetition fractions") {
    val dupLines = "alpha beta gamma\ndelta\nalpha beta gamma" // 3 lines, 1 repeat
    val cleanDoc = "every word here appears exactly once in this line"
    val dupGrams = "one two three four one two three four"      // 6 grams, 2 repeated
    val df = Seq((1L, dupLines), (2L, cleanDoc), (3L, dupGrams)).toDF("id", "text")
    val out = TextOps.repetitionStats(df, "text")
      .select("id", "dup_line_frac", "dup_line_char_frac", "dup_3gram_frac")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // doc 1: 1 of 3 lines duplicated; chars 16+5+16=37, distinct 21 -> 16/37
    assert(out(1L)._1 == math.floor(1.0 / 3 * 1e6 + 0.5) / 1e6)
    assert(out(1L)._2 == math.floor(16.0 / 37 * 1e6 + 0.5) / 1e6)
    assert(out(2L) == ((0.0, 0.0, 0.0)))
    // doc 3: 8 tokens -> 6 grams: [one two three],[two three four],[three four one],
    // [four one two],[one two three],[two three four] -> 4 distinct -> 2/6 dup
    assert(out(3L)._3 == math.floor(2.0 / 6 * 1e6 + 0.5) / 1e6)
  }

  test("repetitionStats: short docs (under 3 tokens) report zero 3-gram repetition, not NaN") {
    val df = Seq((1L, "two words"), (2L, "one")).toDF("id", "text")
    val out = TextOps.repetitionStats(df, "text").select("id", "dup_3gram_frac")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(1L -> 0.0, 2L -> 0.0))
  }

  test("dedupAgainstCorpus keeps exactly the docs whose text is absent from the corpus") {
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"), (5L, "beta"))
      .toDF("doc_id", "text")
    val corpus = Seq("beta", "delta", "omega").toDF("text")
    val kept = DedupOps.dedupAgainstCorpus(docs, corpus, "text", expectedCorpusItems = 100L)
      .select("doc_id").as[Long].collect().toSet
    // both copies of "beta" drop (membership, not within-docs dedup); 4 drops
    assert(kept == Set(1L, 3L))
  }

  test("dedupAgainstCorpus: empty corpus keeps everything") {
    val docs = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val corpus = Seq.empty[String].toDF("text")
    val kept = DedupOps.dedupAgainstCorpus(docs, corpus, "text", expectedCorpusItems = 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("decontaminate removes docs sharing a word 5-gram with the eval set, keeps the rest") {
    val evalDf = Seq("the quick brown fox jumps over the lazy dog").toDF("text")
    val docs = Seq(
      (1L, "training text where the quick brown fox jumps mid-sentence"), // shares a 5-gram
      (2L, "completely unrelated content about catalyst physical planning"),
      (3L, "fox jumps over the lazy dog is quoted here verbatim"),         // shares a 5-gram
      (4L, "quick brown fox appears but only as a three gram fragment")    // 3-gram overlap only
    ).toDF("doc_id", "text")
    val kept = DedupOps.decontaminate(docs, evalDf, "text", "doc_id", n = 5,
      expectedEvalShingles = 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L))
  }

  test("null-text docs survive decontaminate (no shingles means not contaminated, never silently dropped)") {
    val evalDf = Seq("the quick brown fox jumps over the lazy dog").toDF("text")
    val docs = Seq((1L, Option("fox jumps over the lazy dog quoted verbatim")), (2L, None: Option[String]))
      .toDF("doc_id", "text")
    val kept = DedupOps.decontaminate(docs, evalDf, "text", "doc_id", n = 5,
      expectedEvalShingles = 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), kept.toString)
    val keptStream = DedupOps.decontaminateStream(docs, evalDf, "text", n = 5,
      expectedEvalShingles = 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(keptStream == Set(2L), keptStream.toString)
  }

  test("semanticDedup: null vectors are ignored by the sampler and the buckets") {
    val base = Seq(
      (1L, Some(Array(1.0, 0.0))),
      (2L, Some(Array(1.001, 0.0))),
      (3L, None: Option[Array[Double]])
    ).toDF("id", "vec")
    val pairs = DedupOps.semanticDedup(base, "id", "vec",
      threshold = 0.999, nClusters = 1, maxSample = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), pairs.toString)
  }

  test("semanticDedup pairs near-identical vectors within their k-means cluster") {
    val base = Seq(
      (1L, Array(1.0, 0.0, 0.0, 0.0)),
      (2L, Array(1.001, 0.0, 0.0, 0.0)), // near-dup of 1
      (3L, Array(0.0, 1.0, 0.0, 0.0)),
      (4L, Array(0.0, 0.0, 1.0, 0.0))
    ).toDF("id", "vec")
    val pairs = DedupOps.semanticDedup(base, "id", "vec",
      threshold = 0.999, nClusters = 3, maxSample = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), pairs.toString)
  }

  test("semanticOverflowReport surfaces the buckets the capped collect drops") {
    // 6 vectors in one tight cluster; maxBucket 4 → the pair pass
    // drops the whole bucket and finds NOTHING — the report must
    // name it with exact counts (nProbe=1, nClusters=1 → one bucket)
    val base = (1 to 6).map(i => (i.toLong, Array(1.0, i * 1e-4))).toDF("id", "vec")
    val pairs = DedupOps.semanticDedup(base, "id", "vec",
      threshold = 0.9, nClusters = 1, maxBucket = 4, maxSample = 100)
    assert(pairs.count() == 0L)
    val rep = DedupOps.semanticOverflowReport(base, "id", "vec",
      nClusters = 1, maxBucket = 4, maxSample = 100).collect()
    assert(rep.length == 1)
    assert(rep.head.getAs[Long]("n_members") == 6L)
    assert(rep.head.getAs[Long]("n_lost_pairs") == 15L)
    // sized correctly, nothing overflows and the pairs come back
    val ok = DedupOps.semanticDedup(base, "id", "vec",
      threshold = 0.9, nClusters = 1, maxBucket = 10, maxSample = 100)
    assert(ok.count() == 15L)
    assert(DedupOps.semanticOverflowReport(base, "id", "vec",
      nClusters = 1, maxBucket = 10, maxSample = 100).isEmpty)
  }

  test("decontaminateStream: the bloom-only probe filters a live stream (stateless scan-stage filter)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val evalDf = Seq("the quick brown fox jumps over the lazy dog").toDF("text")
    val ms = MemoryStream[(Long, String)](spark)
    val stream = ms.toDF().toDF("doc_id", "text")
    val out = DedupOps.decontaminateStream(stream, evalDf, "text", n = 5,
      expectedEvalShingles = 100L)
    val q = out.writeStream.format("memory").queryName("decontam_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      ms.addData(
        (1L, "training text where the quick brown fox jumps over the lazy dog appears"),
        (2L, "completely unrelated content about catalyst physical planning"))
      q.processAllAvailable()
      val kept = spark.table("decontam_stream").select("doc_id").as[Long].collect().toSet
      assert(kept == Set(2L), kept.toString)
    } finally q.stop()
  }

  test("curation projections run unchanged on a stream (repetition/normalize/redact/chunk are stateless)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val ms = MemoryStream[(Long, String)](spark)
    val stream = ms.toDF().toDF("doc_id", "text")
    val out = MixOps.chunkDocs(
      TextOps.normalizeText(
        TextOps.repetitionStats(stream, "text"), "text"),
      "doc_id", "text_norm", maxTokens = 4)
    val q = out.writeStream.format("memory").queryName("curation_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      ms.addData((1L, "Alpha  BETA gamma delta epsilon zeta"), (2L, "one two"))
      q.processAllAvailable()
      val rows = spark.table("curation_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
      assert(rows((1L, 0L)) == "alpha beta gamma delta")
      assert(rows((1L, 1L)) == "epsilon zeta")
      assert(rows((2L, 0L)) == "one two")
    } finally q.stop()
  }

  test("dedupAgainstCorpusStream drops corpus members from a live stream (bloom-only, stateless)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val corpus = Seq("beta", "delta").toDF("text")
    val ms = MemoryStream[(Long, String)](spark)
    val stream = ms.toDF().toDF("doc_id", "text")
    val out = DedupOps.dedupAgainstCorpusStream(stream, corpus, "text", expectedCorpusItems = 100L)
    val q = out.writeStream.format("memory").queryName("corpus_stream_dedup")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      ms.addData((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
      q.processAllAvailable()
      val kept = spark.table("corpus_stream_dedup").select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 3L), kept.toString)
    } finally q.stop()
  }

  test("decontaminate: eval docs shorter than n use the whole-window rule") {
    val evalDf = Seq("tiny eval snippet").toDF("text") // 3 tokens < n=5 -> one whole-window shingle
    val docs = Seq(
      (1L, "tiny eval snippet"),                      // identical short doc -> same whole-window shingle
      (2L, "contains tiny eval snippet inside a much longer training document") // 5-grams, no whole-window match
    ).toDF("doc_id", "text")
    val kept = DedupOps.decontaminate(docs, evalDf, "text", "doc_id", n = 5,
      expectedEvalShingles = 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("collocations: planted bigram dominates by PMI; formula and gates replayed") {
    // "alpha beta" always adjacent (high PMI); "the" everywhere (low PMI);
    // "rare pair" appears 3 times (under minCount=5 -> gated)
    val docs = (1 to 10).map(i => (i.toLong, s"the alpha beta of the word$i and the end")) ++
      (1 to 3).map(i => (100L + i, "rare pair indeed"))
    val df = docs.toDF("doc_id", "text")
    val got = TextOps.collocations(df, "text", minCount = 5, k = 10)
      .as[(String, String, Long, Double)].collect()
    // local replay
    val toks = docs.map(_._2.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq)
    val tTokens = toks.map(_.size).sum
    val tBigrams = toks.map(t => math.max(t.size - 1, 0)).sum
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val bi = toks.flatMap(t => t.zip(t.tail)).groupBy(identity).view.mapValues(_.size)
      .filter(_._2 >= 5)
    val want = bi.map { case ((w1, w2), c) =>
      val pmi = math.log(c.toDouble * tTokens * tTokens /
        (tBigrams.toDouble * uni(w1) * uni(w2)))
      (w1, w2, c.toLong, math.floor(pmi * 1e9 + 0.5) / 1e9)
    }.toSeq.sortBy(r => (-r._4, r._1, r._2)).take(10)
    assert(got.toSeq == want)
    // the planted exclusive pair outranks the ubiquitous-word pairs
    assert(got.head._1 == "alpha" && got.head._2 == "beta")
    assert(!got.exists(r => r._1 == "rare"), "minCount gate failed")
    intercept[IllegalArgumentException](TextOps.collocations(df, "text", 0, 5))
    intercept[IllegalArgumentException](TextOps.collocations(df, "text", 5, 0))
  }
}
