package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Data-mixing operators: per-group quotas, percentile gates,
  * sequence packing.
  */
class MixSpec extends SparkSpec {
  import spark.implicits._

  test("perGroupQuota caps rows per group deterministically (lowest order keys win)") {
    val df = Seq(
      ("a", 3L), ("a", 1L), ("a", 2L), ("b", 10L), ("b", 11L), ("c", 5L)
    ).toDF("src", "id")
    val kept = MixOps.perGroupQuota(df, "src", Seq("id"), 2)
      .select("src", "id").as[(String, Long)].collect().toSet
    assert(kept == Set(("a", 1L), ("a", 2L), ("b", 10L), ("b", 11L), ("c", 5L)))
  }

  test("filterByQuantile keeps the top (1-q) fraction by score; exact and approx paths agree on clean data") {
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "score")
    val exact = MixOps.filterByQuantile(df, "score", 0.8)
      .select("id").as[Long].collect().toSet
    // quantile_cont(0.8) over 1..100 = 80.2 -> keep 81..100
    assert(exact == (81L to 100L).toSet, exact.toString)
    val approx = MixOps.filterByQuantile(df, "score", 0.8, exact = false)
      .select("id").as[Long].collect().toSet
    assert(approx.size >= 18 && approx.size <= 22 && approx.subsetOf((79L to 100L).toSet), approx.toString)
  }

  test("packSequences: every doc packed once, multi-doc bins within budget, oversize docs isolated") {
    val docs = Seq(
      (1L, 300L), (2L, 300L), (3L, 200L), (4L, 100L), (5L, 50L),
      (6L, 700L), // oversize: own bin
      (7L, 512L)  // exact fit: own bin, not a violation
    ).toDF("doc_id", "n_tokens")
    val packed = MixOps.packSequences(docs, "doc_id", "n_tokens", 512L).cache()
    assert(packed.count() == 7)
    assert(packed.select("doc_id").distinct().count() == 7)
    assert(packed.agg(sum("n_tokens")).as[Long].collect()(0) == 2162L)
    val bins = packed.groupBy("bin_id")
      .agg(sum("n_tokens").as("tok"), count(lit(1)).as("n"))
    assert(bins.filter(col("tok") > 512L && col("n") > 1).count() == 0)
    // the oversize doc sits alone
    val bin6 = packed.filter(col("doc_id") === 6L).select("bin_id").as[Long].collect()(0)
    assert(packed.filter(col("bin_id") === bin6).count() == 1)
    // FFD on one partition packs tightly: 300+200 and 300+100+50+... fit together
    val oneP = MixOps.packSequences(docs.repartition(1), "doc_id", "n_tokens", 512L)
    val nBins = oneP.select("bin_id").distinct().count()
    assert(nBins <= 4, s"FFD should pack 7 docs (2162 tokens) into <=4 bins on one partition, got $nBins")
    packed.unpersist()
  }

  test("packSequences is deterministic for a fixed partitioning") {
    val docs = (1 to 200).map(i => (i.toLong, (i * 37 % 300 + 1).toLong)).toDF("doc_id", "n_tokens")
      .repartition(4, col("doc_id"))
    val a = MixOps.packSequences(docs, "doc_id", "n_tokens", 512L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val b = MixOps.packSequences(docs, "doc_id", "n_tokens", 512L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(a == b)
  }

  test("chunkDocs: overlapping token windows cover every token; short docs stay whole") {
    val text = (1 to 25).map(i => s"w$i").mkString(" ") // 25 tokens
    val df = Seq((1L, text), (2L, "just five words in here"), (3L, "")).toDF("id", "text")
    val chunks = MixOps.chunkDocs(df, "id", "text", maxTokens = 10, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    // doc 1: stride 8 -> starts 0,8,16 -> 3 chunks
    assert(chunks.keys.count(_._1 == 1L) == 3, chunks.keys.toString)
    assert(chunks((1L, 0L)) == (1 to 10).map(i => s"w$i").mkString(" "))
    assert(chunks((1L, 1L)) == (9 to 18).map(i => s"w$i").mkString(" "))  // 2-token overlap
    assert(chunks((1L, 2L)) == (17 to 25).map(i => s"w$i").mkString(" ")) // tail clamps
    // short doc: one whole chunk
    assert(chunks((2L, 0L)) == "just five words in here")
    assert(chunks.keys.count(_._1 == 2L) == 1)
    // empty text: one empty chunk, doc not lost
    assert(chunks((3L, 0L)) == "")
  }

  test("chunkDocs then packSequences: chunks respect the cap, so multi-doc bins always fit") {
    val long = (1 to 200).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, long), (2L, long)).toDF("doc_id", "text")
    val chunks = MixOps.chunkDocs(df, "doc_id", "text", maxTokens = 64)
      .withColumn("piece_id", col("doc_id") * 1000 + col("chunk_id"))
      .withColumn("n_tokens", size(split(col("chunk_text"), " ")).cast("long"))
    val packed = MixOps.packSequences(chunks, "piece_id", "n_tokens", 64L)
    val over = packed.groupBy("bin_id").agg(sum("n_tokens").as("tok"))
      .filter(col("tok") > 64L).count()
    assert(over == 0, "chunked pieces can never overflow a bin")
  }

  test("temperatureSample: alpha=1 reduces to uniform targetFraction sampling") {
    val df = (1L to 4000L).map(i => (i, s"s${i % 4}")).toDF("id", "src")
    val out = MixOps.temperatureSample(df, "src", "id", alpha = 1.0, targetFraction = 0.25)
    val n = out.count()
    // deterministic hash coin: realized fraction within a few percent of target
    assert(math.abs(n / 4000.0 - 0.25) < 0.03, s"got $n of 4000")
  }

  test("temperatureSample: alpha<1 up-weights small sources, saturates tiny ones at keep-all") {
    // skewed: big=6000, mid=1000, tiny=8 (rates ≈ 0.28 / 0.69 / capped 1)
    val df = ((1L to 6000L).map(i => (i, "big")) ++ (6001L to 7000L).map(i => (i, "mid"))
      ++ (7001L to 7008L).map(i => (i, "tiny"))).toDF("id", "src")
    val out = MixOps.temperatureSample(df, "src", "id", alpha = 0.5, targetFraction = 0.35).cache()
    val by = out.groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nBig = by.getOrElse("big", 0L); val nMid = by.getOrElse("mid", 0L); val nTiny = by.getOrElse("tiny", 0L)
    // realized keep-rates must order inversely to source size
    assert(nTiny.toDouble / 8 > nMid.toDouble / 1000, s"tiny ${nTiny}/8 vs mid ${nMid}/1000")
    assert(nMid.toDouble / 1000 > nBig.toDouble / 6000, s"mid ${nMid}/1000 vs big ${nBig}/6000")
    // tiny source's rate saturates at 1 → every doc kept
    assert(nTiny === 8L, s"tiny source should keep all 8, kept $nTiny")
    out.unpersist()
  }

  test("temperatureSample is deterministic and layout-independent") {
    val df = (1L to 2000L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val a = MixOps.temperatureSample(df, "src", "id", 0.7, 0.4).select("id").as[Long].collect().sorted.toSeq
    val b = MixOps.temperatureSample(df.repartition(13), "src", "id", 0.7, 0.4)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
    assert(a.nonEmpty)
    // different seed → different sample
    val c = MixOps.temperatureSample(df, "src", "id", 0.7, 0.4, seed = 7L).select("id").as[Long].collect().sorted.toSeq
    assert(a !== c)
  }

  test("temperatureSample: no seed degenerates the coin (multipliers are constants, seed is additive)") {
    val df = (1L to 4000L).map(i => (i, s"s${i % 4}")).toDF("id", "src")
    // 519104/519105 zeroed/unit-ified the old seed-shifted multiplier
    for (seed <- Seq(519104L, 519105L, -999983L * 3)) {
      val n = MixOps.temperatureSample(df, "src", "id", 1.0, 0.25, seed).count()
      assert(math.abs(n / 4000.0 - 0.25) < 0.05, s"seed=$seed kept $n of 4000")
    }
  }

  test("temperatureSample plan: rates broadcast back — the doc side never shuffles") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = MixOps.temperatureSample(df, "lang", "doc_id", 0.5, 0.5)
    val p = out.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("filterByQuantilePerGroup: independent thresholds per group; null group gated on its own") {
    val df = ((1 to 100).map(i => (i.toLong, "hi", i.toDouble)) ++
      (101 to 200).map(i => (i.toLong, "lo", (i - 100).toDouble / 10.0)))
      .toDF("id", "grp", "score")
      .unionByName(Seq((300L, null.asInstanceOf[String], 5.0), (301L, null.asInstanceOf[String], 1.0))
        .toDF("id", "grp", "score"))
    val kept = MixOps.filterByQuantilePerGroup(df, "score", "grp", 0.8).cache()
    // each non-null group keeps its own top 20% inclusive of the
    // nearest-rank threshold element: k = ceil(0.8·100) = 80 →
    // thr = the 80th value (an order statistic, never interpolated —
    // a fresh interpolated double is ulp-ambiguous across engines),
    // so scores 80..100 pass
    val by = kept.groupBy("grp").count().collect()
      .map(r => Option(r.getString(0)).getOrElse("NULL") -> r.getLong(1)).toMap
    assert(by("hi") === 21L && by("lo") === 21L, by.toString)
    // a global gate would keep ZERO of "lo" (its max 10.0 < hi's p80) — per-group must not
    assert(kept.filter($"grp" === "lo").count() > 0)
    // null-group rows compare against the null group's threshold (p80 of {5,1})
    assert(kept.filter($"grp".isNull).select("id").as[Long].collect().toSeq === Seq(300L))
    kept.unpersist()
    // plan: thresholds broadcast — fact side never shuffles
    val p = MixOps.filterByQuantilePerGroup(df, "score", "grp", 0.8)
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("weightedSamplePerGroup matches the window formulation of Efraimidis-Spirakis exactly") {
    val df = (1L to 3000L).map(i => (i, s"g${i % 5}", 1.0 + (i * 13 % 97))).toDF("id", "grp", "w")
    val got = MixOps.weightedSamplePerGroup(df, "grp", "id", "w", k = 7, seed = 3L)
      .select($"grp", $"rank", $"id").as[(String, Long, Long)].collect().toSet
    // reference: same coin/key via a row_number window
    val P = 999983L
    val u = ((($"id" % P + P) % P) * 480879L % P + 3L) * 104729L % P + 1L
    val key = log(u.cast("double") / (P + 1).toDouble) / $"w"
    val w7 = org.apache.spark.sql.expressions.Window.partitionBy($"grp").orderBy(key.desc, $"id".asc)
    val expect = df.withColumn("rank", row_number().over(w7)).filter($"rank" <= 7)
      .select($"grp", $"rank".cast("long"), $"id").as[(String, Long, Long)].collect().toSet
    assert(got === expect)
    assert(got.size === 35)
  }

  test("weightedSamplePerGroup: heavy weights dominate inclusion; zero/null weights excluded; layout-independent") {
    val base = (1L to 200L).map(i => (i, "g", 1.0)) :+ ((999L, "g", 500.0))
    val df = (base :+ ((1000L, "g", 0.0))).toDF("id", "grp", "w")
      .unionByName(Seq((1001L, "g", null.asInstanceOf[java.lang.Double])).toDF("id", "grp", "w"))
    // the 500x-weighted row should make the k=5 sample in nearly every seed
    val hits = (1 to 20).count { s =>
      MixOps.weightedSamplePerGroup(df, "grp", "id", "w", k = 5, seed = s.toLong)
        .filter($"id" === 999L).count() == 1
    }
    assert(hits >= 16, s"heavy row sampled only $hits/20 seeds")
    // excluded rows never appear
    val all = MixOps.weightedSamplePerGroup(df, "grp", "id", "w", k = 300, seed = 1L)
    assert(all.filter($"id" >= 1000L).count() === 0)
    // deterministic across partitioning
    val a = MixOps.weightedSamplePerGroup(df, "grp", "id", "w", 5, 42L).select("id").as[Long].collect().sorted.toSeq
    val b = MixOps.weightedSamplePerGroup(df.repartition(17), "grp", "id", "w", 5, 42L).select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("weightedSamplePerGroup plan: bounded TopK aggregate with map-side partials, no window sort") {
    val df = (1L to 100L).map(i => (i, s"g${i % 3}", 1.0)).toDF("id", "grp", "w")
    val p = MixOps.weightedSamplePerGroup(df, "grp", "id", "w", 3)
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.split("ObjectHashAggregate").length >= 3, s"no partial phase:\n$p")
    assert(!p.contains("Window"), p)
  }

  // ---- DSIR importance weights (G14) ----

  test("dsirWeights: target-vocabulary docs outweigh raw-only docs; local replay exact") {
    // raw corpus: half the docs speak the target vocabulary
    val raw = Seq(
      (1L, "aa bb aa bb"), (2L, "aa bb cc"), // target-like
      (3L, "xx yy xx yy"), (4L, "xx yy zz")  // raw-only
    ).toDF("id", "text")
    val target = Seq((10L, "aa bb aa"), (11L, "bb cc aa bb")).toDF("id", "text")
    val B = 64
    val got = MixOps.dsirWeights(raw, target, "id", "text", buckets = B)
      .as[(Long, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // local replay: same grams, same md5-fold bucket, same smoothing
    def bucket(g: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val v = h.take(13).foldLeft(0L)((a, c) => a * 16 + Character.digit(c, 16))
      (v % B).toInt
    }
    def grams(s: String): Seq[String] = {
      val t = s.split("\\s+").toSeq
      t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    val cs = new Array[Long](B); val ct = new Array[Long](B)
    Seq("aa bb aa bb", "aa bb cc", "xx yy xx yy", "xx yy zz")
      .flatMap(grams).foreach(g => cs(bucket(g)) += 1)
    Seq("aa bb aa", "bb cc aa bb").flatMap(grams).foreach(g => ct(bucket(g)) += 1)
    val tS = cs.sum.toDouble; val tT = ct.sum.toDouble
    def lam(f: Int): Double =
      math.log((ct(f) + 0.5) / (tT + 0.5 * B)) - math.log((cs(f) + 0.5) / (tS + 0.5 * B))
    def want(s: String): Double = {
      val w = grams(s).map(g => lam(bucket(g))).sum
      math.floor(w * 1e6 + 0.5) / 1e6
    }
    assert(got(1L) === ((7L, want("aa bb aa bb"))))
    assert(got(3L)._2 === want("xx yy xx yy"))
    // the point of the operator: target-vocab docs score strictly higher
    assert(got(1L)._2 > got(3L)._2 && got(2L)._2 > got(4L)._2)
    // guards
    intercept[IllegalArgumentException](
      MixOps.dsirWeights(raw, target, "id", "text", buckets = 1))
    intercept[IllegalArgumentException](
      MixOps.dsirWeights(raw, target, "id", "text", alpha = 0.0))
  }

  test("DsirFeatures kernel: codegen-strict, matches tokens+md5-fold, empty/edge inputs") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq("Hello, World! 42", "one", "", "  ,,  ").toDF("text")
      val got = df.select(
        graft.functions.DsirFeaturesExpression.dsirFeatures(col("text"), 64).as("f"))
        .as[Seq[Int]].collect()
      def bucket(g: String): Int = {
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
        (h.take(13).foldLeft(0L)((a, c) => a * 16 + Character.digit(c, 16)) % 64).toInt
      }
      assert(got(0) === Seq("hello", "world", "42", "hello world", "world 42").map(bucket))
      assert(got(1) === Seq(bucket("one")))
      assert(got(2) === Seq.empty && got(3) === Seq.empty)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("dsirWeights scoring pass is zero-shuffle (ratio table rides the scan)") {
    val raw = (1L to 50L).map(i => (i, s"tok$i tok${i + 1} common")).toDF("id", "text")
    val target = (1L to 10L).map(i => (i, "common words here")).toDF("id", "text")
    val scored = MixOps.dsirWeights(raw, target, "id", "text", buckets = 32)
    val p = scored.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"), s"scoring pass must not shuffle:\n$p")
    assert(scored.count() === 50L)
  }

  test("BioLoader reads ORC (native Spark datasource)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toFile.getAbsolutePath
    Seq((1L, "x"), (2L, "y")).toDF("id", "v").write.orc(s"$dir/data.orc")
    val df = graft.sources.BioLoader.load(spark, s"$dir/data.orc")
    assert(df.count() == 2 && df.columns.toSeq == Seq("id", "v"))
  }
}
