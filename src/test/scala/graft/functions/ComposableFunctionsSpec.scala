package graft.functions

import graft.SparkSpec
import graft.api.LoadDataset
import graft.functions.{TextStatsExpression => TSE}
import org.apache.spark.sql.functions._

/** Coverage for the composable (pure `functions._`) variants that
  * back the SQL-only usage path, plus LoadDataset config knobs.
  */
class ComposableFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("composable minhash: identical shingle sets → identical signatures and band keys") {
    val df = Seq(
      (1L, Seq("a b c", "b c d")),
      (2L, Seq("b c d", "a b c")), // same set, different order
      (3L, Seq("x y z"))
    ).toDF("id", "sh")
    val sig = df.select($"id", TextFunctions.minhashSignature($"sh", 16).as("sig"),
      TextFunctions.lshBandKeys(TextFunctions.minhashSignature($"sh", 16), 4).as("bands"))
    val rows = sig.collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[Long](2))).toMap
    assert(rows(1L)._1 == rows(2L)._1)
    assert(rows(1L)._2 == rows(2L)._2)
    assert(rows(1L)._1 != rows(3L)._1)
    assert(rows(1L)._2.size == 4)
  }

  test("composable simhash64 agrees with the fused expression on token perturbation behavior") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy cat again and again today"),
      (3L, "entirely unrelated content about catalyst optimizer rules")
    ).toDF("id", "text")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val composed = df.select($"id", TextFunctions.simhash64(TextFunctions.tokens($"text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ham(composed(1L), composed(2L)) < ham(composed(1L), composed(3L)))
    val fused = df.select($"id", HashExpressions.simhash64Fast(TextFunctions.tokens($"text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ham(fused(1L), fused(2L)) < ham(fused(1L), fused(3L)))
  }

  test("fused text kernels are bit-identical to the tokens(...)-composed formulations") {
    // tricky boundaries: leading/trailing separators, unicode
    // letters, digits, punctuation runs, empty, single token,
    // mixed-case (lowercasing must match Spark's lower())
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "  leading and trailing  ",
      "punct!!!heavy...text,with;many:breaks",
      "ÜBER Straße naïve café 123 mixed ÉCLAIR",
      "数字123と文字",
      "single",
      "a",
      "UPPER lower MiXeD"
    )
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

    val sim = df.select($"id",
      HashExpressions.simhash64Fast(TextFunctions.tokens($"text")).as("a"),
      HashExpressions.simhashText($"text").as("b")).collect()
    sim.foreach(r => assert(r.getLong(1) == r.getLong(2), s"simhash mismatch on '${texts(r.getLong(0).toInt)}'"))

    val sh = df.select($"id",
      HashExpressions.shingleHashes(TextFunctions.tokens($"text"), 3).as("a"),
      HashExpressions.shingleHashesText($"text", 3).as("b")).collect()
    sh.foreach(r => assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"shingle mismatch on '${texts(r.getLong(0).toInt)}'"))

    // and on the real corpus
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val mism = docs.select(
      HashExpressions.simhash64Fast(TextFunctions.tokens($"text")).as("a"),
      HashExpressions.simhashText($"text").as("b"),
      HashExpressions.shingleHashes(TextFunctions.tokens($"text"), 5).as("sa"),
      HashExpressions.shingleHashesText($"text", 5).as("sb"))
      .filter($"a" =!= $"b" || $"sa" =!= $"sb")
      .count()
    assert(mism == 0, s"$mism real docs disagree between fused and composed kernels")
  }

  test("TextStats/LangIdScore/NearestCentroid generate valid code (strict codegen, no silent fallback)") {
    // with fallback disabled, a doGenCode bug fails the query instead
    // of quietly degrading to the interpreted path
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
      val stats = docs.select(col("doc_id"), org.apache.spark.sql.functions.inline(
        org.apache.spark.sql.functions.array(TSE.textStats(col("text")))))
      assert(stats.count() == 50)
      assert(stats.schema.fieldNames.contains("mean_word_len"))

      val langs = graft.operators.TextOps.langId(docs, "text")
      assert(langs.select("lang_pred").distinct().count() >= 1)

      val cents = Array(Array(0.0, 0.0), Array(10.0, 10.0))
      val pts = Seq((1L, Array(1.0f, 1.0f)), (2L, Array(9.0f, 9.5f))).toDF("id", "v")
      val assigned = pts.select(col("id"),
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.operators.IvfKnnOps.NearestCentroid(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("v")), cents)).as("list_id"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      assert(assigned == Map(1L -> 0, 2L -> 1))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("codegen and interpreted eval agree for TextStats and LangIdScore on the corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // interpreted: direct expression eval against each row
    val texts = docs.select("text").collect().map(_.getString(0))
    val expr = TSE.LangIdScore(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0, org.apache.spark.sql.types.StringType, true),
      Seq("en" -> Set("the", "of", "and"), "es" -> Set("el", "la", "de")))
    val interpreted = texts.map { t =>
      expr.eval(org.apache.spark.sql.catalyst.InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(t))).toString
    }
    val viaDf = docs.select(TSE.langIdScore(col("text"),
      Seq("en" -> Set("the", "of", "and"), "es" -> Set("el", "la", "de"))).as("p"))
      .collect().map(_.getString(0))
    assert(interpreted.toSeq == viaDf.toSeq)
  }

  test("charShingles and wordShingles produce distinct n-grams") {
    val df = Seq("abc abd").toDF("text")
    val ch = df.select(TextFunctions.charShingles($"text", 3)).as[Seq[String]].head()
    assert(ch.contains("abc") && ch.contains("c a") && ch.distinct == ch)
    val w = Seq("a b c d").toDF("t").select(TextFunctions.wordShingles($"t", 2)).as[Seq[String]].head()
    assert(w == Seq("a b", "b c", "c d"))
  }

  test("composable hyperplaneLshBits is deterministic and separates opposites") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Array(-1.0f, -2.0f, -3.0f, -4.0f))
    ).toDF("id", "v")
    val b = df.select($"id", VectorFunctions.hyperplaneLshBits($"v", 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(1L) == (~b(2L) & 0xffL)) // every bit flips for the negated vector
  }

  test("VecMean aggregates element-wise with nulls skipped, empty group null") {
    val df = Seq(
      ("a", Some(Array(1.0f, 2.0f))),
      ("a", Some(Array(3.0f, 6.0f))),
      ("a", None),
      ("b", None)
    ).toDF("k", "v")
    val out = df.groupBy("k").agg(VectorAggregates.vecMean($"v").as("m"))
      .collect().map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[scala.collection.Seq[Double]].toSeq)).toMap
    assert(out("a").get == Seq(2.0, 4.0))
    assert(out("b").isEmpty)
  }

  test("VecMean partial-aggregates before the shuffle") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val plan = emb.groupBy("label").agg(VectorAggregates.vecMean($"embedding"))
      .queryExecution.executedPlan.toString
    // partial_vec_mean below the exchange, final above — map-side combine
    assert(plan.contains("partial_vec_mean"), plan)
  }

  test("LoadDataset zeroAsMissing and dropUnmatchedSamples knobs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-knobs").toFile.getAbsolutePath
    Seq(("s1", 0L, 5L), ("s2", 3L, 0L), ("s9", 1L, 1L))
      .toDF("samples", "otu1", "otu2").write.parquet(s"$dir/d.parquet")
    Seq(("s1", "b1"), ("s2", "b2")).toDF("samples", "batches").write.parquet(s"$dir/m.parquet")
    val ds = LoadDataset.load(spark, LoadDataset.Config(
      dataFiles = Seq(s"$dir/d.parquet"),
      sampleMetadataFiles = Seq(s"$dir/m.parquet"),
      zeroAsMissing = true,
      dropUnmatchedSamples = true
    ))
    assert(ds.df.count() == 2) // s9 has no metadata → dropped
    val s1 = ds.df.filter($"samples" === "s1").select("otu1", "otu2").head()
    assert(s1.isNullAt(0) && s1.getLong(1) == 5L)
  }
}
