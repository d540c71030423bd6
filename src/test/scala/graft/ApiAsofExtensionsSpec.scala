package graft

import graft.api.LoadDataset
import graft.operators.AsofJoinOps
import org.apache.spark.sql.functions._

class ApiAsofExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("asofBackward attaches most recent right row per key, inclusive at equal time") {
    val left = Seq((1, 10L, "e1"), (1, 20L, "e2"), (1, 5L, "e0"), (2, 10L, "x")).toDF("k", "t", "ev")
    val right = Seq((1, 10L, 100.0), (1, 15L, 150.0), (3, 1L, 999.0)).toDF("k", "rt", "price")
    val out = AsofJoinOps.asofBackward(left, right, "k", "t", "rt", Seq("price"))
      .select("k", "t", "ev", "price").collect()
      .map(r => (r.getInt(0), r.getLong(1), if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSet
    assert(out == Set(
      (1, 5L, -1.0),   // before any right row
      (1, 10L, 100.0), // equal time matches (inclusive)
      (1, 20L, 150.0), // latest \u2264 20 is 15
      (2, 10L, -1.0)   // key with no right rows
    ))
  }

  test("asofBackward: matched right row wins as a unit, including its nulls") {
    // The most recent right row at t<=20 has price=null, note="n2".
    // Per-column filling would resurrect the older 100.0 and pair it
    // with n2 \u2014 the whole-row semantics must yield (null, "n2").
    val left = Seq((1, 20L, "e")).toDF("k", "t", "ev")
    val right = Seq(
      (1, 10L, Some(100.0), "n1"),
      (1, 15L, None: Option[Double], "n2")
    ).toDF("k", "rt", "price", "note")
    val out = AsofJoinOps.asofBackward(left, right, "k", "t", "rt", Seq("price", "note"))
      .select("price", "note").collect()(0)
    assert(out.isNullAt(0), s"null payload of the matched row must win: $out")
    assert(out.getString(1) == "n2")
  }

  test("asofBackward tolerance: stale matches null out, fresh ones survive") {
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    val left = Seq((1, ts(100L), "a"), (1, ts(2000L), "b"), (1, ts(50L), "c"))
      .toDF("k", "t", "ev")
    val right = Seq((1, ts(90L), 9.0)).toDF("k", "rt", "price")
    val out = AsofJoinOps.asofBackward(left, right, "k", "t", "rt", Seq("price"),
        toleranceSeconds = Some(60L))
      .collect().map(r => r.getString(2) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out("a").contains(9.0), "10s-stale match inside tolerance")
    assert(out("b").isEmpty, "1910s-stale match beyond tolerance nulls out")
    assert(out("c").isEmpty, "row before any right row stays null")
    // boundary: exactly tolerance-stale is inclusive
    val edge = AsofJoinOps.asofBackward(
      Seq((1, ts(150L), "e")).toDF("k", "t", "ev"), right, "k", "t", "rt",
      Seq("price"), toleranceSeconds = Some(60L)).head()
    assert(edge.getDouble(3) == 9.0)
  }

  test("asofBackward tolerance: non-timestamp time columns are rejected") {
    val left = Seq((1, 10L, "e")).toDF("k", "t", "ev")
    val right = Seq((1, 5L, 1.0)).toDF("k", "rt", "price")
    intercept[IllegalArgumentException] {
      AsofJoinOps.asofBackward(left, right, "k", "t", "rt", Seq("price"),
        toleranceSeconds = Some(60L))
    }
  }

  test("LoadDataset.load: metadata join + role inference + label encode, end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft-api").toFile.getAbsolutePath
    Seq(("s1", 3L, 5L), ("s2", 0L, 2L), ("s3", 7L, 1L))
      .toDF("samples", "otu1", "otu2").write.parquet(s"$dir/data.parquet")
    Seq(("s1", "sick", "b1"), ("s2", "healthy", "b1"), ("s3", "sick", "b2"))
      .toDF("samples", "diagnosis", "batches").write.parquet(s"$dir/meta.parquet")
    Seq(("otu1", "g__Akkermansia"), ("otu2", "g__Bacteroides"))
      .toDF("feature", "taxonomy").write.parquet(s"$dir/featmeta.parquet")

    val ds = LoadDataset.load(spark, LoadDataset.Config(
      dataFiles = Seq(s"$dir/data.parquet"),
      sampleMetadataFiles = Seq(s"$dir/meta.parquet"),
      featureMetadataFiles = Seq(s"$dir/featmeta.parquet"),
      experimentType = "otu",
      targetColumn = Some("diagnosis")
    ))
    assert(ds.roles.sampleColumn.contains("samples"))
    assert(ds.roles.batchColumn.contains("batches"))
    assert(ds.roles.targetColumn.contains("diagnosis"))
    assert(ds.labelNames == Seq("healthy", "sick"))
    assert(ds.task.contains(graft.sources.ColumnInference.Classification))
    // metadata-first column order, encoded labels appended
    assert(ds.df.columns.contains("encoded_labels"))
    val rows = ds.df.select("samples", "diagnosis", "encoded_labels")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(rows == Set(("s1", "sick", 1), ("s2", "healthy", 0), ("s3", "sick", 1)))
    // feature type tag + feature metadata attached
    assert(ds.df.schema("otu1").metadata.getString("graft.featureType") == "Abundance")
    assert(ds.df.schema("otu1").metadata.getString("taxonomy") == "g__Akkermansia")
    // split is deterministic and covers all rows
    val splits = ds.trainTestSplit(0.34)
    assert(splits("train").count() + splits("test").count() == 3)
  }

  test("GraftDataset accessor family + select/add_item/cast (reference Bioset op parity)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-acc").toFile.getAbsolutePath
    Seq(("s1", 3L, 5L, "b1", "sick"), ("s2", 0L, 2L, "b1", "healthy"), ("s3", 7L, 1L, "b2", "sick"))
      .toDF("samples", "otu1", "otu2", "batches", "diagnosis").write.parquet(s"$dir/d.parquet")
    val ds = LoadDataset.load(spark, LoadDataset.Config(
      dataFiles = Seq(s"$dir/d.parquet"), targetColumn = Some("diagnosis"), experimentType = "otu"))

    // get_data: sample + feature columns only
    assert(ds.getData.columns.toSeq == Seq("samples", "otu1", "otu2"))
    // get_sample_metadata: sample + batch (+ metadata)
    assert(ds.getSampleMetadata.columns.toSeq == Seq("samples", "batches"))
    // get_target: sample + raw + encoded
    assert(ds.getTarget.columns.toSeq == Seq("samples", "diagnosis", "encoded_labels"))
    // get_feature_metadata reads back what attach wrote
    assert(ds.getFeatureMetadata("otu1")("graft.featureType") == "Abundance")

    // select(indices): positional, distributed
    val sorted = ds.copy(df = ds.df.orderBy("samples"))
    val picked = sorted.selectRows(Seq(0L, 2L)).select("samples").collect().map(_.getString(0)).toSet
    assert(picked == Set("s1", "s3"))

    // add_item: single-row append with null fill
    val plus = ds.copy(df = ds.df.select("samples", "otu1")).addItem(Map("samples" -> "s4"))
    assert(plus.count() == 4)
    assert(plus.filter($"samples" === "s4").select("otu1").collect()(0).isNullAt(0))

    // cast_column
    assert(ds.castColumn("otu1", org.apache.spark.sql.types.DoubleType)
      .schema("otu1").dataType.typeName == "double")

    // mapBatches: batched row transform (reference map(batched=True))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("samples", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("total", org.apache.spark.sql.types.LongType)))
    val mapped = ds.copy(df = ds.df.select("samples", "otu1", "otu2"))
      .mapBatches(schema)(rows => rows.map(r =>
        org.apache.spark.sql.Row(r.getString(0), r.getLong(1) + r.getLong(2))))
    assert(mapped.orderBy("samples").collect().map(_.getLong(1)).toSeq == Seq(8L, 2L, 8L))
  }

  test("GraftDataset HF-surface wrappers: rename/remove/sort/unique/shuffle/flatten") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hfops").toFile.getAbsolutePath
    Seq(("s1", 3L, "b1"), ("s2", 0L, "b1"), ("s3", 7L, "b2"))
      .toDF("samples", "otu1", "batches").write.parquet(s"$dir/d.parquet")
    val ds = LoadDataset.load(spark, LoadDataset.Config(dataFiles = Seq(s"$dir/d.parquet")))

    assert(ds.renameColumn("otu1", "abundance").columns.contains("abundance"))
    assert(!ds.removeColumns("batches").columns.contains("batches"))
    assert(ds.sortBy("otu1").select("samples").collect().map(_.getString(0)).toSeq == Seq("s2", "s1", "s3"))
    assert(ds.unique("batches").collect().map(_.getString(0)).toSet == Set("b1", "b2"))
    // deterministic shuffle: same seed same order, different seed (likely) different
    val o1 = ds.shuffle(7L).select("samples").collect().map(_.getString(0)).toSeq
    val o2 = ds.shuffle(7L).select("samples").collect().map(_.getString(0)).toSeq
    assert(o1 == o2 && o1.toSet == Set("s1", "s2", "s3"))
    // flatten delegates to flattenStructs
    val nested = ds.copy(df = ds.df.select(org.apache.spark.sql.functions.struct($"samples", $"otu1").as("s")))
    assert(nested.flatten.columns.toSeq == Seq("s.samples", "s.otu1"))
  }

  test("LoadDataset binarize path and rows_are_features transpose") {
    val dir = java.nio.file.Files.createTempDirectory("graft-api2").toFile.getAbsolutePath
    Seq(("s1", "A", 1.0), ("s2", "B", 2.0), ("s3", "C", 3.0))
      .toDF("samples", "labels", "v").write.parquet(s"$dir/d.parquet")
    val ds = LoadDataset.load(spark, LoadDataset.Config(
      dataFiles = Seq(s"$dir/d.parquet"),
      positiveLabels = Seq("A"), negativeLabels = Seq("B")
    ))
    val enc = ds.df.select("samples", "encoded_labels").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(enc == Map("s1" -> 1, "s2" -> 0, "s3" -> -1))

    Seq(("f1", 1.0, 2.0), ("f2", 3.0, 4.0))
      .toDF("feat", "s1", "s2").write.parquet(s"$dir/t.parquet")
    val dst = LoadDataset.load(spark, LoadDataset.Config(
      dataFiles = Seq(s"$dir/t.parquet"), rowsAreFeatures = true))
    assert(dst.df.columns.sorted.toSeq == Seq("f1", "f2", "sample"))
    assert(dst.df.count() == 2)
  }

  test("GraftExtensions exposes the custom expressions to SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT simhash64(array('a','b')) AS sh,
        |       minhash_band_keys(shingle_hashes(array('a','b','c'), 2), 8, 4) AS mh,
        |       text_stats('Hello world! 42.') AS ts,
        |       cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cs,
        |       jaccard_sim(array('a','b'), array('b','c')) AS js""".stripMargin).collect()(0)
    assert(row.getLong(0) != 0L)
    assert(row.getSeq[Long](1).size == 2)
    assert(row.getStruct(2).getAs[Int]("n_tokens") == 3)
    assert(row.getDouble(3) == 1.0)
    assert(math.abs(row.getDouble(4) - 1.0 / 3.0) < 1e-12)
  }

  test("heavy_hitters works from SQL as a grouped aggregate") {
    GraftExtensions.register(spark)
    Seq("x", "x", "x", "y", "y", "z").toDF("item").createOrReplaceTempView("hh_in")
    val rows = spark.sql(
      "SELECT e.item, e.cnt FROM (SELECT heavy_hitters(item, 16, 2) AS hh FROM hh_in) " +
        "LATERAL VIEW explode(hh) t AS e ORDER BY e.cnt DESC").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("x", 3L), ("y", 2L)))
  }

  test("heavy_hitters implicit-casts non-string items instead of a runtime ClassCastException") {
    GraftExtensions.register(spark)
    Seq(5L, 5L, 9L).toDF("k").createOrReplaceTempView("hh_long")
    val rows = spark.sql(
      "SELECT e.item, e.cnt FROM (SELECT heavy_hitters(k, 8, 1) AS hh FROM hh_long) " +
        "LATERAL VIEW explode(hh) t AS e").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("5", 2L)))
  }

  test("SQL builders reject wrong arity with a named error, not IndexOutOfBounds") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] { spark.sql("SELECT top_k(1.0D)").collect() }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("top_k requires 3 arguments")), msgs(e).mkString(" | "))
  }

  test("unicode_normalize works from SQL and validates its form argument") {
    GraftExtensions.register(spark)
    // NB: Spark's chr() is ASCII-mod-256 (chr(769)=chr(1)), unlike
    // DuckDB's codepoint chr \u2014 embed the codepoints via Scala escapes
    val row = spark.sql(
      "SELECT unicode_normalize('Cafe\u0301', 'NFC') AS nfc, " +
        "unicode_normalize('\ufb01le', 'NFKC') AS nfkc").collect()(0)
    assert(row.getString(0) == "Caf\u00e9")
    assert(row.getString(1) == "file")
    val e = intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', 'BOGUS')").collect()
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("unknown form")), msgs(e).mkString(" | "))
  }

  test("vec_mean works as a SQL aggregate via the extension registry") {
    GraftExtensions.register(spark)
    Seq((0, Array(1.0, 3.0)), (0, Array(3.0, 5.0)), (1, Array(7.0, 7.0)))
      .toDF("g", "v").createOrReplaceTempView("graft_vecs")
    val rows = spark.sql("SELECT g, vec_mean(v) AS m FROM graft_vecs GROUP BY g ORDER BY g")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(rows(0) == Seq(2.0, 4.0))
    assert(rows(1) == Seq(7.0, 7.0))
  }
}
