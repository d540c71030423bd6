package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitStatsSpec extends SparkSpec {
  import spark.implicits._

  test("trainTestSplit is content-deterministic and ~fraction") {
    val df = spark.range(10000).toDF("id")
    val s1 = SplitOps.trainTestSplit(df, Seq("id"), 0.2)
    val s2 = SplitOps.trainTestSplit(df.repartition(7), Seq("id"), 0.2)
    val f1 = s1.filter($"split" === "test").count()
    assert(math.abs(f1 / 10000.0 - 0.2) < 0.02)
    // same rows land in same split regardless of partitioning
    val joined = s1.withColumnRenamed("split", "a").join(s2.withColumnRenamed("split", "b"), "id")
    assert(joined.filter($"a" =!= $"b").count() == 0)
  }

  test("stratifiedSplit holds the fraction within every label") {
    val df = spark.range(1000).toDF("id").withColumn("y", ($"id" % 4).cast("string"))
    val s = SplitOps.stratifiedSplit(df, "y", Seq("id"), 0.25)
    val fracs = s.groupBy("y")
      .agg((sum(when($"split" === "test", 1).otherwise(0)) / count(lit(1))).as("f"))
      .select("f").as[Double].collect()
    assert(fracs.forall(f => math.abs(f - 0.25) < 0.01))
  }

  test("stratifiedSample keeps requested per-label fractions") {
    val df = spark.range(4000).toDF("id").withColumn("y", ($"id" % 2).cast("string"))
    val s = SplitOps.stratifiedSample(df, "y", Seq("id"), Map("0" -> 0.5, "1" -> 0.1))
    val counts = s.groupBy("y").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("0") / 2000.0 - 0.5) < 0.05)
    assert(math.abs(counts("1") / 2000.0 - 0.1) < 0.05)
  }

  test("deterministicShuffle gives a stable order") {
    val df = spark.range(100).toDF("id")
    val a = SplitOps.deterministicShuffle(df, Seq("id")).select("id").as[Long].collect().toSeq
    val b = SplitOps.deterministicShuffle(df.repartition(5), Seq("id")).select("id").as[Long].collect().toSeq
    assert(a == b && a != (0L until 100L))
  }

  test("kFold covers all folds, stable under repartitioning") {
    val df = spark.range(1000).toDF("id")
    val f1 = SplitOps.kFold(df, Seq("id"), 5)
    val counts = f1.groupBy("fold").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(0, 1, 2, 3, 4))
    assert(counts.values.forall(c => c > 150 && c < 250))
    val f2 = SplitOps.kFold(df.repartition(7), Seq("id"), 5)
    val joined = f1.withColumnRenamed("fold", "a").join(f2.withColumnRenamed("fold", "b"), "id")
    assert(joined.filter($"a" =!= $"b").count() == 0)
  }

  test("writeShards produces exactly N sorted shards") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toFile.getAbsolutePath
    val df = spark.range(1000).toDF("id").withColumn("v", ($"id" * 37) % 1000)
    ExportOps.writeShards(df, s"$dir/out", 4, Seq("v"))
    val files = new java.io.File(s"$dir/out").listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4)
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 1000)
    // each shard is internally sorted by v
    val perFile = back.select(input_file_name().as("f"), $"v").collect().groupBy(_.getString(0))
    perFile.values.foreach { rows =>
      val vs = rows.map(_.getLong(1)).toSeq
      assert(vs == vs.sorted)
    }
  }

  test("topKPerGroup returns k rows per group, deterministic ties") {
    val df = Seq(("g1", 1, 5.0), ("g1", 2, 5.0), ("g1", 3, 1.0), ("g2", 4, 2.0))
      .toDF("g", "id", "v")
    val top = StatsOps.topKPerGroup(df, Seq("g"), "v", "id", 2)
    val g1 = top.filter($"g" === "g1").orderBy("rank").select("id").as[Int].collect()
    assert(g1.toSeq == Seq(1, 2)) // tie on v=5.0 broken by id asc
    assert(top.filter($"g" === "g2").count() == 1)
  }

  test("describeAll stacks per-column stats") {
    val df = Seq((1.0, 10.0), (3.0, 30.0)).toDF("a", "b")
    val d = StatsOps.describeAll(df, Seq("a", "b")).collect().map(r => r.getString(0) -> r).toMap
    assert(d("a").getAs[Double]("mean") == 2.0)
    assert(d("b").getAs[Double]("max") == 30.0)
    assert(d("a").getAs[Long]("n") == 2L)
  }

  test("rollup re-aggregates through a feature mapping") {
    val fact = Seq(("s1", "otu1", 2.0), ("s1", "otu2", 3.0), ("s2", "otu1", 1.0)).toDF("sample", "otu", "v")
    val tax = Seq(("otu1", "genusA"), ("otu2", "genusA")).toDF("otu", "genus")
    val r = StatsOps.rollup(fact, tax, "otu", "genus", "sample", "v")
    val s1 = r.filter($"sample" === "s1").select("v").as[Double].head()
    assert(s1 == 5.0)
  }
}
