package graft.plans

import graft.SparkSpec
import graft.operators.ReshapeOps
import org.apache.spark.sql.functions._

class JaccardRulesSpec extends SparkSpec {
  import spark.implicits._

  test("JaccardSim matches the composed array formulation") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("a")),
      (Seq.empty[String], Seq.empty[String]),
      (Seq("a", "a", "b"), Seq("b", "b")) // duplicates collapse
    ).toDF("x", "y")
    val out = df.select(
      JaccardRules.jaccardSim(col("x"), col("y")).as("j"),
      (size(array_intersect(col("x"), col("y"))).cast("double") /
        when(size(array_union(col("x"), col("y"))) === 0, lit(1))
          .otherwise(size(array_union(col("x"), col("y"))))).as("ref")
    ).collect()
    out.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12, r.toString))
  }

  test("JaccardSizePrefilter injects the size guard ahead of the set computation") {
    GraftExtensionsTestSession.withRule { s =>
      import s.implicits._
      // parquet-backed so ConvertToLocalRelation can't fold the filter away
      val docs = s.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), split(col("text"), " ").as("x"), split(col("source"), "c").as("y"))
      val q = docs.filter(JaccardRules.jaccardSim(col("x"), col("y")) >= 0.8)
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("size("), optimized) // guard injected
      assert(optimized.contains("jaccard_sim"), optimized)

      // correctness unchanged by the rewrite
      val df = Seq(
        (1L, Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j"), Seq("a")),
        (2L, Seq("a", "b", "c"), Seq("a", "b", "c"))
      ).toDF("id", "x", "y")
      val ids = df.filter(JaccardRules.jaccardSim(col("x"), col("y")) >= 0.8)
        .select("id").as[Long].collect().toSeq
      assert(ids == Seq(2L))
    }
  }

  test("JaccardSizePrefilter is sound for arrays with duplicate elements") {
    GraftExtensionsTestSession.withRule { s =>
      import s.implicits._
      // Raw sizes 9 vs 3 would fail a raw-size guard at t=0.8, but
      // the SET jaccard is 3/3 = 1.0 — the row must survive.
      // Parquet-backed so the filter isn't folded into a
      // LocalRelation before the injected rule runs.
      val tmp = java.nio.file.Files.createTempDirectory("graft_jac_dup").toString
      Seq(
        (1L, Seq("a", "a", "a", "a", "a", "a", "a", "b", "c"), Seq("a", "b", "c")),
        (2L, Seq("a", "b"), Seq("x", "y"))
      ).toDF("id", "x", "y").write.mode("overwrite").parquet(tmp)
      val df = s.read.parquet(tmp)
      val ids = df.filter(JaccardRules.jaccardSim(col("x"), col("y")) >= 0.8)
        .select("id").as[Long].collect().toSeq
      assert(ids == Seq(1L), s"duplicate-element rows must not be pre-filtered: $ids")
    }
  }

  test("JaccardSizePrefilter uses raw size when inputs are provably distinct (ShingleHashes)") {
    GraftExtensionsTestSession.withRule { s =>
      import graft.functions.HashExpressions
      val docs = s.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), HashExpressions.shingleHashes(split(col("text"), " "), 3).as("sh"))
      val joined = docs.as("a").crossJoin(docs.as("b"))
        .filter(JaccardRules.jaccardSim(col("a.sh"), col("b.sh")) >= 0.8)
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("size("), optimized)
      // ShingleHashes dedups by construction → no array_distinct in the guard
      assert(!optimized.contains("array_distinct"), optimized)
    }
  }

  test("JaccardSizePrefilter uses raw size for ShingleHashesText (the fused dedup path)") {
    GraftExtensionsTestSession.withRule { s =>
      import graft.functions.HashExpressions
      val docs = s.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), HashExpressions.shingleHashesText(col("text"), 3).as("sh"))
      val joined = docs.as("a").crossJoin(docs.as("b"))
        .filter(JaccardRules.jaccardSim(col("a.sh"), col("b.sh")) >= 0.8)
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("size("), optimized)
      assert(!optimized.contains("array_distinct"), optimized)
    }
  }

  test("flattenStructs expands nested structs with dotted names") {
    val df = Seq((1, ("x", 2.0), 5)).toDF("id", "s", "v")
    val flat = ReshapeOps.flattenStructs(df)
    assert(flat.columns.toSeq == Seq("id", "s._1", "s._2", "v"))
    val r = flat.collect()(0)
    assert(r.getString(1) == "x" && r.getDouble(2) == 2.0)
  }
}

/** The shared test session has no extensions; the rule test applies
  * the optimizer rule through the experimental methods hook instead
  * (same injection point `spark.sql.extensions` uses at build time).
  */
object GraftExtensionsTestSession {
  def withRule[T](f: org.apache.spark.sql.SparkSession => T): T = {
    val s = graft.TestSpark.spark
    s.experimental.extraOptimizations = Seq(JaccardRules.JaccardSizePrefilter)
    try f(s)
    finally s.experimental.extraOptimizations = Nil
  }
}
