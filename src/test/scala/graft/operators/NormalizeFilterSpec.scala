package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def long3 = Seq(
    ("s1", "f1", 2.0), ("s1", "f2", 6.0),
    ("s2", "f1", 4.0), ("s2", "f2", 4.0), ("s2", "f3", 8.0)
  ).toDF("sample", "feat", "v")

  test("tss shares sum to 1 per sample") {
    val t = NormalizeOps.tss(long3, "sample", "v")
    val sums = t.groupBy("sample").agg(sum("tss").as("s")).collect().map(_.getDouble(1))
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-12))
    val v = t.filter($"sample" === "s1" && $"feat" === "f1").select("tss").as[Double].head()
    assert(math.abs(v - 0.25) < 1e-12)
  }

  test("clr is zero-mean per sample") {
    val c = NormalizeOps.clr(long3, "sample", "v")
    val means = c.groupBy("sample").agg(avg("clr")).collect().map(_.getDouble(1))
    assert(means.forall(m => math.abs(m) < 1e-12))
  }

  test("zscore standardizes per feature; constant feature → null") {
    val df = Seq(("f1", 1.0), ("f1", 3.0), ("f2", 5.0), ("f2", 5.0)).toDF("feat", "v")
    val z = NormalizeOps.zscore(df, "feat", "v")
    val f1 = z.filter($"feat" === "f1").select("zscore").as[Double].collect().sorted
    assert(math.abs(f1(0) + math.sqrt(0.5)) < 1e-9 && math.abs(f1(1) - math.sqrt(0.5)) < 1e-9)
    assert(z.filter($"feat" === "f2").select("zscore").collect().forall(_.isNullAt(0)))
  }

  test("minmax maps to [0,1]; constant → null") {
    val df = Seq(("f1", 1.0), ("f1", 3.0), ("f1", 2.0), ("f2", 7.0)).toDF("feat", "v")
    val m = NormalizeOps.minmax(df, "feat", "v")
    val f1 = m.filter($"feat" === "f1").select("minmax").as[Double].collect().sorted
    assert(f1.toSeq == Seq(0.0, 0.5, 1.0))
    assert(m.filter($"feat" === "f2").select("minmax").head().isNullAt(0))
  }

  test("presence binarizes and log1pCol is ln(1+x)") {
    val df = Seq(0.0, 3.0).toDF("v")
    assert(NormalizeOps.presence(df, "v").select("present").as[Int].collect().toSeq == Seq(0, 1))
    val l = NormalizeOps.log1pCol(df, "v").select("log1p").as[Double].collect()
    assert(l(0) == 0.0 && math.abs(l(1) - math.log(4.0)) < 1e-12)
  }

  test("zeroAsMissing + imputeGroupMean fills with group mean of non-missing") {
    val df = Seq(("a", 0.0), ("a", 4.0), ("a", 8.0), ("b", 2.0)).toDF("g", "v")
    val out = FilterOps.imputeGroupMean(FilterOps.zeroAsMissing(df, "v"), "g", "v", "vi")
    val a = out.filter($"g" === "a").select("vi").as[Double].collect().sorted
    assert(a.toSeq == Seq(4.0, 6.0, 8.0)) // 0 → mean(4,8)=6
  }

  test("prevalenceFilter keeps only features above the observation threshold") {
    val df = Seq(
      ("s1", "common", 1.0), ("s2", "common", 2.0), ("s3", "common", 1.0),
      ("s1", "rare", 1.0),
      ("s2", "zeroed", 0.0), ("s3", "zeroed", 0.0)
    ).toDF("sample", "feat", "v")
    val kept = FilterOps.prevalenceFilter(df, "sample", "feat", "v", 0.67, exact = true)
    assert(kept.select("feat").distinct().as[String].collect().toSeq == Seq("common"))
  }

  test("dropSparseSamples drops samples with too many missing") {
    val df = Seq(
      ("s1", Some(1.0)), ("s1", Some(2.0)),
      ("s2", None), ("s2", Some(1.0)),
      ("s3", None), ("s3", None)
    ).toDF("sample", "v")
    val kept = FilterOps.dropSparseSamples(df, "sample", "v", 0.5)
    assert(kept.select("sample").distinct().as[String].collect().sorted.toSeq == Seq("s1", "s2"))
  }

  test("quantileNormalize: every sample lands on the rank-mean distribution") {
    // A = (2,3,5), B = (1,4,4): rank means 1.5, 3.5, 4.5; the B tie
    // at 4 splits by tieCol so rank 2 vs 3 is deterministic
    val df = Seq(
      ("A", 2.0, 1), ("A", 3.0, 2), ("A", 5.0, 3),
      ("B", 1.0, 1), ("B", 4.0, 2), ("B", 4.0, 3)
    ).toDF("sample", "v", "tie")
    val qn = NormalizeOps.quantileNormalize(df, "sample", "v", "tie")
      .select("sample", "tie", "qnorm").as[(String, Int, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(qn(("A", 1)) == 1.5 && qn(("A", 2)) == 3.5 && qn(("A", 3)) == 4.5)
    assert(qn(("B", 1)) == 1.5 && qn(("B", 2)) == 3.5 && qn(("B", 3)) == 4.5)
  }

  test("quantileNormalize: unequal sample sizes average over reaching samples") {
    // A = (2,3,5), C = (10,20): rank 1 → (2+10)/2, rank 2 → (3+20)/2,
    // rank 3 → 5 alone (only A reaches it)
    val df = Seq(
      ("A", 2.0, 1), ("A", 3.0, 2), ("A", 5.0, 3),
      ("C", 10.0, 1), ("C", 20.0, 2)
    ).toDF("sample", "v", "tie")
    val qn = NormalizeOps.quantileNormalize(df, "sample", "v", "tie")
      .select("sample", "v", "qnorm").as[(String, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(qn(("A", 2.0)) == 6.0 && qn(("A", 3.0)) == 11.5 && qn(("A", 5.0)) == 5.0)
    assert(qn(("C", 10.0)) == 6.0 && qn(("C", 20.0)) == 11.5)
  }
}
