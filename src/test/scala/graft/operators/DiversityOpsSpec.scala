package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DiversityOpsSpec extends SparkSpec {
  import spark.implicits._

  // s1=(f1:2, f2:6)  s2=(f1:4, f2:4, f3:8)  s3=(f9:5)  s4 ≡ s1
  private def abund = Seq(
    ("s1", "f1", 2.0), ("s1", "f2", 6.0),
    ("s2", "f1", 4.0), ("s2", "f2", 4.0), ("s2", "f3", 8.0),
    ("s3", "f9", 5.0),
    ("s4", "f1", 2.0), ("s4", "f2", 6.0)
  ).toDF("sample", "feat", "v")

  test("alphaDiversity matches hand-computed Shannon/Simpson/richness") {
    val a = DiversityOps.alphaDiversity(abund, "sample", "feat", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val s1 = a("s1")
    assert(s1.getLong(1) == 2L)
    // p = (0.25, 0.75): H = 0.562335, 1-Σp² = 0.375
    assert(math.abs(s1.getDouble(2) - 0.562335) < 1e-9)
    assert(math.abs(s1.getDouble(3) - 0.375) < 1e-9)
    assert(a("s2").getLong(1) == 3L)
    // single-feature sample: H = 0, Simpson = 0
    assert(a("s3").getDouble(2) == 0.0 && a("s3").getDouble(3) == 0.0)
  }

  test("alphaDiversity pre-sums duplicate rows and drops nonpositive") {
    val df = Seq(("s", "f", 1.0), ("s", "f", 1.0), ("s", "g", -3.0)).toDF("sample", "feat", "v")
    val a = DiversityOps.alphaDiversity(df, "sample", "feat", "v").collect()
    assert(a.length == 1 && a(0).getLong(1) == 1L && a(0).getDouble(2) == 0.0)
  }

  test("brayCurtis: shared, disjoint, and identical pairs") {
    val bc = DiversityOps.brayCurtis(abund, "sample", "feat", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // Σ|x−y| = 2+2+8 = 12 over T=8+16 → 0.5
    assert(math.abs(bc(("s1", "s2")) - 0.5) < 1e-9)
    // no shared features → 1
    assert(bc(("s1", "s3")) == 1.0)
    // identical abundance vectors → 0
    assert(bc(("s1", "s4")) == 0.0)
    // all (a < b) pairs present: C(4,2) = 6
    assert(bc.size == 6)
  }
}
