package graft.operators

import graft.SparkSpec

class LlrCollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("llrCollocations: hand-computed G2 on a tiny corpus") {
    // bigrams: ab ba ab bc cd -> n(ab)=2, c1(a)=2, c2(b)=2, N=5
    // G2(ab) = 2*(2*ln(10/4) + 3*ln(15/9))
    val df = Seq("a b a b c d").toDF("text")
    val out = TextOps.llrCollocations(df, "text", minCount = 2, k = 10).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "a" && r.getString(1) == "b" && r.getLong(2) == 2L)
    val want = 2.0 * (2.0 * math.log(2.5) + 3.0 * math.log(15.0 / 9.0))
    assert(math.abs(r.getDouble(3) - want) < 1e-8, s"llr ${r.getDouble(3)} vs $want")
  }

  test("llrCollocations: frequency-backed pairs outrank equally-pure rare pairs") {
    val docs = Seq.fill(10)("x y") ++ Seq("q z") ++
      (1 to 20).map(i => s"f$i g$i")
    val out = TextOps.llrCollocations(docs.toDF("text"), "text", minCount = 1, k = 100)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out(("x", "y")) > out(("q", "z")),
      s"x_y ${out(("x", "y"))} should beat q_z ${out(("q", "z"))}")
  }

  test("llrCollocations: saturated marginals produce 0, never NaN") {
    // "a a a": every bigram event is (a,a) -> all off-diagonal cells 0,
    // observed == expected, G2 = 0
    val out = TextOps.llrCollocations(Seq("a a a").toDF("text"), "text",
      minCount = 1, k = 10).collect()
    assert(out.length == 1 && out.head.getDouble(3) == 0.0)
  }
}
