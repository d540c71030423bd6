package graft.operators

import graft.SparkSpec

class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  test("readability: counts and the Flesch closed form") {
    // 2 sentences, 6 words, syllable groups: the(1) cat(1) sat(1)
    // here(2: e, e... 'here' -> h[e]r[e] = 2 groups) so(1) now(1)
    val df = Seq((1L, "The cat sat here. So now!")).toDF("id", "body")
    val r = TextOps.readability(df, "id", "body").head()
    assert(r.getInt(1) == 2, s"sentences ${r.getInt(1)}")
    assert(r.getInt(2) == 6, s"words ${r.getInt(2)}")
    assert(r.getInt(3) == 7, s"syllable groups ${r.getInt(3)}")
    val want = 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (7.0 / 6.0)
    assert(math.abs(r.getDouble(4) - want) < 1e-8, s"flesch ${r.getDouble(4)} vs $want")
  }

  test("readability: zero sentences or words yield NULL flesch") {
    val df = Seq((1L, "no terminal punctuation"), (2L, "!!! ...")).toDF("id", "body")
    val rows = TextOps.readability(df, "id", "body").collect()
      .map(r => r.getLong(0) -> r.isNullAt(4)).toMap
    assert(rows(1L) && rows(2L))
  }

  test("readability: simple prose scores higher than dense long-word text") {
    val simple = (1 to 20).map(_ => "The dog ran. It was fun.").mkString(" ")
    val dense = (1 to 5).map(_ =>
      "Notwithstanding institutional considerations, organizational accountability necessitates comprehensive implementation.").mkString(" ")
    val out = TextOps.readability(
      Seq((1L, simple), (2L, dense)).toDF("id", "body"), "id", "body")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out(1L) > out(2L) + 30, s"got $out")
  }
}
