package graft.operators

import graft.SparkSpec

class LmOpsSpec extends SparkSpec {
  import spark.implicits._

  private def snap(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
  private def corpus = Seq((0L, "a b a"), (1L, "b b")).toDF("doc_id", "text")

  test("bigrams: BOS context, empty docs emit nothing") {
    val b = LmOps.bigrams(Seq((0L, "a b a"), (1L, "")).toDF("doc_id", "text"),
      "text", "doc_id").as[(Long, String, String)].collect().toList
    assert(b == List((0L, "<s>", "a"), (0L, "a", "b"), (0L, "b", "a")))
  }

  test("trainBigramLm counts") {
    val lm = LmOps.trainBigramLm(corpus, "text", "doc_id")
      .as[(String, String, Long)].collect().toSet
    assert(lm == Set(
      ("<s>", "a", 1L), ("a", "b", 1L), ("b", "a", 1L), ("<s>", "b", 1L), ("b", "b", 1L)))
  }

  test("nllScore matches the closed form (self-scoring)") {
    // ctx: <s>→2, a→1, b→2; V=2; α=0.5
    // doc0: p = .5, .75, .5 ; doc1: p = .5, .5
    val lm = LmOps.trainBigramLm(corpus, "text", "doc_id")
    val got = LmOps.nllScore(corpus, lm, "text", "doc_id")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toList
    val d0 = snap(-(math.log(0.5) + math.log(0.75) + math.log(0.5)) / 3)
    val d1 = snap(-(math.log(0.5) + math.log(0.5)) / 2)
    assert(got == List((0L, 3L, d0), (1L, 2L, d1)))
  }

  test("smoothing covers unseen bigrams and unseen contexts") {
    val lm = LmOps.trainBigramLm(corpus, "text", "doc_id")
    val other = Seq((9L, "c a")).toDF("doc_id", "text")
    val got = LmOps.nllScore(other, lm, "text", "doc_id")
      .as[(Long, Long, Double)].collect().toList
    // (<s>,c): c12=0, c1(<s>)=2 → p=0.5/3 ; (c,a): c12=0, c1(c)=0 → p=0.5/1
    val want = snap(-(math.log(0.5 / 3.0) + math.log(0.5)) / 2)
    assert(got == List((9L, 2L, want)))
  }

  test("alpha must be positive") {
    intercept[IllegalArgumentException](
      LmOps.nllScore(corpus, LmOps.trainBigramLm(corpus, "text", "doc_id"),
        "text", "doc_id", alpha = 0.0))
  }
}
