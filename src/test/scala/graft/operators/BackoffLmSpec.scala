package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BackoffLmSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    (0L, "the cat sat on the mat"),
    (2L, "the cat sat on the rug"),
    (4L, "a dog sat on the mat")).toDF("id", "body")

  test("backoffScore: seen trigrams score as exact count ratios") {
    val lm = LmOps.trainBackoffLm(train, "body", "id")
    // doc repeating a training sentence: every trigram seen
    val probe = Seq((1L, "the cat sat on the mat")).toDF("id", "body")
    val r = LmOps.backoffScore(probe, lm, "body", "id").head()
    assert(r.getLong(1) == 6L)
    // first trigram (<s>,<s>,the): c=2 of ctx 3 -> ln(2/3); all others
    // have positive trigram probability; nll finite and modest
    assert(r.getDouble(2) > 0 && r.getDouble(2) < 1.5, s"nll3 ${r.getDouble(2)}")
  }

  test("backoffScore: backoff ladder — unseen trigram falls to bigram, unseen word to the floor") {
    val lm = LmOps.trainBackoffLm(train, "body", "id")
    // "dog sat on" unseen as trigram ctx (a,dog,sat seen; dog-sat bigram seen)
    val inDomain = LmOps.backoffScore(Seq((1L, "the cat sat on the mat")).toDF("id", "body"), lm, "body", "id")
      .head().getDouble(2)
    val mixed = LmOps.backoffScore(Seq((1L, "the dog sat on the rug")).toDF("id", "body"), lm, "body", "id")
      .head().getDouble(2)
    val alien = LmOps.backoffScore(Seq((1L, "zx qy wv ut")).toDF("id", "body"), lm, "body", "id")
      .head().getDouble(2)
    assert(inDomain < mixed, s"$inDomain vs $mixed")
    assert(mixed < alien, s"$mixed vs $alien")
  }

  test("trigrams: double-BOS positions") {
    val t = LmOps.trigrams(Seq((1L, "a b c")).toDF("id", "body"), "body", "id")
      .select("w1", "w2", "w3").collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(t.toSeq == Seq(("<s>", "<s>", "a"), ("<s>", "a", "b"), ("a", "b", "c")))
  }

  test("multiSplitWith: ordered cuts partition the bucket space") {
    val df = (0L until 10000L).map(i => Tuple1(i)).toDF("id")
    val out = SplitOps.multiSplitWith(df, col("id"),
        Seq("train" -> 0.7, "val" -> 0.15, "test" -> 0.15))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("train" -> 7000L, "val" -> 1500L, "test" -> 1500L))
  }

  test("scriptProfile: fractions by codepoint class and argmax script") {
    val df = Seq((1L, "abc 123"), (2L, "数据处理"), (3L, "---")).toDF("id", "body")
    val rows = TextOps.scriptProfile(df, "id", "body").collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = rows(1L) // 3 latin, 1 space, 3 digits of 7
    assert(math.abs(r1.getDouble(2) - 3.0 / 7.0) < 1e-8)
    assert(math.abs(r1.getDouble(5) - 3.0 / 7.0) < 1e-8)
    assert(r1.getString(8) == "latin")
    assert(rows(2L).getString(8) == "han" && rows(2L).getDouble(3) == 1.0)
    assert(rows(3L).getString(8) == "und" && rows(3L).getDouble(7) == 1.0)
  }
}
