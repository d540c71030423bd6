package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = {
    val docs = (1 to 50).map { i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog number $i " * 3)
    }
    docs.toDF("doc_id", "text")
  }
  private lazy val codec = TokenizerOps.trainBpe(corpus, "text", vocabSize = 300)

  test("hand-checked merges: 'ab' corpus learns (a,b) first; encode uses it") {
    val df = Seq((1L, "ab ab ab"), (2L, "abab")).toDF("id", "text")
    val c = TokenizerOps.trainBpe(df, "text", vocabSize = 257)
    assert(c.mergePairs.length === 1)
    assert(c.mergePairs(0) === ((97L << 32) | 98L)) // ('a','b')
    assert(c.encode("ab").toSeq === Seq(256))
    assert(c.encode("abab").toSeq === Seq(256, 256))
    assert(c.encode("ba").toSeq === Seq(98, 97)) // no merge applies
    assert(c.decode(Array(256, 256)) === "abab")
  }

  test("round trip is exact on arbitrary unicode, whitespace runs, and the empty string") {
    val nasty = Seq(
      "",
      " ",
      "  leading and   interior   runs\t\ttabs\nnewlines\r\n",
      "café résumé naïve",
      "你好世界 こんにちは",
      "mixed é你 ascii 123 !@# $%^",
      "😀 emoji 🎉 pairs",
      "á combining vs á precomposed")
    nasty.foreach { s =>
      assert(codec.decode(codec.encode(s)) === s, s"round-trip broke on: ${s.take(40)}")
    }
  }

  test("training compresses: frequent words become single tokens, ratio well under byte-level") {
    // "the " appears ~300 times in the corpus — must have merged fully
    val ids = codec.encode("the")
    assert(ids.length === 1, s"'the' should be one token, got ${ids.length}")
    val sample = "the quick brown fox jumps over the lazy dog"
    val n = codec.encode(sample).length
    assert(n < sample.getBytes("UTF-8").length / 2, s"$n tokens for ${sample.length} bytes")
  }

  test("training is deterministic") {
    val c2 = TokenizerOps.trainBpe(corpus, "text", vocabSize = 300)
    assert(codec.mergePairs.toSeq === c2.mergePairs.toSeq)
    assert(codec.mergeIds.toSeq === c2.mergeIds.toSeq)
  }

  test("expressions: encode/decode round-trip a real column under strict codegen, nulls pass through") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
        .select($"doc_id", $"text")
      val c = TokenizerOps.trainBpe(docs, "text", vocabSize = 400)
      val rt = docs.select($"doc_id", $"text",
        TokenizerOps.decode(TokenizerOps.encode($"text", c), c).as("rt"),
        size(TokenizerOps.encode($"text", c)).as("n_tok"),
        octet_length($"text").as("n_bytes"))
      assert(rt.filter(($"rt" =!= $"text") || $"rt".isNull).count() === 0)
      // byte-level BPE can never exceed one token per byte
      assert(rt.filter($"n_tok" > $"n_bytes").count() === 0)
      val withNull = Seq((1L, "x y"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
      val out = withNull.select(TokenizerOps.encode($"text", c).as("ids")).collect()
      assert(out.count(_.isNullAt(0)) === 1)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("vocabSize caps merges; exhausted pair space stops early instead of looping") {
    val tiny = Seq((1L, "aa")).toDF("id", "text")
    val c = TokenizerOps.trainBpe(tiny, "text", vocabSize = 1000)
    // only pairs derivable from "aa": (a,a) then (aa,?) nothing — few merges
    assert(c.vocabSize < 270, s"got ${c.vocabSize}")
    assert(c.decode(c.encode("aaaa")) === "aaaa")
  }
}
