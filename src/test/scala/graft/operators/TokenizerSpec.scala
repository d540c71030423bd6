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

  test("train-side segmentation matches the encode kernel (SQL-literal escape regression)") {
    // under the old expr()-string path, unescapeSQLString turned
    // \x0B and \f into the LITERAL chars x/0/B/f — 'fox' was split
    // at train time and (f,o) could never be the first merge
    val df = Seq((1L, "fox fox")).toDF("id", "text")
    val c = TokenizerOps.trainBpe(df, "text", vocabSize = 257)
    assert(c.mergePairs(0) === (('f'.toLong << 32) | 'o'.toLong))
    // vertical tab is whitespace on BOTH sides: it segments alone
    // and never merges into a letter run
    val df2 = Seq((1L, "ab\u000Bab ab\u000Bab")).toDF("id", "text")
    val c2 = TokenizerOps.trainBpe(df2, "text", vocabSize = 258)
    assert(c2.encode("ab\u000Bab").toSeq === Seq(c2.mergeIds(0), 0x0B, c2.mergeIds(0)))
  }

  test("heap-based encode equals the round-based reference formulation on random text") {
    def referenceEncode(c: TokenizerOps.BpeCodec, text: String): Seq[Int] = {
      val ws = Set(' ', '\t', '\n', '\u000B', '\f', '\r')
      val ranks = c.mergePairs.zipWithIndex.toMap
      def key(a: Int, b: Int): Long = (a.toLong << 32) | (b.toLong & 0xffffffffL)
      val out = scala.collection.mutable.ArrayBuffer[Int]()
      var i = 0
      while (i < text.length) {
        val w = ws(text.charAt(i)); val st = i
        while (i < text.length && ws(text.charAt(i)) == w) i += 1
        var ids = text.substring(st, i).getBytes("UTF-8").map(_ & 0xff).toVector
        var cont = ids.length > 1
        while (cont) {
          val best = ids.indices.dropRight(1).flatMap(j => ranks.get(key(ids(j), ids(j + 1)))).minOption
          best match {
            case None => cont = false
            case Some(r) =>
              val k = c.mergePairs(r); val nid = c.mergeIds(r)
              val buf = scala.collection.mutable.ArrayBuffer[Int]()
              var j = 0
              while (j < ids.length) {
                if (j < ids.length - 1 && key(ids(j), ids(j + 1)) == k) { buf += nid; j += 2 }
                else { buf += ids(j); j += 1 }
              }
              ids = buf.toVector
              cont = ids.length > 1
          }
        }
        out ++= ids
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(42)
    val alphabet = "the quick brown fox jumps over lazy dog num 0123 \t\n\u000B\f\ré"
    val strs = (1 to 300).map(_ =>
      (0 until rnd.nextInt(80)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    strs.foreach { s =>
      assert(codec.encode(s).toSeq === referenceEncode(codec, s), s"mismatch on ${s.take(40)}")
    }
  }

  test("space-free documents encode in near-linear time (heap formulation, not O(n^2))") {
    // 200 KB of CJK-ish space-free text; the old rescan loop would
    // take minutes here, the heap version milliseconds
    val big = "你好世界" * 50000
    val t0 = System.nanoTime()
    val ids = codec.encode(big)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(codec.decode(ids) === big)
    assert(secs < 5.0, f"encode took $secs%.1f s")
  }

  test("chunkByTokens: overlap=0 chunks reassemble byte-exactly; budget respected; empty doc kept") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(80)
      .select($"doc_id", $"text")
      .union(Seq((90001L, "")).toDF("doc_id", "text"))
    val c = TokenizerOps.trainBpe(docs, "text", vocabSize = 400)
    val chunks = TokenizerOps.chunkByTokens(docs, "doc_id", "text", c, maxTokens = 32).cache()
    assert(chunks.filter($"n_tokens" > 32).count() === 0)
    val reassembled = chunks.groupBy($"doc_id")
      .agg(array_join(transform(array_sort(collect_list(struct($"chunk_id", $"chunk_text"))),
        x => x.getField("chunk_text")), "").as("re"))
    val bad = reassembled.join(docs, "doc_id").filter($"re" =!= $"text").count()
    assert(bad === 0)
    // the empty doc still yields its one (empty) chunk
    assert(chunks.filter($"doc_id" === 90001L).count() === 1)
    chunks.unpersist()
  }

  test("chunkByTokens: overlapping windows share exactly `overlap` tokens of context") {
    val doc = Seq((1L, ("tok " * 100).trim)).toDF("doc_id", "text")
    val out = TokenizerOps.chunkByTokens(doc, "doc_id", "text", codec, maxTokens = 16, overlap = 4)
      .orderBy("chunk_id").collect()
    val fullIds = codec.encode(("tok " * 100).trim)
    out.zipWithIndex.foreach { case (r, i) =>
      val start = i * 12 // stride = 16 - 4
      val expect = fullIds.slice(start, start + 16)
      assert(r.getLong(3) === expect.length.toLong, s"chunk $i token count")
      assert(r.getString(2) === codec.decode(expect), s"chunk $i text")
    }
    // every token covered: last chunk reaches the end
    assert((out.length - 1) * 12 + 16 >= fullIds.length)
  }

  test("tokenizer.json round trip reproduces the codec exactly — arrays and encode ids") {
    val json = BpeInterop.exportTokenizerJson(codec)
    // the serialized form is the public HF layout
    assert(json.contains("\"type\" : \"BPE\"") && json.contains("\"merges\""), json.take(400))
    val back = BpeInterop.importTokenizerJson(json)
    assert(back.vocab.length === codec.vocab.length)
    assert(back.vocab.zip(codec.vocab).forall { case (a, b) => a.sameElements(b) })
    assert(back.mergePairs.toSeq === codec.mergePairs.toSeq)
    assert(back.mergeIds.toSeq === codec.mergeIds.toSeq)
    val texts = Seq("the quick brown fox number 7", "café 你好 😀", "", "   spaced   out ")
    texts.foreach { s =>
      assert(back.encode(s).toSeq === codec.encode(s).toSeq, s"ids diverged on: $s")
      assert(back.decode(back.encode(s)) === s)
    }
  }

  test("foreign tokenizer.json: shuffled base ids and special tokens import with preserved boundaries") {
    // a hand-written byte-level file the way HF writes GPT-2-style
    // tokenizers: base tokens NOT at ids 0..255, one merge-built
    // token, one added special no merge produces, array-form merges
    // (built through Jackson — byte tokens include '"' and '\\',
    // which need real JSON escaping)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    val model = root.putObject("model")
    model.put("type", "BPE")
    val vocab = model.putObject("vocab")
    (0 until 256).foreach(b => vocab.put(BpeInterop.byteToChar(b).toString, 1000 + b))
    vocab.put("ab", 5)
    vocab.put("<|endoftext|>", 6)
    val mergeArr = model.putArray("merges").addArray()
    mergeArr.add("a")
    mergeArr.add("b")
    val c = BpeInterop.importTokenizerJson(mapper.writeValueAsString(root))
    // internal layout: bytes at 0..255, merged 'ab' at 256, special appended
    assert(c.encode("ab abx").toSeq === Seq(256, 32, 256, 'x'.toInt))
    assert(c.decode(c.encode("ab abx")) === "ab abx")
    assert(c.tokenString(257) === "<|endoftext|>")
    // non-byte-level files fail loudly
    val bad = """{"model":{"type":"BPE","vocab":{"a":0},"merges":[]}}"""
    intercept[IllegalArgumentException](BpeInterop.importTokenizerJson(bad))
    intercept[IllegalArgumentException](
      BpeInterop.importTokenizerJson("""{"model":{"type":"WordPiece","vocab":{},"merges":[]}}"""))
  }

  test("committed GPT-2-layout tokenizer.json fixture: real-world geometry imports intact") {
    // src/test/resources/gpt2_mini_tokenizer.json reproduces the
    // REAL GPT-2 file layout (public HF serialization): byte tokens
    // at codepoint-sorted ids ("t"=83, "Ġ"=220 — not graft's byte
    // order), the first ten real GPT-2 merges at 256..265 in rank
    // order ("Ġ t" … "a t", incl. the chained "Ġt he" → "Ġthe" at
    // 262), and <|endoftext|> as an added special at 266.
    val json = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/gpt2_mini_tokenizer.json").toURI)), java.nio.charset.StandardCharsets.UTF_8)
    val c = BpeInterop.importTokenizerJson(json)
    assert(c.vocab.length === 267)
    // internal remap: bytes at 0..255, merged tokens in merge-rank
    // order — byte SEQUENCES preserved exactly
    assert(c.tokenString(256) === " t") // "Ġ t", merge rank 0
    assert(c.tokenString(262) === " the") // the "Ġt he" chain product
    assert(c.tokenString(266) === "<|endoftext|>")
    // encode under graft's whitespace-run segmentation: merges that
    // cross a space boundary (Ġt, Ġthe) import fine (decodable, byte
    // sequences intact) but never fire at encode time — " the"
    // splits into a space segment + "the", which the in-word merge
    // "h e" compresses to t+he
    assert(c.encode(" the").toSeq === Seq(' '.toInt, 't'.toInt, 258))
    assert(c.encode("the").toSeq === Seq('t'.toInt, 258))
    // decode identity on text the mini-merge table only partly covers
    val s = "in the rain at noon: the theory"
    assert(c.decode(c.encode(s)) === s)
    // re-export (graft layout) → re-import is id-exact
    val back = BpeInterop.importTokenizerJson(BpeInterop.exportTokenizerJson(c))
    assert(back.encode(s).toSeq === c.encode(s).toSeq)
  }

  test("export fails loudly on duplicate token byte sequences (JSON-object vocab cannot hold them)") {
    val dupVocab = Array.tabulate(256)(i => Array(i.toByte)) ++
      Array("ab".getBytes("UTF-8"), "ab".getBytes("UTF-8"))
    val dup = new TokenizerOps.BpeCodec(dupVocab, Array.empty[Long], Array.empty[Int])
    val e = intercept[IllegalArgumentException](BpeInterop.exportTokenizerJson(dup))
    assert(e.getMessage.contains("duplicate") || e.getMessage.contains("share the token string"))
  }

  test("vocabSize caps merges; exhausted pair space stops early instead of looping") {
    val tiny = Seq((1L, "aa")).toDF("id", "text")
    val c = TokenizerOps.trainBpe(tiny, "text", vocabSize = 1000)
    // only pairs derivable from "aa": (a,a) then (aa,?) nothing — few merges
    assert(c.vocabSize < 270, s"got ${c.vocabSize}")
    assert(c.decode(c.encode("aaaa")) === "aaaa")
  }
}
