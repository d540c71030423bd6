package graft.operators

import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.operators.TokenizerOps.BpeCodec

/** HF `tokenizer.json` interop for the byte-level BPE codec — the
  * one interchange format a training-data team actually asks for:
  * the JSON layout is the PUBLIC huggingface/tokenizers serialization
  * (model.type "BPE" + string-keyed vocab + rank-ordered merges),
  * with token strings in the GPT-2 byte↔unicode alphabet (printable
  * stand-ins for raw bytes; the table is the public
  * `bytes_to_unicode` construction from the GPT-2 encoder).
  *
  * Contract:
  *  - [[exportTokenizerJson]] → [[importTokenizerJson]] round-trips
  *    a graft-trained codec EXACTLY (same vocab arrays, same merge
  *    table, byte-identical encode ids) — pinned by q_bpe_interop's
  *    oracle and the spec.
  *  - importing a FOREIGN tokenizer.json (base byte tokens at
  *    arbitrary ids, extra special tokens) remaps ids into graft's
  *    internal layout (single bytes at 0..255, merged tokens in
  *    merge-rank order). Token STRINGS, merge rules — and therefore
  *    token boundaries and decode(encode(x)) = x — are preserved;
  *    the integer ids are graft-internal. Special tokens that no
  *    merge produces are appended after the merged vocab: decodable,
  *    never emitted by encode (graft has no added-token matcher).
  *
  * Parsing rides Jackson (already on every Spark classpath) — no
  * new dependency.
  */
object BpeInterop {

  /** GPT-2 byte→unicode: printable bytes map to themselves, the
    * rest to U+0100.. in byte order. */
  private[operators] lazy val byteToChar: Array[Char] = {
    val direct = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val arr = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (direct(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    arr
  }

  private lazy val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  private[operators] def tokenToString(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(byteToChar(bytes(i) & 0xff)); i += 1 }
    sb.toString
  }

  private[operators] def stringToBytes(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      out(i) = charToByte.getOrElse(s.charAt(i),
        throw new IllegalArgumentException(
          s"token char '${s.charAt(i)}' (U+${s.charAt(i).toInt.toHexString}) is outside " +
            "the byte-level alphabet — not a byte-level BPE tokenizer.json")).toByte
      i += 1
    }
    out
  }

  /** Serialize a codec as a byte-level BPE `tokenizer.json`. */
  def exportTokenizerJson(codec: BpeCodec): String = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("version", "1.0")
    root.putNull("truncation")
    root.putNull("padding")
    root.putArray("added_tokens")
    root.putNull("normalizer")
    val pre = root.putObject("pre_tokenizer")
    pre.put("type", "ByteLevel")
    pre.put("add_prefix_space", false)
    pre.put("trim_offsets", true)
    pre.put("use_regex", true)
    root.putNull("post_processor")
    val dec = root.putObject("decoder")
    dec.put("type", "ByteLevel")
    dec.put("add_prefix_space", true)
    dec.put("trim_offsets", true)
    dec.put("use_regex", true)
    val model = root.putObject("model")
    model.put("type", "BPE")
    model.putNull("dropout")
    model.putNull("unk_token")
    model.putNull("continuing_subword_prefix")
    model.putNull("end_of_word_suffix")
    model.put("fuse_unk", false)
    model.put("byte_fallback", false)
    val vocabNode = model.putObject("vocab")
    // the vocab serializes as a JSON object keyed by token STRING —
    // two ids with identical byte sequences (possible in BPE when
    // distinct merge pairs yield the same concatenation, e.g. (a,bc)
    // and (ab,c)) would silently collapse to one key and break the
    // documented exact round-trip; fail loudly at export time instead
    val seen = new java.util.HashSet[String](codec.vocab.length * 2)
    var id = 0
    while (id < codec.vocab.length) {
      val tok = tokenToString(codec.vocab(id))
      require(seen.add(tok),
        s"vocab ids ${codec.vocab.indexWhere(java.util.Arrays.equals(_, codec.vocab(id)))} and $id " +
          s"share the token string '$tok' — a JSON-object vocab cannot represent duplicate " +
          "byte sequences; this codec does not round-trip through tokenizer.json")
      vocabNode.put(tok, id)
      id += 1
    }
    val mergesNode = model.putArray("merges")
    var i = 0
    while (i < codec.mergePairs.length) {
      val key = codec.mergePairs(i)
      val left = (key >>> 32).toInt
      val right = (key & 0xffffffffL).toInt
      // byte 0x20 maps to Ġ, so token strings never contain a raw
      // space — the "left right" legacy merge format is unambiguous
      mergesNode.add(tokenToString(codec.vocab(left)) + " " + tokenToString(codec.vocab(right)))
      i += 1
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Parse a byte-level BPE `tokenizer.json` into a codec (see the
    * object doc for the id-remap contract on foreign files). */
  def importTokenizerJson(json: String): BpeCodec = {
    val root = new ObjectMapper().readTree(json)
    val model = root.path("model")
    val mtype = model.path("type").asText("")
    require(mtype == "BPE", s"tokenizer.json model.type must be BPE, got '$mtype'")
    val vocabNode = model.path("vocab")
    require(vocabNode.isObject, "tokenizer.json has no model.vocab object")
    val mergesNode = model.path("merges")
    require(mergesNode.isArray, "tokenizer.json has no model.merges array")

    // source token strings in source-id order (for appending
    // merge-unreachable specials deterministically)
    val srcTokens = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
      val it = vocabNode.fields()
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue.asInt())) }
      buf.sortBy(_._2).map(_._1).toArray
    }
    val present = srcTokens.toSet
    // every single-byte token must exist or encode's byte seed can't work
    var b = 0
    while (b < 256) {
      require(present.contains(byteToChar(b).toString),
        s"vocab lacks the base byte token for 0x${b.toHexString} — not byte-level BPE")
      b += 1
    }

    val vocab = scala.collection.mutable.ArrayBuffer.tabulate(256)(i => Array(i.toByte))
    val internalId = scala.collection.mutable.HashMap.empty[String, Int]
    b = 0
    while (b < 256) { internalId(byteToChar(b).toString) = b; b += 1 }

    val mergePairs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mergeIds = scala.collection.mutable.ArrayBuffer.empty[Int]
    val it = mergesNode.elements()
    while (it.hasNext) {
      val m = it.next()
      val (l, r) = splitMerge(m)
      val li = internalId.getOrElse(l,
        throw new IllegalArgumentException(s"merge references unknown token '$l'"))
      val ri = internalId.getOrElse(r,
        throw new IllegalArgumentException(s"merge references unknown token '$r'"))
      val merged = l + r
      val mi = internalId.getOrElseUpdate(merged, {
        vocab += (vocab(li) ++ vocab(ri))
        vocab.length - 1
      })
      mergePairs += ((li.toLong << 32) | (ri.toLong & 0xffffffffL))
      mergeIds += mi
    }
    // merge-unreachable tokens (added specials): decodable tail
    srcTokens.foreach { t =>
      if (!internalId.contains(t)) {
        internalId(t) = vocab.length
        vocab += stringToBytes(t)
      }
    }
    new BpeCodec(vocab.toArray, mergePairs.toArray, mergeIds.toArray)
  }

  private def splitMerge(node: JsonNode): (String, String) =
    if (node.isArray) {
      require(node.size() == 2, s"merge entry must be a pair, got ${node.size()} elements")
      (node.get(0).asText(), node.get(1).asText())
    } else {
      val s = node.asText()
      val sp = s.indexOf(' ')
      require(sp > 0 && sp == s.lastIndexOf(' '), s"malformed merge entry '$s'")
      (s.substring(0, sp), s.substring(sp + 1))
    }
}
