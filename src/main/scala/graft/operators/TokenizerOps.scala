package graft.operators

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE tokenization — train, encode, decode — the
  * tokenizer stage of an LLM data pipeline (token budgeting,
  * sequence packing, vocabulary studies) without any external
  * tokenizer library.
  *
  * Train/encode split follows the classic shape (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units";
  * GPT-2's byte-level variant):
  *
  *  - TRAINING reduces the corpus to a word-frequency dictionary
  *    first — ONE distributed groupBy(segment).count shuffle, then a
  *    bounded top-`maxDictWords` collect (TakeOrderedAndProject, not
  *    a full sort) — and runs the merge loop on the DRIVER over that
  *    dictionary. This is how BPE is trained everywhere (the merge
  *    loop needs global pair counts every iteration; a distributed
  *    formulation would be one all-reduce per merge — thousands of
  *    barriers); the scale-sensitive part, counting words over 100
  *    TB of text, IS distributed, and the driver side is bounded by
  *    the dictionary cap, not the corpus.
  *  - ENCODE/DECODE are pure per-row kernels (custom Expressions
  *    with `doGenCode`; the codec rides into generated code as a
  *    reference object) — zero shuffle, inline in whole-stage
  *    codegen with the scan.
  *
  * Byte-level with a 256-entry base alphabet: NO unknown tokens, and
  * decode(encode(text)) == text EXACTLY for any input — the
  * round-trip is what the driver query oracles (md5 parity against
  * the raw column). Pre-tokenization splits text into maximal runs
  * of ASCII whitespace / non-whitespace (both kinds become words, so
  * indentation-heavy corpora learn whitespace tokens); merges never
  * cross a segment boundary, at train or at encode time.
  */
object TokenizerOps {

  /** chars treated as whitespace by the segmenter — EXACTLY Java
    * regex \s, so the training-side `regexp_extract_all` and the
    * encode-side kernel segment identically.
    */
  private def isSegWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private val SegmentPattern = "[ \\t\\n\\x0B\\f\\r]+|[^ \\t\\n\\x0B\\f\\r]+"

  /** Trained codec: vocab id → byte sequence (ids 0..255 are the
    * single bytes), plus the merge table as parallel arrays
    * (pairKey = left<<32|right, in rank order). The encode-side
    * rank lookup builds lazily per executor.
    */
  final class BpeCodec(
      val vocab: Array[Array[Byte]],
      val mergePairs: Array[Long],
      val mergeIds: Array[Int]
  ) extends Serializable {
    require(vocab.length >= 256, "vocab must contain the 256 base byte tokens")
    require(mergePairs.length == mergeIds.length, "merge arrays must align")

    def vocabSize: Int = vocab.length

    /** pairKey → (rank, mergedId); rebuilt lazily after deserialization. */
    @transient private var rankMap: java.util.HashMap[java.lang.Long, Array[Int]] = _

    private def ranks: java.util.HashMap[java.lang.Long, Array[Int]] = {
      if (rankMap == null) {
        val m = new java.util.HashMap[java.lang.Long, Array[Int]](mergePairs.length * 2)
        var i = 0
        while (i < mergePairs.length) {
          m.put(mergePairs(i), Array(i, mergeIds(i)))
          i += 1
        }
        rankMap = m
      }
      rankMap
    }

    /** GPT-2-style greedy encode of one segment's bytes: repeatedly
      * apply the LOWEST-RANK applicable merge until none applies.
      */
    private def encodeSegment(bytes: Array[Byte], out: mutable.ArrayBuffer[Int]): Unit = {
      if (bytes.isEmpty) return
      var ids = new Array[Int](bytes.length)
      var i = 0
      while (i < bytes.length) { ids(i) = bytes(i) & 0xff; i += 1 }
      var n = ids.length
      var done = false
      while (!done && n > 1) {
        // find the lowest-rank adjacent pair
        var bestRank = Int.MaxValue
        var bestId = -1
        var j = 0
        while (j < n - 1) {
          val hit = ranks.get((ids(j).toLong << 32) | (ids(j + 1).toLong & 0xffffffffL))
          if (hit != null && hit(0) < bestRank) { bestRank = hit(0); bestId = hit(1) }
          j += 1
        }
        if (bestId < 0) done = true
        else {
          // merge every occurrence of that pair left-to-right
          val pair = mergePairs(bestRank)
          val next = new Array[Int](n)
          var w = 0
          var r = 0
          while (r < n) {
            if (r < n - 1 && ((ids(r).toLong << 32) | (ids(r + 1).toLong & 0xffffffffL)) == pair) {
              next(w) = bestId; w += 1; r += 2
            } else {
              next(w) = ids(r); w += 1; r += 1
            }
          }
          ids = next
          n = w
        }
      }
      var k = 0
      while (k < n) { out += ids(k); k += 1 }
    }

    def encode(text: String): Array[Int] = {
      val out = new mutable.ArrayBuffer[Int](text.length / 3 + 1)
      var i = 0
      val n = text.length
      while (i < n) {
        val ws = isSegWs(text.charAt(i))
        val start = i
        while (i < n && isSegWs(text.charAt(i)) == ws) i += 1
        encodeSegment(text.substring(start, i).getBytes(StandardCharsets.UTF_8), out)
      }
      out.toArray
    }

    def decode(ids: Array[Int]): String = {
      var len = 0
      var i = 0
      while (i < ids.length) { len += vocab(ids(i)).length; i += 1 }
      val bytes = new Array[Byte](len)
      var off = 0
      i = 0
      while (i < ids.length) {
        val v = vocab(ids(i))
        System.arraycopy(v, 0, bytes, off, v.length)
        off += v.length
        i += 1
      }
      new String(bytes, StandardCharsets.UTF_8)
    }

    def tokenString(id: Int): String = new String(vocab(id), StandardCharsets.UTF_8)
  }

  // ---- static kernels, invoked from eval and generated code ----

  def encodeKernel(text: UTF8String, codec: BpeCodec): ArrayData =
    new GenericArrayData(codec.encode(text.toString))

  def decodeKernel(ids: ArrayData, codec: BpeCodec): UTF8String = {
    val n = ids.numElements()
    val arr = new Array[Int](n)
    var i = 0
    while (i < n) { arr(i) = ids.getInt(i); i += 1 }
    UTF8String.fromString(codec.decode(arr))
  }

  /** text → array<int> token ids. */
  case class BpeEncode(child: Expression, codec: BpeCodec) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "bpe_encode"
    override protected def withNewChildInternal(newChild: Expression): BpeEncode = copy(child = newChild)

    override def nullSafeEval(input: Any): Any =
      encodeKernel(input.asInstanceOf[UTF8String], codec)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftBpeCodec", codec, classOf[BpeCodec].getName)
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.operators.TokenizerOps.encodeKernel($t, $ref);")
    }
  }

  /** array<int> token ids → text. */
  case class BpeDecode(child: Expression, codec: BpeCodec) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "bpe_decode"
    override protected def withNewChildInternal(newChild: Expression): BpeDecode = copy(child = newChild)

    override def nullSafeEval(input: Any): Any =
      decodeKernel(input.asInstanceOf[ArrayData], codec)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftBpeCodec", codec, classOf[BpeCodec].getName)
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.operators.TokenizerOps.decodeKernel($t, $ref);")
    }
  }

  def encode(c: Column, codec: BpeCodec): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(c), codec))

  def decode(c: Column, codec: BpeCodec): Column =
    ColumnBridge.column(BpeDecode(ColumnBridge.expression(c), codec))

  /** Train a byte-level BPE codec of `vocabSize` tokens (256 base
    * bytes + vocabSize−256 merges) on `textCol`.
    *
    * Distributed part: segment every document and count segment
    * frequencies — one partial-agg shuffle whose width is the
    * DISTINCT segment count, not the corpus; the merge loop then
    * sees only the top `maxDictWords` (by count, ties by segment —
    * deterministic) dictionary entries. The cap is the explicit
    * driver bound (same contract as the label dictionary / IVF
    * sample): rare tail segments beyond it contribute nothing to
    * pair statistics that matters at these frequencies.
    *
    * Merge selection: highest pair count, ties by (left id, right
    * id) ascending — fully deterministic for a fixed corpus.
    */
  def trainBpe(
      df: DataFrame,
      textCol: String,
      vocabSize: Int,
      maxDictWords: Int = 100000
  ): BpeCodec = {
    require(vocabSize >= 256, s"vocabSize must be >= 256, got $vocabSize")
    require(maxDictWords > 0, "maxDictWords must be positive")
    val dict: Array[(String, Long)] = df
      .select(explode(expr(s"regexp_extract_all(${quoteCol(textCol)}, '$SegmentPattern', 0)")).as("__seg"))
      .groupBy(col("__seg")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__seg"))
      .limit(maxDictWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    // driver merge loop over the bounded dictionary
    val words: Array[Array[Int]] = dict.map(_._1.getBytes(StandardCharsets.UTF_8).map(_ & 0xff))
    val counts: Array[Long] = dict.map(_._2)
    val vocab = mutable.ArrayBuffer.tabulate(256)(b => Array(b.toByte))
    val mergePairs = mutable.ArrayBuffer.empty[Long]
    val mergeIds = mutable.ArrayBuffer.empty[Int]

    val nMerges = vocabSize - 256
    var m = 0
    var exhausted = false
    while (m < nMerges && !exhausted) {
      // count adjacent pairs, weighted by word frequency
      val pairCounts = new mutable.LongMap[Long]()
      var w = 0
      while (w < words.length) {
        val word = words(w)
        val c = counts(w)
        var i = 0
        while (i < word.length - 1) {
          val key = (word(i).toLong << 32) | (word(i + 1).toLong & 0xffffffffL)
          pairCounts(key) = pairCounts.getOrElse(key, 0L) + c
          i += 1
        }
        w += 1
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        var bestKey = 0L
        var bestCount = -1L
        pairCounts.foreachEntry { (k, v) =>
          if (v > bestCount || (v == bestCount && k < bestKey)) { bestKey = k; bestCount = v }
        }
        val left = (bestKey >> 32).toInt
        val right = (bestKey & 0xffffffffL).toInt
        val newId = vocab.length
        vocab += (vocab(left) ++ vocab(right))
        mergePairs += bestKey
        mergeIds += newId
        // apply the merge to every word
        w = 0
        while (w < words.length) {
          val word = words(w)
          if (word.length > 1) {
            var hit = false
            var i = 0
            while (!hit && i < word.length - 1) {
              if (((word(i).toLong << 32) | (word(i + 1).toLong & 0xffffffffL)) == bestKey) hit = true
              i += 1
            }
            if (hit) {
              val next = new Array[Int](word.length)
              var out = 0
              var r = 0
              while (r < word.length) {
                if (r < word.length - 1 && ((word(r).toLong << 32) | (word(r + 1).toLong & 0xffffffffL)) == bestKey) {
                  next(out) = newId; out += 1; r += 2
                } else {
                  next(out) = word(r); out += 1; r += 1
                }
              }
              words(w) = java.util.Arrays.copyOf(next, out)
            }
          }
          w += 1
        }
        m += 1
      }
    }
    new BpeCodec(vocab.toArray, mergePairs.toArray, mergeIds.toArray)
  }

  private def quoteCol(name: String): String = s"`${name.replace("`", "``")}`"
}
