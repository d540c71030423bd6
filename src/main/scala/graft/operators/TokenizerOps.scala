package graft.operators

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
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

  /** Java-regex form of [[isSegWs]]'s char set. Only ever passed as
    * a COLUMN literal (`lit(SegmentPattern)`) — routing it through a
    * SQL string literal would corrupt it: Spark's unescapeSQLString
    * rewrites `\x0B` to the literal chars 'x','0','B' and `\f` to
    * 'f', silently making letters "whitespace" at train time while
    * the encode kernel uses the real set.
    */
  private val SegmentPattern = "[ \\t\\n\\x0B\\f\\r]+|[^ \\t\\n\\x0B\\f\\r]+"

  /** adjacent-pair key: left id in the high 32 bits, right in the low. */
  @inline private def pairKey(a: Int, b: Int): Long =
    (a.toLong << 32) | (b.toLong & 0xffffffffL)

  /** Minimal primitive long min-heap — encodeSegment runs per row,
    * and `PriorityQueue[java.lang.Long]` would box every merge
    * candidate on that hot path.
    */
  private final class LongMinHeap(initialCapacity: Int) {
    private var arr = new Array[Long](math.max(4, initialCapacity))
    private var n = 0
    def isEmpty: Boolean = n == 0
    def add(v: Long): Unit = {
      if (n == arr.length) arr = java.util.Arrays.copyOf(arr, n * 2)
      arr(n) = v
      n += 1
      var i = n - 1
      while (i > 0 && arr((i - 1) >> 1) > arr(i)) {
        val p = (i - 1) >> 1
        val t = arr(i); arr(i) = arr(p); arr(p) = t
        i = p
      }
    }
    def poll(): Long = {
      val r = arr(0)
      n -= 1
      arr(0) = arr(n)
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val rr = l + 1
        var m = i
        if (l < n && arr(l) < arr(m)) m = l
        if (rr < n && arr(rr) < arr(m)) m = rr
        if (m == i) done = true
        else { val t = arr(i); arr(i) = arr(m); arr(m) = t; i = m }
      }
      r
    }
  }

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

    /** GPT-2-style greedy encode of one segment's bytes: always
      * apply the LOWEST-RANK applicable merge first (ties leftmost).
      *
      * Linked-list + priority-queue formulation — O(n log n), not
      * the O(n²) rescan-per-merge loop, so a space-free 100 KB CJK
      * document costs ~10⁶ heap ops instead of ~10¹⁰ pair probes.
      * Candidates encode as (rank << 32 | position) longs whose
      * natural order IS (rank, leftmost); stale entries are dropped
      * lazily by re-checking the pair under the position. Order of
      * results is identical to the round-based "apply the best pair
      * everywhere, rescan" formulation: a merge can only CREATE
      * pairs involving its new token, and any merge consuming that
      * token was necessarily learned later, so newly created
      * candidates always rank after the one being applied.
      */
    private def encodeSegment(bytes: Array[Byte], out: mutable.ArrayBuffer[Int]): Unit = {
      val n = bytes.length
      if (n == 0) return
      if (n == 1) { out += (bytes(0) & 0xff); return }
      val ids = new Array[Int](n)
      val prevIdx = new Array[Int](n)
      val nextIdx = new Array[Int](n)
      val alive = new Array[Boolean](n)
      var i = 0
      while (i < n) {
        ids(i) = bytes(i) & 0xff
        prevIdx(i) = i - 1
        nextIdx(i) = i + 1
        alive(i) = true
        i += 1
      }
      val pq = new LongMinHeap(n)
      def push(pos: Int): Unit = {
        val nx = nextIdx(pos)
        if (nx < n) {
          val hit = ranks.get(pairKey(ids(pos), ids(nx)))
          if (hit != null) pq.add((hit(0).toLong << 32) | pos.toLong)
        }
      }
      i = 0
      while (i < n - 1) { push(i); i += 1 }
      while (!pq.isEmpty) {
        val top = pq.poll()
        val rank = (top >>> 32).toInt
        val pos = (top & 0xffffffffL).toInt
        if (alive(pos)) {
          val nx = nextIdx(pos)
          if (nx < n && alive(nx)) {
            val hit = ranks.get(pairKey(ids(pos), ids(nx)))
            // stale unless the pair under this position still maps
            // to the popped rank
            if (hit != null && hit(0) == rank) {
              ids(pos) = hit(1)
              alive(nx) = false
              val nn = nextIdx(nx)
              nextIdx(pos) = nn
              if (nn < n) prevIdx(nn) = pos
              push(pos)
              val pv = prevIdx(pos)
              if (pv >= 0) push(pv)
            }
          }
        }
      }
      var p = 0
      while (p < n) { out += ids(p); p = nextIdx(p) }
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
  case class BpeEncode(child: Expression, codec: BpeCodec) extends UnaryExpression with ImplicitCastInputTypes {
    // return type inferred: AbstractDataType is private[sql]
    override def inputTypes = Seq(StringType)
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
  case class BpeDecode(child: Expression, codec: BpeCodec) extends UnaryExpression with ImplicitCastInputTypes {
    // return type inferred: AbstractDataType is private[sql]
    override def inputTypes = Seq(ArrayType(IntegerType))
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
      .select(explode(regexp_extract_all(col(textCol), lit(SegmentPattern), lit(0))).as("__seg"))
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
          val key = pairKey(word(i), word(i + 1))
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
          words(w) = mergeAll(words(w), bestKey, newId)
          w += 1
        }
        m += 1
      }
    }
    new BpeCodec(vocab.toArray, mergePairs.toArray, mergeIds.toArray)
  }

  /** Split documents into overlapping windows of REAL tokenizer
    * tokens — the LLM-training chunker. Unlike [[MixOps.chunkDocs]]
    * (whitespace tokens, normalized whitespace in the output), the
    * windows here are measured in the same units the training batch
    * consumes, and because byte-level BPE is lossless each chunk's
    * text is the EXACT byte span of the original document —
    * `overlap = 0` chunks concatenate back to the document verbatim
    * (the invariant the driver query oracles via md5).
    *
    * Chunk i covers tokens [i·stride, i·stride + maxTokens), stride
    * = maxTokens − overlap; a doc of n tokens yields 1 + ⌈max(n −
    * maxTokens, 0) / stride⌉ chunks. Pure scan-stage expressions
    * (encode → slice → decode) + one inline generator — zero
    * shuffle.
    */
  def chunkByTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      codec: BpeCodec,
      maxTokens: Int,
      overlap: Int = 0
  ): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens, "overlap must be in [0, maxTokens)")
    val stride = maxTokens - overlap
    val ids = encode(col(textCol), codec)
    val n = size(ids)
    val k = floor((greatest(n - maxTokens, lit(0)) + lit(stride - 1)).cast("double") / stride).cast("int")
    val chunks = transform(sequence(lit(0), k), i => {
      val window = slice(ids, i * stride + 1, lit(maxTokens))
      struct(
        i.cast("long").as("chunk_id"),
        decode(window, codec).as("chunk_text"),
        size(window).cast("long").as("n_tokens"))
    })
    df.select(col(idCol), inline(chunks))
  }

  /** Replace every (left-to-right, non-overlapping) occurrence of
    * the pair `key` with `newId`; returns the input array unchanged
    * when the pair is absent.
    */
  private def mergeAll(word: Array[Int], key: Long, newId: Int): Array[Int] = {
    if (word.length < 2) return word
    var hit = false
    var i = 0
    while (!hit && i < word.length - 1) {
      if (pairKey(word(i), word(i + 1)) == key) hit = true
      i += 1
    }
    if (!hit) return word
    val next = new Array[Int](word.length)
    var out = 0
    var r = 0
    while (r < word.length) {
      if (r < word.length - 1 && pairKey(word(r), word(r + 1)) == key) {
        next(out) = newId; out += 1; r += 2
      } else {
        next(out) = word(r); out += 1; r += 1
      }
    }
    java.util.Arrays.copyOf(next, out)
  }
}
