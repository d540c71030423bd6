package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Single-pass hash expressions for dedup at scale.
  *
  * The composable `functions._` formulations (64 nested
  * `aggregate`/`transform` calls per row) are semantically fine but
  * allocate intermediate Catalyst arrays per hash per row — at
  * billions of documents that's the hot path. These expressions do
  * one tight JVM loop per row: hash each token once, then O(k)
  * cheap long-mixes. Every expression implements `doGenCode`
  * calling a static kernel, so they inline into whole-stage
  * codegen — no per-row virtual eval dispatch, and the surrounding
  * project/filter stays one generated function.
  */
object HashExpressions {

  private def mixLong(v: Long, seed: Long): Long = XXH64.hashLong(v, seed)

  // ---- static kernels, invoked both from eval and generated code ----

  /** Single-pass 64-bit simhash over a token array. */
  def simhashKernel(arr: ArrayData, seed: Long): Long =
    simhashVoteKernel(hashTokenArray(arr, seed))

  /** xxh64 of each non-null element of a token array. */
  private def hashTokenArray(arr: ArrayData, seed: Long): Array[Long] = {
    val n = arr.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Long](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) out += XXH64.hashUTF8String(arr.getUTF8String(i), seed)
      i += 1
    }
    out.toArray
  }

  /** Fused minhash signature + LSH band keys. */
  def minhashBandKernel(arr: ArrayData, numHashes: Int, rowsPerBand: Int, seed: Long): ArrayData = {
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = arr.getLong(i)
        var k = 0
        while (k < numHashes) {
          val h = mixLong(base, seed + k)
          if (h < sig(k)) sig(k) = h
          k += 1
        }
      }
      i += 1
    }
    val nBands = numHashes / rowsPerBand
    val bands = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var acc = 0x9e3779b97f4a7c15L + b
      var r = b * rowsPerBand
      while (r < (b + 1) * rowsPerBand) {
        acc = mixLong(acc ^ sig(r), seed)
        r += 1
      }
      bands(b) = acc
      b += 1
    }
    new GenericArrayData(bands)
  }

  /** Distinct word-n-gram shingle hashes straight from tokens
    * (null tokens keep hash 0 so window positions are preserved).
    */
  def shingleKernel(arr: ArrayData, n: Int, seed: Long): ArrayData = {
    val nTok = arr.numElements()
    val tokHash = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      if (!arr.isNullAt(i)) tokHash(i) = XXH64.hashUTF8String(arr.getUTF8String(i), seed)
      i += 1
    }
    shingleFromHashesKernel(tokHash, n, seed)
  }

  /** Token char classes matching the `[^\p{L}\p{N}]+` split in
    * [[TextFunctions.tokens]]: Unicode letters + all number
    * categories (Nd, Nl, No — note: broader than isDigit).
    */
  private def isTokenChar(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.UPPERCASE_LETTER || t == Character.LOWERCASE_LETTER ||
    t == Character.TITLECASE_LETTER || t == Character.MODIFIER_LETTER ||
    t == Character.OTHER_LETTER ||
    t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
    t == Character.OTHER_NUMBER
  }

  /** Tokenize + hash in ONE pass over the raw text: walk the
    * lowercased string, hash each letter/digit run directly — no
    * regex, no array of token strings, no filter pass. Produces
    * exactly the hashes `xxh64(token, seed)` over
    * `TextFunctions.tokens(text)` would (same lowercasing, same
    * char classes), so every downstream kernel (simhash votes,
    * shingle mixing, minhash) is bit-identical.
    */
  def tokenHashKernel(text: org.apache.spark.unsafe.types.UTF8String, seed: Long): Array[Long] = {
    val lowered = text.toLowerCase.toString
    val n = lowered.length
    val out = new scala.collection.mutable.ArrayBuffer[Long](math.min(64, n / 5 + 1))
    var i = 0
    while (i < n) {
      val cp = lowered.codePointAt(i)
      if (isTokenChar(cp)) {
        val start = i
        var c = cp
        while (i < n && isTokenChar(c)) {
          i += Character.charCount(c)
          if (i < n) c = lowered.codePointAt(i)
        }
        out += XXH64.hashUTF8String(
          org.apache.spark.unsafe.types.UTF8String.fromString(lowered.substring(start, i)), seed)
      } else i += Character.charCount(cp)
    }
    out.toArray
  }

  /** Per-bit majority vote over precomputed token hashes. */
  def simhashVoteKernel(hashes: Array[Long]): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < hashes.length) {
      val h = hashes(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Distinct n-gram shingle hashes over precomputed token hashes. */
  def shingleFromHashesKernel(tokHash: Array[Long], n: Int, seed: Long): ArrayData = {
    val nTok = tokHash.length
    val count = math.max(nTok - n + 1, if (nTok > 0) 1 else 0)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](count)
    var w = 0
    while (w < count) {
      var acc = seed
      var j = w
      val end = math.min(w + n, nTok)
      while (j < end) { acc = mixLong(acc ^ tokHash(j), seed); j += 1 }
      if (seen.add(acc)) out += acc
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  def simhashTextKernel(text: org.apache.spark.unsafe.types.UTF8String, seed: Long): Long =
    simhashVoteKernel(tokenHashKernel(text, seed))

  def shingleTextKernel(text: org.apache.spark.unsafe.types.UTF8String, n: Int, seed: Long): ArrayData =
    shingleFromHashesKernel(tokenHashKernel(text, seed), n, seed)

  /** Random-hyperplane LSH bits packed into a long. */
  def hyperplaneKernel(arr: ArrayData, nBits: Int, seed: Long, elemIsFloat: Boolean): Long = {
    val n = arr.numElements()
    val acc = new Array[Double](nBits)
    var d = 0
    while (d < n) {
      if (!arr.isNullAt(d)) {
        val v = if (elemIsFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        var i = 0
        while (i < nBits) {
          // (bit, dim) packed into the hash INPUT, seed kept as the
          // true hash seed: `seed + i` as the seed made hyperplane
          // identity a function of the SUM, so consecutive seeds
          // produced shifted copies of the same hyperplane sequence
          // and multi-table LSH (distinct seeds per table) shared
          // all but one plane per table — no OR-amplification.
          val s = if ((XXH64.hashLong((i.toLong << 32) | (d.toLong & 0xffffffffL), seed) & 1L) == 0L) v else -v
          acc(i) += s
          i += 1
        }
      }
      d += 1
    }
    var bits = 0L
    var i = 0
    while (i < nBits) { if (acc(i) >= 0) bits |= (1L << i); i += 1 }
    bits
  }

  /** 64-bit SimHash over an array<string> of tokens: per-bit
    * majority vote of per-token xxhash64 values. `doGenCode` calls
    * the static kernel so the expression inlines into whole-stage
    * codegen next to the tokenizer feeding it.
    */
  case class SimHash64(child: Expression, seed: Long) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"
    override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(child = newChild)

    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(simhashKernel(input.asInstanceOf[ArrayData], seed))

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
    ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.HashExpressions.simhashKernel($a, ${seed}L);")
  }

  /** MinHash signature + LSH banding fused into one pass.
    *
    * Input: array<long> of (already hashed) shingles — see
    * [[ShingleHashes]]. Output: array<long> of
    * numHashes/rowsPerBand band keys. The k hash family values per
    * shingle are cheap long mixes of its base hash
    * (h_i = xxh64(base, seed+i)), the standard seeded-family
    * MinHash construction.
    */
  case class MinHashBandKeys(child: Expression, numHashes: Int, rowsPerBand: Int, seed: Long)
      extends UnaryExpression {
    require(numHashes % rowsPerBand == 0, "numHashes must be divisible by rowsPerBand")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_band_keys"
    override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys = copy(child = newChild)

    override def nullSafeEval(input: Any): Any =
      minhashBandKernel(input.asInstanceOf[ArrayData], numHashes, rowsPerBand, seed)

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
    ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.HashExpressions.minhashBandKernel($a, $numHashes, $rowsPerBand, ${seed}L);")
  }

  /** Word n-gram shingle HASHES straight from a token array — skips
    * building shingle strings entirely (a shingle's hash is a mix
    * chain over its tokens' hashes). Distinct-ified.
    */
  case class ShingleHashes(child: Expression, n: Int, seed: Long)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hashes"
    override protected def withNewChildInternal(newChild: Expression): ShingleHashes = copy(child = newChild)

    override def nullSafeEval(input: Any): Any =
      shingleKernel(input.asInstanceOf[ArrayData], n, seed)

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
    ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.HashExpressions.shingleKernel($a, $n, ${seed}L);")
  }

  /** Random-hyperplane LSH bits fused into one pass over the
    * vector: bit_i = sign(Σ_d v[d]·s_id) where s_id ∈ {±1} is
    * derived from xxh64(seed+i, d) — the implicit projection
    * "matrix" is the hash function, identical on every executor,
    * nothing to broadcast. Replaces an O(bits) stack of
    * aggregate(zip_with(sequence…)) Catalyst trees.
    */
  case class HyperplaneLsh(child: Expression, nBits: Int, seed: Long)
      extends UnaryExpression {
    require(nBits >= 1 && nBits <= 63, "nBits in [1,63]")
    override def dataType: DataType = LongType
    override def prettyName: String = "hyperplane_lsh"
    override protected def withNewChildInternal(newChild: Expression): HyperplaneLsh = copy(child = newChild)

    private lazy val elemIsFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(hyperplaneKernel(input.asInstanceOf[ArrayData], nBits, seed, elemIsFloat))

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
    ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.HashExpressions.hyperplaneKernel($a, $nBits, ${seed}L, $elemIsFloat);")
  }

  /** Cosine similarity fused into one primitive pass (float or
    * double arrays; math in double, sequential left-to-right — the
    * same fold order as the composable `zip_with`/`aggregate`
    * version and the DuckDB oracle, so rounded values still match).
    *
    * Implements `doGenCode` (not CodegenFallback): the loop inlines
    * into whole-stage codegen next to the join that feeds it — this
    * is the hottest per-pair kernel in knn/dedup verify stages.
    */
  case class CosineSim(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_sim"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
      copy(left = l, right = r)

    private lazy val leftIsFloat =
      left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    private lazy val rightIsFloat =
      right.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < n) {
        val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
        dot += xv * yv; nx += xv * xv; ny += yv * yv
        i += 1
      }
      java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
    ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val getX = if (leftIsFloat) "getFloat" else "getDouble"
      val getY = if (rightIsFloat) "getFloat" else "getDouble"
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xv = (double) $a.$getX($i);
           |  double $yv = (double) $b.$getY($i);
           |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
           |}
           |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         """.stripMargin
      })
    }
  }

  /** SimHash straight from raw text — tokenize + hash + vote in
    * one pass, bit-identical to `SimHash64(tokens(text))` without
    * materializing the token array. The hot ingest path at corpus
    * scale.
    */
  case class SimHashText(child: Expression, seed: Long) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash_text"
    override protected def withNewChildInternal(newChild: Expression): SimHashText = copy(child = newChild)

    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(simhashTextKernel(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], seed))

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
    ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.HashExpressions.simhashTextKernel($a, ${seed}L);")
  }

  /** Shingle hashes straight from raw text — same single-pass
    * fusion as [[SimHashText]]; bit-identical to
    * `ShingleHashes(tokens(text))`.
    */
  case class ShingleHashesText(child: Expression, n: Int, seed: Long) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hashes_text"
    override protected def withNewChildInternal(newChild: Expression): ShingleHashesText = copy(child = newChild)

    override def nullSafeEval(input: Any): Any =
      shingleTextKernel(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, seed)

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
    ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.HashExpressions.shingleTextKernel($a, $n, ${seed}L);")
  }

  // ---- Column wrappers ----------------------------------------------------

  import org.apache.spark.sql.graftbridge.ColumnBridge

  def simhash64Fast(tokens: Column, seed: Long = 17L): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens), seed))

  def minhashBandKeys(shingles: Column, numHashes: Int = 64, rowsPerBand: Int = 4, seed: Long = 13L): Column =
    ColumnBridge.column(MinHashBandKeys(ColumnBridge.expression(shingles), numHashes, rowsPerBand, seed))

  def shingleHashes(tokens: Column, n: Int, seed: Long = 13L): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), n, seed))

  def hyperplaneLsh(vec: Column, nBits: Int, seed: Long = 7L): Column =
    ColumnBridge.column(HyperplaneLsh(ColumnBridge.expression(vec), nBits, seed))

  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def simhashText(text: Column, seed: Long = 17L): Column =
    ColumnBridge.column(SimHashText(ColumnBridge.expression(text), seed))

  def shingleHashesText(text: Column, n: Int, seed: Long = 13L): Column =
    ColumnBridge.column(ShingleHashesText(ColumnBridge.expression(text), n, seed))
}
