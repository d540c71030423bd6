package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass DSIR feature extraction (K-series discipline): tokenize
  * the raw text (identical char classes and lowercasing to
  * `TextFunctions.tokens`), md5 each unigram and space-joined bigram
  * ONCE through a thread-local digest, and fold the first 13 hex
  * nibbles straight off the digest bytes into the bucket id — the
  * exact value `fold13(md5_hex) % buckets` computes, without the
  * hex-string materialization, the 13 substring/instr expression
  * evaluations per gram, or the intermediate gram/hash arrays the
  * composed-Column formulation allocated (measured ~6× on the
  * q_dsir scan at sf0.1). Bit-identical buckets, so the SQL oracle
  * is untouched.
  */
object DsirFeaturesExpression {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** `fold13(hex(md5(s))) % buckets` from the raw digest bytes:
    * 13 nibbles = bytes 0..5 plus the high nibble of byte 6.
    */
  def bucketOf(s: String, buckets: Int): Int = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val v = ((d(0) & 0xffL) << 44) | ((d(1) & 0xffL) << 36) | ((d(2) & 0xffL) << 28) |
      ((d(3) & 0xffL) << 20) | ((d(4) & 0xffL) << 12) | ((d(5) & 0xffL) << 4) |
      ((d(6) & 0xffL) >>> 4)
    (v % buckets).toInt // v is 52-bit non-negative
  }

  private def isTokenChar(cp: Int): Boolean = {
    // the \p{L}\p{N} classes TextFunctions.tokens splits on
    val t = Character.getType(cp)
    t == Character.UPPERCASE_LETTER || t == Character.LOWERCASE_LETTER ||
      t == Character.TITLECASE_LETTER || t == Character.MODIFIER_LETTER ||
      t == Character.OTHER_LETTER || t == Character.DECIMAL_DIGIT_NUMBER ||
      t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
  }

  /** Unigram + bigram bucket ids, unigrams first (the order the
    * composed `concat(toks, bigrams)` formulation emitted).
    */
  def dsirFeaturesKernel(
      text: org.apache.spark.unsafe.types.UTF8String, buckets: Int): ArrayData = {
    val lowered = text.toLowerCase.toString
    val n = lowered.length
    val toks = new scala.collection.mutable.ArrayBuffer[String](math.min(64, n / 5 + 1))
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
        toks += lowered.substring(start, i)
      } else i += Character.charCount(cp)
    }
    val nT = toks.length
    val out = new Array[Int](nT + math.max(0, nT - 1))
    var u = 0
    while (u < nT) { out(u) = bucketOf(toks(u), buckets); u += 1 }
    var b = 0
    while (b + 1 < nT) { out(nT + b) = bucketOf(toks(b) + " " + toks(b + 1), buckets); b += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  case class DsirFeatures(child: Expression, buckets: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "dsir_features"
    override protected def withNewChildInternal(newChild: Expression): DsirFeatures =
      copy(child = newChild)

    override def nullSafeEval(input: Any): Any =
      dsirFeaturesKernel(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], buckets)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.DsirFeaturesExpression.dsirFeaturesKernel($a, $buckets);")
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  def dsirFeatures(text: Column, buckets: Int): Column =
    ColumnBridge.column(DsirFeatures(ColumnBridge.expression(text), buckets))
}
