package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Corpus-curation expressions: Unicode normalization (Spark has no
  * built-in normalizer function) and Bloom-filter membership over a
  * broadcast filter. Both implement `doGenCode` via static kernels,
  * so they inline into whole-stage codegen and pipeline inside the
  * scan stage — zero shuffle, no per-row virtual dispatch.
  */
object CurationExpressions {

  // ---- static kernels, invoked both from eval and generated code ----

  def normalizeKernel(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    // fast path: already-normalized text (all of ASCII is) skips the allocation
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }

  def bloomKernel(bc: Broadcast[SeededBloom], h: Long): Boolean =
    bc.value.mightContainLong(h)

  /** `java.text.Normalizer` as a Catalyst expression — NFC/NFD/
    * NFKC/NFKD per the `form` argument. The reference normalizes
    * text before fingerprinting/dedup; at corpus scale this must be
    * a per-row scan-stage map, never a UDF.
    */
  case class UnicodeNormalize(child: Expression, formName: String)
      extends UnaryExpression {
    require(Set("NFC", "NFD", "NFKC", "NFKD").contains(formName), s"unknown form $formName")
    override def dataType: DataType = StringType
    override def prettyName: String = "unicode_normalize"
    override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
      copy(child = newChild)

    @transient private lazy val form = java.text.Normalizer.Form.valueOf(formName)

    override def nullSafeEval(input: Any): Any =
      normalizeKernel(input.asInstanceOf[UTF8String], form)

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
    ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"""${ev.value} = graft.functions.CurationExpressions.normalizeKernel(
           |  $a, java.text.Normalizer.Form.$formName);""".stripMargin)
  }

  /** Membership probe against a BROADCAST Bloom filter — the filter
    * ships once per executor (not per task, not embedded in the
    * plan), and the probe inlines into codegen. No false negatives:
    * a `false` is a definitive miss, which is what lets callers
    * skip the exact-verify join for the non-matching majority.
    */
  case class InBloom(child: Expression, bloom: Broadcast[SeededBloom])
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "in_bloom"
    override protected def withNewChildInternal(newChild: Expression): InBloom =
      copy(child = newChild)

    override def nullSafeEval(input: Any): Any =
      java.lang.Boolean.valueOf(bloomKernel(bloom, input.asInstanceOf[Long]))

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
    ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("graftBloom", bloom,
        "org.apache.spark.broadcast.Broadcast")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.CurationExpressions.bloomKernel($ref, $a);")
    }
  }

  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))

  def inBloom(c: Column, bloom: Broadcast[SeededBloom]): Column =
    ColumnBridge.column(InBloom(ColumnBridge.expression(c), bloom))

  /** xxhash64(seed 42) of one line — EXACTLY Spark's `xxhash64`
    * column function on the same string, which is what lets the
    * count pass use the built-in and the scrub kernel agree with it.
    */
  def lineHash64(line: String): Long = {
    val u = UTF8String.fromString(line)
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }

  /** Drop every line of `text` whose hash is in `dupHashes`
    * (sorted), rejoin the survivors with the delimiter — the fused
    * split→hash→filter→join kernel behind [[ScrubDuplicatedLines]].
    * Documents whose every line is boilerplate come back as "".
    */
  def scrubLinesKernel(text: UTF8String, delimiter: String, dupHashes: Array[Long]): UTF8String = {
    val parts = text.toString.split(java.util.regex.Pattern.quote(delimiter), -1)
    val sb = new java.lang.StringBuilder(text.numBytes)
    var first = true
    var i = 0
    while (i < parts.length) {
      if (java.util.Arrays.binarySearch(dupHashes, lineHash64(parts(i))) < 0) {
        if (!first) sb.append(delimiter)
        sb.append(parts(i))
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** CCNet-style line scrub: remove lines whose hash appears in the
    * (driver-bounded, sorted) duplicated-line set. The set rides
    * into generated code as a reference object — a primitive long
    * array probed by binary search, no boxing, no broadcast join,
    * and above all NO corpus shuffle: the scrub is a pure scan-stage
    * map.
    */
  case class ScrubDuplicatedLines(child: Expression, delimiter: String, dupHashes: Array[Long])
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "scrub_duplicated_lines"
    override protected def withNewChildInternal(newChild: Expression): ScrubDuplicatedLines =
      copy(child = newChild)

    override def nullSafeEval(input: Any): Any =
      scrubLinesKernel(input.asInstanceOf[UTF8String], delimiter, dupHashes)

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
    ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val delimRef = ctx.addReferenceObj("graftScrubDelim", delimiter, "java.lang.String")
      val hashRef = ctx.addReferenceObj("graftDupLineHashes", dupHashes, "long[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.CurationExpressions.scrubLinesKernel($a, $delimRef, $hashRef);")
    }
  }

  def scrubDuplicatedLines(c: Column, delimiter: String, dupHashes: Array[Long]): Column =
    ColumnBridge.column(ScrubDuplicatedLines(ColumnBridge.expression(c), delimiter, dupHashes))
}
