package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document text statistics.
  *
  * The composed `functions._` version of quality scoring re-splits
  * the text once per output column (higher-order lambdas are also
  * outside whole-stage codegen), so a 5-stat score tokenizes 12×.
  * This expression tokenizes ONCE per row and emits every stat as
  * one struct; callers expand it with `inline(array(...))` so the
  * Generate node evaluates it exactly once per input row (a plain
  * Project would let CollapseProject duplicate it per field).
  *
  * Tokenization matches `split(lower(text), "[^\p{L}\p{N}]+")` —
  * the same Java-regex semantics as the composable path, so DuckDB
  * oracles written against that formulation still hash-match.
  *
  * Both expressions implement `doGenCode` by delegating to the
  * static kernels below (the same pattern as [[HashExpressions]]),
  * so they inline into whole-stage codegen instead of forcing the
  * interpreted CodegenFallback path over every document.
  */
object TextStatsExpression {

  private val tokenPattern = java.util.regex.Pattern.compile("[^\\p{L}\\p{N}]+")

  val statsSchema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("unique_ratio", DoubleType, nullable = false),
    StructField("punct_density", DoubleType, nullable = false),
    StructField("digit_density", DoubleType, nullable = false)
  ))

  /** One-pass doc stats — public: invoked from generated code. */
  def textStatsKernel(input: UTF8String): InternalRow = {
    val text = input.toString
    val lower = text.toLowerCase
    val toks = tokenPattern.split(lower).filter(_.nonEmpty)
    val nTok = toks.length
    val nTokD = math.max(nTok, 1).toDouble
    var totalLen = 0L
    val uniq = new java.util.HashSet[String]()
    var i = 0
    while (i < nTok) { totalLen += toks(i).length; uniq.add(toks(i)); i += 1 }
    var punct = 0
    var digit = 0
    var c = 0
    while (c < text.length) {
      val ch = text.charAt(c)
      if (ch == '.' || ch == ',' || ch == '!' || ch == '?' || ch == ';' || ch == ':') punct += 1
      if (ch >= '0' && ch <= '9') digit += 1
      c += 1
    }
    val nChar = math.max(text.length, 1).toDouble
    new GenericInternalRow(Array[Any](
      nTok,
      totalLen / nTokD,
      uniq.size() / nTokD,
      punct / nChar,
      digit / nChar
    ))
  }

  case class TextStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = statsSchema
    override def prettyName: String = "text_stats"
    override protected def withNewChildInternal(newChild: Expression): TextStats = copy(child = newChild)

    override def nullSafeEval(input: Any): Any =
      textStatsKernel(input.asInstanceOf[UTF8String])

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
    ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.TextStatsExpression.textStatsKernel($a);")
  }

  /** Precomputed stopword table — one serializable reference object
    * for the codegen path instead of re-materializing the per-lang
    * sets per row. Languages arrive sorted by code so the strict
    * `>` argmax breaks ties toward the alphabetically first.
    */
  final class LangTable(val codes: Array[UTF8String], val words: Array[java.util.HashSet[String]])
      extends Serializable

  def buildLangTable(langs: Seq[(String, Set[String])]): LangTable = {
    val ordered = langs.sortBy(_._1)
    new LangTable(
      ordered.map(l => UTF8String.fromString(l._1)).toArray,
      ordered.map { case (_, ws) =>
        val s = new java.util.HashSet[String]()
        ws.foreach(s.add)
        s
      }.toArray)
  }

  private val und = UTF8String.fromString("und")

  /** Stopword-vote language ID — public: invoked from generated
    * code. Hits counted with multiplicity over all tokens; argmax
    * with strict `>` (first language in code order wins ties);
    * "und" when nothing scores.
    */
  def langIdKernel(input: UTF8String, table: LangTable): UTF8String = {
    val text = input.toString.toLowerCase
    val toks = tokenPattern.split(text).filter(_.nonEmpty)
    var bestIdx = -1
    var bestScore = 0
    var l = 0
    while (l < table.words.length) {
      val words = table.words(l)
      var hits = 0
      var i = 0
      while (i < toks.length) { if (words.contains(toks(i))) hits += 1; i += 1 }
      if (hits > bestScore) { bestScore = hits; bestIdx = l }
      l += 1
    }
    if (bestIdx < 0) und else table.codes(bestIdx)
  }

  /** Language-ID by stopword-hit count, fused: tokenize once, count
    * hits against each language's stopword set, emit the argmax
    * (ties broken by language code order), 'und' if no hits.
    */
  case class LangIdScore(child: Expression, langs: Seq[(String, Set[String])])
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "langid"
    override protected def withNewChildInternal(newChild: Expression): LangIdScore = copy(child = newChild)

    @transient private lazy val table = buildLangTable(langs)

    override def nullSafeEval(input: Any): Any =
      langIdKernel(input.asInstanceOf[UTF8String], table)

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
    ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val tableRef = ctx.addReferenceObj("graftLangTable", table,
        classOf[LangTable].getName)
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.TextStatsExpression.langIdKernel($a, $tableRef);")
    }
  }

  def textStats(text: Column): Column = ColumnBridge.column(TextStats(ColumnBridge.expression(text)))

  def langIdScore(text: Column, langs: Seq[(String, Set[String])]): Column =
    ColumnBridge.column(LangIdScore(ColumnBridge.expression(text), langs))
}
