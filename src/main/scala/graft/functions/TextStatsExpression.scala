package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
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
  */
object TextStatsExpression {

  private val tokenPattern = java.util.regex.Pattern.compile("[^\\p{L}\\p{N}]+")
  private val punctChars = Set('.', ',', '!', '?', ';', ':')

  val statsSchema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("unique_ratio", DoubleType, nullable = false),
    StructField("punct_density", DoubleType, nullable = false),
    StructField("digit_density", DoubleType, nullable = false)
  ))

  case class TextStats(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = statsSchema
    override def prettyName: String = "text_stats"
    override protected def withNewChildInternal(newChild: Expression): TextStats = copy(child = newChild)

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
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
        if (punctChars.contains(ch)) punct += 1
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
  }

  /** Language-ID by stopword-hit fraction, fused: tokenize once,
    * count hits against each language's stopword set, emit the
    * argmax (ties broken by language code order), 'und' if no hits.
    */
  case class LangIdScore(child: Expression, langs: Seq[(String, Set[String])])
      extends UnaryExpression
      with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "langid"
    override protected def withNewChildInternal(newChild: Expression): LangIdScore = copy(child = newChild)

    private lazy val ordered = langs.sortBy(_._1)

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString.toLowerCase
      val toks = tokenPattern.split(text).filter(_.nonEmpty)
      var bestLang = "und"
      var bestScore = 0
      for ((lang, words) <- ordered) {
        var hits = 0
        var i = 0
        while (i < toks.length) { if (words.contains(toks(i))) hits += 1; i += 1 }
        if (hits > bestScore) { bestScore = hits; bestLang = lang }
      }
      UTF8String.fromString(bestLang)
    }
  }

  def textStats(text: Column): Column = ColumnBridge.column(TextStats(ColumnBridge.expression(text)))

  def langIdScore(text: Column, langs: Seq[(String, Set[String])]): Column =
    ColumnBridge.column(LangIdScore(ColumnBridge.expression(text), langs))
}
