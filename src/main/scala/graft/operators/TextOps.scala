package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for corpus curation: language ID, quality scoring,
  * token counting, fingerprinting. All per-row codegen'd
  * expressions — they pipeline inside the scan stage, zero shuffle.
  */
object TextOps {

  /** Tiny per-language stopword lists for an n-gram-free heuristic
    * language ID: score = fraction of tokens in each language's
    * stopword set; argmax wins, 'und' if nothing matches.
    */
  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "for", "with", "as", "was", "on", "are", "this"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "se", "las", "por", "un", "con", "una", "es"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une", "que", "est", "pour", "qui", "dans"),
    "de" -> Seq("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich", "des", "auf", "für", "ist", "im")
  )

  def langId(df: DataFrame, textCol: String, outputCol: String = "lang_pred"): DataFrame = {
    val ts = TF.tokens(col(textCol))
    val n = greatest(size(ts), lit(1)).cast("double")
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        (size(filter(ts, t => t.isInCollection(words))).cast("double") / n).as("score"),
        lit(lang).as("lang")
      )
    }
    val best = array_max(array(scored: _*))
    df.withColumn(outputCol, when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und")))
  }

  /** Quality features + a composite score in [0,1]: length band,
    * mean word length band, punctuation density, digit density,
    * repetition (unique-token ratio). Mirrors common LLM-corpus
    * quality filters (C4/Gopher-style rules).
    */
  def qualityScore(df: DataFrame, textCol: String, outputCol: String = "quality"): DataFrame = {
    val t = col(textCol)
    val ts = TF.tokens(t)
    val nTok = greatest(size(ts), lit(1)).cast("double")
    val nChar = greatest(length(t), lit(1)).cast("double")
    val meanWordLen = aggregate(ts, lit(0L), (acc, x) => acc + length(x)).cast("double") / nTok
    val punctDensity = (length(t) - length(regexp_replace(t, "[.,!?;:]", ""))).cast("double") / nChar
    val digitDensity = (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast("double") / nChar
    val uniqueRatio = size(array_distinct(ts)).cast("double") / nTok
    val lengthOk = (size(ts) >= 5 && size(ts) <= 100000).cast("int").cast("double")
    val wordLenOk = (meanWordLen >= 2 && meanWordLen <= 12).cast("int").cast("double")
    val score =
      lit(0.3) * lengthOk +
        lit(0.2) * wordLenOk +
        lit(0.2) * (lit(1.0) - least(punctDensity * 5, lit(1.0))) +
        lit(0.1) * (lit(1.0) - least(digitDensity * 5, lit(1.0))) +
        lit(0.2) * uniqueRatio
    df.withColumn("mean_word_len", round(meanWordLen, 6))
      .withColumn("punct_density", round(punctDensity, 6))
      .withColumn("digit_density", round(digitDensity, 6))
      .withColumn("unique_ratio", round(uniqueRatio, 6))
      .withColumn(outputCol, round(score, 6))
  }

  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_tokens_ws", size(TF.tokens(col(textCol))))
      .withColumn("n_tokens_bpeish", TF.tokenCountBpeish(col(textCol)))

  def fingerprint(df: DataFrame, textCol: String, outputCol: String = "fingerprint"): DataFrame =
    df.withColumn(outputCol, TF.rollingHashFingerprint(col(textCol)))
}
