package graft.operators

import graft.functions.{TextFunctions => TF, TextStatsExpression => TSE, VectorFunctions => VF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  def langId(df: DataFrame, textCol: String, outputCol: String = "lang_pred"): DataFrame =
    df.withColumn(outputCol, TSE.langIdScore(col(textCol), stopwords.toSeq.map { case (l, w) => (l, w.toSet) }))

  /** Quality features + a composite score in [0,1]: length band,
    * mean word length band, punctuation density, digit density,
    * repetition (unique-token ratio). Mirrors common LLM-corpus
    * quality filters (C4/Gopher-style rules).
    *
    * One fused [[TSE.textStats]] pass per row, expanded via
    * `inline(array(...))` so the stats expression is evaluated
    * exactly once (see TextStatsExpression scaladoc).
    */
  def qualityScore(df: DataFrame, textCol: String, outputCol: String = "quality"): DataFrame = {
    val withStats = df.select(col("*"), inline(array(TSE.textStats(col(textCol)))))
    val lengthOk = (col("n_tokens") >= 5 && col("n_tokens") <= 100000).cast("int").cast("double")
    val wordLenOk = (col("mean_word_len") >= 2 && col("mean_word_len") <= 12).cast("int").cast("double")
    val score =
      lit(0.3) * lengthOk +
        lit(0.2) * wordLenOk +
        lit(0.2) * (lit(1.0) - least(col("punct_density") * 5, lit(1.0))) +
        lit(0.1) * (lit(1.0) - least(col("digit_density") * 5, lit(1.0))) +
        lit(0.2) * col("unique_ratio")
    withStats
      .withColumn(outputCol, round(score, 6))
      .withColumn("mean_word_len", round(col("mean_word_len"), 6))
      .withColumn("punct_density", round(col("punct_density"), 6))
      .withColumn("digit_density", round(col("digit_density"), 6))
      .withColumn("unique_ratio", round(col("unique_ratio"), 6))
      .drop("n_tokens")
  }

  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_tokens_ws", size(TF.tokens(col(textCol))))
      .withColumn("n_tokens_bpeish", TF.tokenCountBpeish(col(textCol)))

  def fingerprint(df: DataFrame, textCol: String, outputCol: String = "fingerprint"): DataFrame =
    df.withColumn(outputCol, TF.rollingHashFingerprint(col(textCol)))

  /** PII redaction patterns, applied in order (URLs first so an
    * email inside a URL redacts as part of the URL, not piecemeal).
    * RE2-compatible on purpose — no backreferences or lookaround —
    * so engines like DuckDB replicate the semantics exactly, which
    * is what makes the operator oracle-checkable.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    ("""https?://[^\s]+""", "<URL>"),
    ("""[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>"),
    ("""\b(\d{1,3}\.){3}\d{1,3}\b""", "<IP>"),
    ("""\+?\d[\d().\-\s]{7,}\d""", "<PHONE>")
  )

  /** Scrub common PII shapes (URLs, emails, IPv4, phone-like digit
    * runs) from a text column — the standard pre-training scrub
    * step. A chain of codegen'd regexp_replace projections: zero
    * shuffle, pipelines inside the scan stage.
    */
  def redactPii(df: DataFrame, textCol: String, outputCol: String = "text_redacted"): DataFrame =
    df.withColumn(outputCol,
      PiiPatterns.foldLeft(col(textCol)) { case (c, (pat, repl)) => regexp_replace(c, pat, repl) })

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1's
    * repetition filters, the standard pre-training removal rules):
    *
    *  - `dup_line_frac`: fraction of lines that are repeats of an
    *    earlier line (1 − distinct/total).
    *  - `dup_line_char_frac`: fraction of line characters sitting
    *    in those repeated occurrences.
    *  - `dup_3gram_frac`: fraction of word 3-grams that are repeats
    *    (uses the same tokenizer as [[qualityScore]]).
    *
    * Everything is built-in array expressions over one row — the
    * whole operator pipelines inside the scan stage with zero
    * shuffle, and every formulation is replayable in ANSI-ish SQL
    * (list functions), which is what makes it oracle-checkable.
    */
  def repetitionStats(df: DataFrame, textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    val nl = size(lines).cast("double")
    val dl = size(array_distinct(lines)).cast("double")
    val lineChars = aggregate(lines, lit(0L), (a, x) => a + length(x)).cast("double")
    val distinctChars =
      aggregate(array_distinct(lines), lit(0L), (a, x) => a + length(x)).cast("double")
    val toks = TF.tokens(col(textCol))
    val n3 = size(toks) - 2
    val grams = when(size(toks) >= 3,
      zip_with(
        zip_with(slice(toks, lit(1), n3), slice(toks, lit(2), n3), (a, b) => concat(a, lit(" "), b)),
        slice(toks, lit(3), n3),
        (ab, c) => concat(ab, lit(" "), c)))
      .otherwise(array().cast("array<string>"))
    val ng = size(grams).cast("double")
    df.withColumn("dup_line_frac", VF.hround(lit(1.0) - dl / nl, 6))
      .withColumn("dup_line_char_frac",
        VF.hround((lineChars - distinctChars) / greatest(lineChars, lit(1.0)), 6))
      .withColumn("dup_3gram_frac", VF.hround(
        when(ng > 0, lit(1.0) - size(array_distinct(grams)).cast("double") / ng).otherwise(0.0), 6))
  }

  /** Canonical text normalization for fingerprinting/dedup: Unicode
    * normalize (NFC by default, via the codegen'd
    * [[graft.functions.CurationExpressions.UnicodeNormalize]]
    * expression), lowercase, collapse whitespace runs to single
    * spaces, trim. A composed-vs-decomposed accent ("café" written
    * as `e`+U+0301) hashes identically after this; without it every
    * hash-keyed operator treats the two spellings as different
    * documents. Zero shuffle — a projection chain in the scan stage.
    */
  def normalizeText(
      df: DataFrame,
      textCol: String,
      outputCol: String = "text_norm",
      form: String = "NFC",
      lowercase: Boolean = true,
      collapseWhitespace: Boolean = true
  ): DataFrame = {
    val normed = graft.functions.CurationExpressions.unicodeNormalize(col(textCol), form)
    val lowered = if (lowercase) lower(normed) else normed
    val collapsed =
      if (collapseWhitespace) trim(regexp_replace(lowered, "\\s+", " ")) else lowered
    df.withColumn(outputCol, collapsed)
  }

  /** PMI collocation extraction — the corpus-level "which word
    * pairs belong together" screen (multi-word expressions,
    * domain phrases, tokenizer-merge candidates). For each adjacent
    * token bigram: `pmi = ln(C_ab·T² / (B·C_a·C_b))` where C_ab is
    * the bigram count, C the unigram counts, T total tokens, B
    * total bigrams — all INTEGER counts, so the score is a
    * deterministic function of the corpus (one ln per pair, snapped
    * to the 1e-9 grid).
    *
    * Two map-side-combinable count shuffles (unigrams, bigrams) +
    * two ≤vocab-sized broadcast joins; totals ride a 1-row
    * broadcast. `minCount` gates the long tail BEFORE the joins
    * (rare-pair PMI is noise — the standard collocation guard), and
    * top-k is TakeOrderedAndProject, ties (pmi, w1, w2).
    *
    * @return (w1, w2, n_pair, pmi) — top `k` by pmi desc
    */
  def collocations(
      df: DataFrame,
      textCol: String,
      minCount: Int = 5,
      k: Int = 100
  ): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = df.select(graft.functions.TextFunctions.tokens(col(textCol)).as("__toks"))
    val uni = toks.select(explode(col("__toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val bi = toks.filter(size(col("__toks")) >= 2)
      .select(explode(arrays_zip(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1).as("w1"),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1).as("w2"))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val totals = toks.agg(
      coalesce(sum(size(col("__toks"))), lit(0L)).as("t_tokens"),
      coalesce(sum(greatest(size(col("__toks")) - 1, lit(0))), lit(0L)).as("t_bigrams"))
    val snap9 = (c: Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    // unigram joins stay shuffle joins: the vocab is unbounded at
    // corpus scale (AQE may still broadcast when it measures small)
    bi
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("pmi", snap9(log(
        col("n_pair").cast("double") * col("t_tokens") * col("t_tokens") /
          (col("t_bigrams").cast("double") * col("c1") * col("c2")))))
      .select(col("w1"), col("w2"), col("n_pair"), col("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Dunning log-likelihood-ratio collocations — the
    * count-robust companion to [[collocations]] (PMI overweights
    * rare pairs even above `minCount`; G² weighs evidence by
    * frequency, the standard choice for corpus collocation ranking;
    * Dunning 1993). For each adjacent bigram the 2×2 table over all
    * bigram events (first-word marginal × second-word marginal):
    * `G² = 2·Σ kᵢⱼ·ln(kᵢⱼ·N / (rowᵢ·colⱼ))`, zero cells
    * contributing 0.
    *
    * ONE bigram-count shuffle; the marginals are two further
    * aggregations over the DISTINCT-bigram frame (vocab-sized, not
    * corpus-sized — ReuseExchange shares the bigram shuffle), N
    * rides a 1-row broadcast. All table cells are exact integers;
    * one snapped double expression per surviving pair.
    *
    * @return (w1, w2, n_pair, llr) — top `k` by llr desc, ties
    *         (w1, w2)
    */
  def llrCollocations(
      df: DataFrame,
      textCol: String,
      minCount: Int = 5,
      k: Int = 100
  ): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = df.select(graft.functions.TextFunctions.tokens(col(textCol)).as("__toks"))
    val biAll = toks.filter(size(col("__toks")) >= 2)
      .select(explode(arrays_zip(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1).as("w1"),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1).as("w2"))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
    val left = biAll.groupBy("w1").agg(sum("n_pair").as("c1"))
    val right = biAll.groupBy("w2").agg(sum("n_pair").as("c2"))
    val totals = biAll.agg(coalesce(sum("n_pair"), lit(0L)).as("__N"))
    val snap9 = (c: Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val n = col("__N").cast("double")
    def term(kc: Column, rc: Column, cc: Column): Column =
      when(kc > 0, kc.cast("double") *
        log(kc.cast("double") * n / (rc.cast("double") * cc.cast("double"))))
        .otherwise(lit(0.0))
    val k11 = col("n_pair"); val k12 = col("c1") - col("n_pair")
    val k21 = col("c2") - col("n_pair")
    val k22 = col("__N") - col("c1") - col("c2") + col("n_pair")
    val r2 = col("__N") - col("c1"); val cc2 = col("__N") - col("c2")
    biAll.filter(col("n_pair") >= minCount)
      .join(left, Seq("w1"))
      .join(right, Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("llr", snap9(lit(2.0) * (
        term(k11, col("c1"), col("c2")) + term(k12, col("c1"), cc2) +
        term(k21, r2, col("c2")) + term(k22, r2, cc2))))
      .select(col("w1"), col("w2"), col("n_pair"), col("llr"))
      .orderBy(col("llr").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Per-document keyword extraction: the top-k terms of each doc
    * by sublinear TF-IDF `(1 + ln tf)·ln((N+1)/(df+1) + 1)`-style
    * weight (the [[graft.operators.RetrievalOps.tfidfTopK]] scorer
    * turned document-side) — the doc-summarization/tagging screen.
    *
    * ONE groupBy(doc, term) count shuffle + a vocab-sized df join
    * (shuffle, not broadcast — unbounded vocab) + a per-doc top-k
    * window (bounded by the doc's DISTINCT terms — the safe window
    * axis; corpus growth adds docs, not rows per doc). N rides a
    * 1-row broadcast. Scores on the 1e-6 grid, ties by term.
    *
    * @return (doc_id, term, tfidf, rank) — rank 1..k per doc
    */
  def keywords(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tf = df
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("__tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("__df"))
    val nDocs = df.agg(count(lit(1)).cast("double").as("__n"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        floor((lit(1.0) + log(col("__tf"))) *
          (log((col("__n") + lit(1.0)) / (col("__df") + lit(1.0))) + lit(1.0)) * lit(1e6)
          + lit(0.5)) / lit(1e6))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tfidf"), col("rank"))
  }

  /** Flesch reading-ease readability per document — the classic
    * prose-complexity score quality filters stack next to
    * [[qualityScore]] (length/punct ratios catch garbage; Flesch
    * catches legalese walls and keyword stuffing). All three
    * inputs are regexp counts — sentences = `[.!?]+` runs, words =
    * ASCII-letter runs, syllables = vowel-group runs (vowel runs
    * cannot span a non-letter, so the text-wide count equals the
    * per-word sum) — a zero-shuffle scan-stage chain, replayable
    * in any RE2 engine. `flesch = 206.835 − 1.015·(w/s) −
    * 84.6·(sy/w)` on the 1e-9 grid; NULL when a denominator is 0.
    * English-orthography heuristic by construction — gate on
    * [[langId]] first for multilingual corpora.
    */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sentences = expr(s"regexp_count($textCol, '[.!?]+')")
    val words = expr(s"regexp_count(lower($textCol), '[a-z]+')")
    val syllables = expr(s"regexp_count(lower($textCol), '[aeiouy]+')")
    val snap9 = (c: Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    df.select(
      col(idCol),
      sentences.as("n_sentences"),
      words.as("n_words"),
      syllables.as("n_syllables"),
      when(sentences > 0 && words > 0,
        snap9(lit(206.835)
          - lit(1.015) * (words.cast("double") / sentences.cast("double"))
          - lit(84.6) * (syllables.cast("double") / words.cast("double"))))
        .as("flesch"))
  }

  /** Per-document Unicode SCRIPT profile — the writing-system
    * complement of [[langId]] (stopword votes only separate
    * languages that share an alphabet; Han/Cyrillic/Latin mixing,
    * mojibake, and "wrong-script spam" need character classes).
    * Counts per codepoint class via `len(s) − len(replace(class,
    * ''))` — a zero-shuffle scan-stage regexp chain like
    * [[redactPii]] — and emits snapped fractions plus an argmax
    * `main_script` with a fixed latin > han > cyrillic precedence
    * ('und' when no scripted character appears).
    */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val s = col(textCol)
    val total = length(s)
    def cnt(p: String): Column = total - length(regexp_replace(s, p, ""))
    val snap9 = (c: Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val frac = (c: Column) => when(total > 0, snap9(c.cast("double") / total.cast("double")))
      .otherwise(lit(0.0))
    val latin = cnt("\\p{IsLatin}"); val han = cnt("\\p{IsHan}")
    val cyr = cnt("\\p{IsCyrillic}"); val dig = cnt("[0-9]"); val ws = cnt("\\s")
    df.select(
      col(idCol),
      total.as("n_chars_total"),
      frac(latin).as("frac_latin"),
      frac(han).as("frac_han"),
      frac(cyr).as("frac_cyrillic"),
      frac(dig).as("frac_digit"),
      frac(ws).as("frac_space"),
      frac(total - latin - han - cyr - dig - ws).as("frac_other"),
      when(latin === 0 && han === 0 && cyr === 0, "und")
        .when(latin >= han && latin >= cyr, "latin")
        .when(han >= cyr, "han")
        .otherwise("cyrillic").as("main_script"))
  }

  /** CCNet/RefinedWeb-style boilerplate line removal: a line that
    * appears (verbatim) in at least `minDocs` DISTINCT documents of
    * the same group (typically the source domain) is template
    * chrome — nav bars, cookie banners, footers — and is dropped
    * from every document; the rest of each document survives in
    * original line order. Whitespace-only lines are never counted
    * and always kept (they carry structure, not content).
    *
    * Scale shape: explode to (group, line, doc) → ONE
    * groupBy(group, line) distinct-doc count (the hot boilerplate
    * lines are exactly the high-multiplicity keys, and they
    * collapse map-side after the in-group distinct) → join the
    * line frame back on (group, line) → rebuild per doc from a
    * sorted collect over its OWN lines (bounded by the document's
    * line count — the same per-doc buffer every reshape of a
    * document already holds). Docs that were pure boilerplate
    * come back as empty strings, not dropped rows.
    *
    * @return df + `outCol` with the cleaned text
    */
  def stripBoilerplate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCols: Seq[String],
      minDocs: Int,
      outCol: String = "text_clean"
  ): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val gCols = groupCols.map(col)
    val lines = df
      .select((col(idCol).as("__id") +: gCols) :+
        posexplode(split(col(textCol), "\n")).as(Seq("__idx", "__line")): _*)
    val counted = lines
      .filter(trim(col("__line")) =!= "")
      .select((gCols :+ col("__line")) :+ col("__id"): _*).distinct()
      .groupBy((gCols :+ col("__line")): _*)
      .agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= minDocs)
    val kept = lines.join(counted.select((gCols :+ col("__line")) :+ lit(1).as("__bp"): _*),
        groupCols :+ "__line", "left")
      .filter(col("__bp").isNull)
    // per-doc line lists are unbounded state — rebuild through a
    // window collect_list (one doc buffered at a time, spillable)
    // instead of a groupBy on the hot ObjectHashAggregate hash path
    // (FunnelOps.funnel has the full rationale). The one-row-per-doc
    // reduction is first() — a SortAggregate streaming the window's
    // already-sorted groups (no new sort/exchange, one prebuilt
    // array held at a time), NOT row_number()=1: the keyed Aggregate
    // keeps __id provably unique so a count-shaped action downstream
    // can still eliminate the left join (see
    // DedupOps.removeRepeatedNgrams for the measured cliff).
    val wId = Window.partitionBy(col("__id"))
    val rebuilt = kept
      .withColumn("__all", collect_list(struct(col("__idx"), col("__line"))).over(wId))
      .groupBy(col("__id"))
      .agg(first(col("__all")).as("__all"))
    df.join(rebuilt, df(idCol) === rebuilt("__id"), "left")
      .withColumn(outCol,
        when(col("__all").isNull, lit(""))
          .otherwise(concat_ws("\n",
            expr("transform(array_sort(__all), x -> x.__line)"))))
      .drop("__id", "__all")
  }

  /** Lexical diversity per group — type-token ratio, hapax fraction
    * and mean term frequency (Herdan/Zipf vocabulary-richness
    * screens: templated or looping text shows low TTR and a thin
    * hapax tail long before perplexity notices; the vocabulary
    * companion to the q_zipf slope).
    *
    * ONE shuffle to the (group, term) count frame (map-side
    * combinable), then a map-side-combinable per-group agg over it —
    * tokens/types/hapax are exact longs, the ratios snapped doubles.
    * Same tokenizer contract as TF-IDF/collocations: lowercase,
    * split on non-letter/digit runs.
    *
    * @return (groupCols*, n_tokens, n_types, n_hapax, ttr,
    *         hapax_ratio, mean_term_freq)
    */
  def lexicalDiversity(
      df: DataFrame,
      groupCols: Seq[String],
      textCol: String
  ): DataFrame = {
    val gs = groupCols.map(col)
    val s9 = (c: Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val terms = df
      .select(gs :+ explode(split(lower(col(textCol)), "[^\\p{L}\\p{N}]+")).as("__t"): _*)
      .filter(col("__t") =!= "")
      .groupBy(gs :+ col("__t"): _*)
      .agg(count(lit(1)).as("__c"))
    terms.groupBy(gs: _*)
      .agg(
        sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(gs ++ Seq(col("n_tokens"), col("n_types"), col("n_hapax"),
        s9(col("n_types").cast("double") / col("n_tokens")).as("ttr"),
        s9(col("n_hapax").cast("double") / col("n_types")).as("hapax_ratio"),
        s9(col("n_tokens").cast("double") / col("n_types")).as("mean_term_freq")): _*)
  }

  /** Shannon entropy of each document's unigram distribution — the
    * "how templated is this text" quality signal ([[lexicalDiversity]]'s
    * information-theoretic sharpening: TTR says how many types, the
    * entropy says how EVENLY they are used; boilerplate and keyword
    * stuffing crater it long before the type count moves). Emitted
    * in bits plus the [0, 1] normalization against log2(n_types) —
    * the gate-threshold form (1 = perfectly even usage).
    *
    * Scale shape: the DOC axis is the parallel axis — one explode +
    * map-side-combinable groupBy(id, token), then two id-keyed hops
    * (totals join + final rollup) that all share the id hash
    * partitioning. Per-doc state is its type count, never the
    * corpus vocabulary. Same tokenizer contract as
    * TF-IDF/collocations (lowercase, split non-letter/digit runs);
    * docs with zero tokens drop (no distribution to score).
    *
    * Log discipline: the [[graft.operators.StatsOps.mutualInformation]]
    * convention — natural-log terms snapped at 1e-9, snapped sum,
    * then the bits/normalized conversions snap in replay order.
    *
    * @return (idCol, n_tokens, n_types, entropy_bits, norm_entropy)
    *         — norm_entropy null when n_types = 1 (log2(1) = 0)
    */
  def tokenEntropy(
      df: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    val s9 = (c: Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val ln2 = lit(math.log(2.0))
    val counts = df
      .select(col(idCol), explode(split(lower(col(textCol)), "[^\\p{L}\\p{N}]+")).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col(idCol), col("__t"))
      .agg(count(lit(1)).as("__c"))
    // per-doc total via an id-partitioned window: shares the final
    // rollup's id hash partitioning (no totals self-join, whose
    // shared lineage Spark flags ambiguous anyway)
    val withT = counts.withColumn("__T",
      sum(col("__c")).over(Window.partitionBy(col(idCol))))
    val p = col("__c").cast("double") / col("__T").cast("double")
    withT
      .groupBy(col(idCol))
      .agg(
        first(col("__T")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        s9(sum(s9(-p * log(p)))).as("__hn"))
      .withColumn("entropy_bits", s9(col("__hn") / ln2))
      .withColumn("norm_entropy",
        when(col("n_types") > 1,
          s9(col("entropy_bits") / s9(log(col("n_types").cast("double")) / ln2))))
      .select(col(idCol), col("n_tokens"), col("n_types"),
        col("entropy_bits"), col("norm_entropy"))
  }

  /** Canonical URL form for URL-keyed dedup — the scrape-pipeline
    * normalization pass that runs BEFORE content dedup (the same
    * page arrives as `HTTP://Site.com:80/p#x`, `http://www.site.com/p/`
    * and `http://site.com/p?utm_source=…`; keyed raw, they are four
    * "distinct" docs). Pure native column functions — regexp splits,
    * a lambda filter, `array_sort` — so the whole normalization
    * codegens inside the scan stage, zero shuffle, no UDF.
    *
    * Rules (each replayable in ANSI-ish SQL for the oracle):
    * fragment dropped; scheme + host lowercased; leading `www.`
    * and default ports (`:80` http, `:443` https) dropped; tracking
    * params (`utm_*`, `gclid`, `fbclid`, `ref`) dropped; surviving
    * query params sorted; trailing path slashes collapsed (root
    * stays `/`, empty path becomes `/`). Strings without a
    * `scheme://` prefix pass through trimmed (not every doc field
    * is a URL; garbage stays byte-stable rather than half-mangled).
    */
  def urlNormalize(u: Column): Column = {
    val t = trim(u)
    val scheme = lower(regexp_extract(t, "^([^:/?#]+)://.*$", 1))
    val rest = regexp_extract(t, "^[^:/?#]+://([^#]*).*$", 1) // fragment dropped here
    val hostport = lower(regexp_extract(rest, "^([^/?]*).*$", 1))
    val host0 = regexp_replace(hostport, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val pathq = regexp_extract(rest, "^[^/?]*(.*)$", 1)
    val path0 = regexp_extract(pathq, "^([^?]*).*$", 1)
    val path = when(regexp_replace(path0, "/+$", "") === "", lit("/"))
      .otherwise(regexp_replace(path0, "/+$", ""))
    val query0 = regexp_extract(pathq, "^[^?]*\\?(.*)$", 1)
    val kept = array_sort(filter(split(query0, "&"),
      p => !(p.rlike("^(utm_[^=]*|gclid|fbclid|ref)(=|$)") || p === "")))
    val query = concat_ws("&", kept)
    val canon = concat(scheme, lit("://"), host, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
    when(t.rlike("^[^:/?#]+://"), canon).otherwise(t)
  }

  /** URL-keyed exact dedup groups: [[urlNormalize]] in the scan
    * stage, then one hash-aggregate on the canonical form — keeper
    * (min id), copy count, and the canonical key per group.
    */
  def urlDedupGroups(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), urlNormalize(col(urlCol)).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
}
