package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** N-gram language-model quality scoring — the CCNet-style signal a
  * training-data pipeline uses to rank documents by fluency: train a
  * bigram LM on a (clean) corpus, then score candidate documents by
  * average negative log-likelihood per token. Low nll ≈ looks like
  * the training corpus; high nll ≈ out-of-domain or garbled
  * (reference semantics: the corpus-level token statistics of
  * `biosets`' text utilities, extended to conditional probabilities).
  *
  * Model: P(w₂|w₁) = (c(w₁,w₂) + α) / (c(w₁) + α·V) — add-α
  * smoothing over the predicted vocabulary V, with a `<s>` BOS
  * context so the first token of every doc is scored too. Context
  * counts c(w₁) are derived from the bigram table itself (exactly
  * Σ_w₂ c(w₁,w₂)), so the model is a single table.
  *
  * Scale design:
  *   - Bigram construction is a zero-shuffle projection: tokens →
  *     `posexplode`, previous token via `element_at` — no self-join.
  *   - Training is ONE `groupBy(w₁,w₂)` shuffle with map-side
  *     partial aggregation; the model size is O(distinct bigrams),
  *     never O(corpus).
  *   - Scoring joins the doc bigram stream to the model on
  *     (w₁,w₂) — a shuffle equi-join that AQE turns into a
  *     broadcast when the model is small; vocabulary size rides in
  *     as a 1-row broadcast scalar.
  *
  * Determinism for the oracle: every probability is a closed-form
  * ratio of integer counts, so DuckDB replays the model exactly;
  * the per-doc ln-sum is rounded to the 1e-6 grid.
  */
object LmOps {

  val Bos = "<s>"

  /** (doc_id, w1, w2) bigram stream with a BOS context per doc.
    * Empty-token docs emit no rows (posexplode of an empty array).
    */
  def bigrams(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), TF.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), col("__toks"), posexplode(col("__toks")).as(Seq("pos", "w2")))
      .select(
        col("doc_id"),
        when(col("pos") === 0, lit(Bos))
          .otherwise(element_at(col("__toks"), col("pos"))).as("w1"),
        col("w2"))

  /** Train: bigram count table (w1, w2, c12). */
  def trainBigramLm(df: DataFrame, textCol: String, idCol: String): DataFrame =
    bigrams(df, textCol, idCol).groupBy("w1", "w2").agg(count(lit(1)).as("c12"))

  /** Score `docs` under a trained model: per-doc token count and
    * average negative log-likelihood (rounded to 1e-6). Docs with
    * zero tokens produce no output row — there is nothing to score.
    */
  def nllScore(
      docs: DataFrame,
      lm: DataFrame,
      textCol: String,
      idCol: String,
      alpha: Double = 0.5
  ): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    val ctx = lm.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val vocab = lm.agg(countDistinct(col("w2")).cast("double").as("__v"))
    bigrams(docs, textCol, idCol)
      .join(lm, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn(
        "__lnp",
        log((coalesce(col("c12"), lit(0L)).cast("double") + lit(alpha)) /
          (coalesce(col("c1"), lit(0L)).cast("double") + lit(alpha) * col("__v"))))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        (floor((-sum(col("__lnp")) / count(lit(1))) * 1e6 + lit(0.5)) / 1e6).as("nll"))
  }

  /** Trigram model tables for Stupid Backoff scoring: trigram,
    * bigram and unigram counts plus their derivation corpus totals.
    * Each table is ONE map-side-combinable count shuffle; sizes are
    * O(distinct n-grams), never O(corpus).
    */
  case class BackoffLm(tri: DataFrame, bi: DataFrame, uni: DataFrame)

  /** (doc_id, w1, w2, w3) trigram stream with a double-BOS context
    * so position 0 scores as (`<s>`,`<s>`,w) and position 1 as
    * (`<s>`,w₀,w₁) — every token of every doc is scored exactly
    * once, same contract as [[bigrams]].
    */
  def trigrams(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), TF.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), col("__toks"), posexplode(col("__toks")).as(Seq("pos", "w3")))
      .select(
        col("doc_id"),
        when(col("pos") <= 1, lit(Bos))
          .otherwise(element_at(col("__toks"), col("pos") - 1)).as("w1"),
        when(col("pos") === 0, lit(Bos))
          .otherwise(element_at(col("__toks"), col("pos"))).as("w2"),
        col("w3"))

  /** Train the three Stupid Backoff tables (Brants et al. 2007
    * "Large Language Models in Machine Translation" — the
    * renormalization-free backoff built FOR distributed count
    * tables; exactly this engine's regime). Unigrams count real
    * tokens only (`<s>` is context, never a predicted word).
    */
  def trainBackoffLm(df: DataFrame, textCol: String, idCol: String): BackoffLm =
    BackoffLm(
      tri = trigrams(df, textCol, idCol).groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c123")),
      bi = bigrams(df, textCol, idCol).groupBy("w1", "w2").agg(count(lit(1)).as("c12")),
      uni = df.select(explode(TF.tokens(col(textCol))).as("w")).groupBy("w").agg(count(lit(1)).as("c1")))

  /** Score docs under a trained Stupid Backoff model: per token,
    * `S(w₃|w₁w₂) = c₁₂₃/ctx(w₁w₂)` when the trigram was seen, else
    * `λ·c₂₃/ctx(w₂)`, else `λ²·(c₃+α)/(N+α·V)` (an add-α floor
    * closes the unseen-word hole Brants leaves open); score =
    * average −ln S, 1e-6 grid. Context totals derive from the
    * n-gram tables themselves (`ctx(w₁w₂) = Σ_w c₁₂w`) — this
    * covers the `(<s>,<s>)` document-start context the raw bigram
    * table can't hold and makes each seen context a proper
    * distribution. Every branch is a ratio of integer counts —
    * cross-engine exact.
    *
    * Scale shape: the doc trigram stream joins each count table on
    * its own key (shuffle equi-joins, AQE-broadcast when the model
    * is small); N and V ride one broadcast row; ONE final
    * groupBy(doc).
    */
  def backoffScore(
      docs: DataFrame,
      lm: BackoffLm,
      textCol: String,
      idCol: String,
      lambda: Double = 0.4,
      alpha: Double = 0.5
  ): DataFrame = {
    require(lambda > 0 && lambda <= 1, s"lambda in (0,1], got $lambda")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val ctx2 = lm.tri.groupBy("w1", "w2").agg(sum(col("c123")).as("c12ctx"))
    val ctx1 = lm.bi.groupBy(col("w1").as("w2")).agg(sum(col("c12")).as("c2ctx"))
    val totals = lm.uni.agg(
      coalesce(sum(col("c1")), lit(0L)).cast("double").as("__n"),
      count(lit(1)).cast("double").as("__v"))
    trigrams(docs, textCol, idCol)
      .join(lm.tri, Seq("w1", "w2", "w3"), "left")
      .join(ctx2, Seq("w1", "w2"), "left")
      .join(lm.bi.select(col("w1").as("w2"), col("w2").as("w3"), col("c12").as("c23")),
        Seq("w2", "w3"), "left")
      .join(ctx1, Seq("w2"), "left")
      .join(lm.uni.select(col("w").as("w3"), col("c1").as("c3")), Seq("w3"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("__s",
        when(col("c123").isNotNull,
          col("c123").cast("double") / col("c12ctx").cast("double"))
        .when(col("c23").isNotNull,
          lit(lambda) * col("c23").cast("double") / col("c2ctx").cast("double"))
        .otherwise(lit(lambda * lambda) *
          (coalesce(col("c3"), lit(0L)).cast("double") + lit(alpha)) /
          (col("__n") + lit(alpha) * col("__v"))))
      .withColumn("__lnp", log(col("__s")))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        (floor((-sum(col("__lnp")) / count(lit(1))) * 1e6 + lit(0.5)) / 1e6).as("nll3"))
  }
}
