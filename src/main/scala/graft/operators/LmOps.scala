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
}
