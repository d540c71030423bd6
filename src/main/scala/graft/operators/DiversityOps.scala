package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ecological diversity metrics over a long-format sample×feature
  * abundance table — the standard derived statistics of omics
  * preprocessing (reference semantics: the abundance-table analysis
  * surface `biosets` feeds downstream, e.g.
  * `src/biosets/packaged_modules/` count matrices; the metrics
  * themselves are the public textbook definitions).
  *
  * Alpha diversity (per sample): observed richness, Shannon entropy
  * `H = −Σ p ln p`, Gini–Simpson `1 − Σ p²`, with `p = v / Σv`.
  * Computed via the algebraic identities
  * `H = ln T − (Σ v ln v)/T` and `Σ p² = (Σ v²)/T²`, so the whole
  * thing is ONE map-side-combinable `groupBy(sample)` — one shuffle,
  * no join back for the totals, no second pass.
  *
  * Beta diversity (per sample pair): Bray–Curtis dissimilarity
  * `BC(a,b) = Σ_f |x_af − x_bf| / (Σ_f x_af + Σ_f x_bf)`.
  * The sparse-join decomposition keeps it linear in the NONZERO
  * entries: features present in only one of the two samples
  * contribute `|x − 0| = x`, so
  * `Σ|x−y| = Σ_shared |x−y| + (T_a − S_a) + (T_b − S_b)`
  * where `S` sums a sample's values over the SHARED features only.
  * The shared part is an equi-join on the feature key (ONE hash
  * shuffle, linear in nonzeros — never a dense sample×feature
  * matrix); totals ride in from a tiny per-sample aggregate.
  * Pairs sharing no feature never appear in the join and fall out
  * of the outer pair frame with BC = 1.
  *
  * Scale note: the OUTPUT is quadratic in the number of samples —
  * that is the definition of a pairwise matrix, not a plan defect.
  * Callers subset the sample dimension (beta diversity over a
  * cohort), while the feature dimension — the 100 TB axis — stays
  * fully distributed in the shared-feature join.
  */
object DiversityOps {

  /** Per-sample alpha diversity. Zero/negative abundances are
    * treated as absent (standard: diversity is over observed taxa).
    * Duplicate (sample, feature) rows are pre-summed so semantics
    * don't depend on the physical row layout.
    *
    * @return (sample, richness, shannon, simpson), metrics rounded
    *         to the 1e-6 grid for cross-engine stability.
    */
  def alphaDiversity(
      df: DataFrame,
      sampleCol: String,
      featureCol: String,
      valueCol: String
  ): DataFrame = {
    val m = df
      .groupBy(col(sampleCol).as("sample"), col(featureCol).as("feature"))
      .agg(sum(col(valueCol).cast("double")).as("v"))
      .filter(col("v") > 0)
    m.groupBy("sample")
      .agg(
        count(lit(1)).as("richness"),
        sum(col("v")).as("__t"),
        sum(col("v") * log(col("v"))).as("__vlv"),
        sum(col("v") * col("v")).as("__v2"))
      .select(
        col("sample"),
        col("richness"),
        (floor((log(col("__t")) - col("__vlv") / col("__t")) * 1e6 + lit(0.5)) / 1e6).as("shannon"),
        (floor((lit(1.0) - col("__v2") / (col("__t") * col("__t"))) * 1e6 + lit(0.5)) / 1e6).as("simpson"))
  }

  /** Pairwise Bray–Curtis dissimilarity over every sample pair
    * (a < b). See the object doc for the sparse decomposition.
    *
    * @return (sample_a, sample_b, bray_curtis) rounded to 1e-6.
    */
  def brayCurtis(
      df: DataFrame,
      sampleCol: String,
      featureCol: String,
      valueCol: String
  ): DataFrame = {
    val m = df
      .groupBy(col(sampleCol).as("s"), col(featureCol).as("f"))
      .agg(sum(col(valueCol).cast("double")).as("v"))
      .filter(col("v") > 0)
    val tot = m.groupBy(col("s")).agg(sum(col("v")).as("t"))
    // shared-feature part: ONE equi-join on the feature key
    val shared = m.as("a")
      .join(m.as("b"), col("a.f") === col("b.f") && col("a.s") < col("b.s"))
      .groupBy(col("a.s").as("sample_a"), col("b.s").as("sample_b"))
      .agg(
        sum(abs(col("a.v") - col("b.v"))).as("__sd"),
        sum(col("a.v")).as("__sa"),
        sum(col("b.v")).as("__sb"))
    // pair frame: totals × totals (quadratic by definition — the
    // caller bounds the sample dimension); broadcast one side when
    // small so no shuffle is added
    tot.as("ta")
      .join(broadcast(tot.as("tb")), col("ta.s") < col("tb.s"))
      .select(col("ta.s").as("sample_a"), col("tb.s").as("sample_b"),
        col("ta.t").as("__tta"), col("tb.t").as("__ttb"))
      .join(shared, Seq("sample_a", "sample_b"), "left")
      .select(
        col("sample_a"), col("sample_b"),
        (floor(
          (coalesce(col("__sd"), lit(0.0))
            + (col("__tta") - coalesce(col("__sa"), lit(0.0)))
            + (col("__ttb") - coalesce(col("__sb"), lit(0.0))))
            / (col("__tta") + col("__ttb")) * 1e6 + lit(0.5)) / 1e6).as("bray_curtis"))
  }
}
