package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation metrics over scored frames — the eval harness
  * for the trained filters in [[ClassifierOps]] and any score
  * column a curation pipeline gates on (quality, LM perplexity,
  * ANN similarity). Every metric is built from integer counts and
  * snapped ratios, so results replay bit-for-bit cross-engine.
  *
  * Reference scope note: biosets delegates evaluation to sklearn
  * on collected pandas frames; at 100 TB the metrics themselves
  * must be distributed aggregations.
  */
object EvalOps {

  private def snap9(c: Column): Column =
    floor(c * lit(1e9) + lit(0.5)) / lit(1e9)

  /** Confusion matrix + threshold metrics per group: rows with
    * `score >= threshold` are predicted positive; `labelCol` is
    * truth (nonzero/true = positive). ONE map-side-combinable
    * groupBy carrying four conditional counters — no second pass,
    * no value buffering; the output frame is |groups| rows.
    *
    * precision/recall/f1/accuracy are integer-count ratios on the
    * 1e-9 grid; degenerate denominators (no predicted positives,
    * no actual positives) yield NULL rather than a fake 0.
    */
  def confusionMetrics(
      df: DataFrame,
      labelCol: String,
      scoreCol: String,
      threshold: Double,
      groupCols: Seq[String] = Nil
  ): DataFrame = {
    val lbl = col(labelCol).cast("boolean")
    val pred = col(scoreCol) >= lit(threshold)
    val base = df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
    val agg = base.groupBy(groupCols.map(col): _*).agg(
      sum(when(lbl && pred, 1L).otherwise(0L)).as("tp"),
      sum(when(!lbl && pred, 1L).otherwise(0L)).as("fp"),
      sum(when(!lbl && !pred, 1L).otherwise(0L)).as("tn"),
      sum(when(lbl && !pred, 1L).otherwise(0L)).as("fn"))
    val tp = col("tp").cast("double"); val fp = col("fp").cast("double")
    val tn = col("tn").cast("double"); val fn = col("fn").cast("double")
    val precision = when(col("tp") + col("fp") > 0, snap9(tp / (tp + fp)))
    val recall = when(col("tp") + col("fn") > 0, snap9(tp / (tp + fn)))
    val accuracy = snap9((tp + tn) / (tp + fp + tn + fn))
    // f1 from the SNAPPED precision/recall so the ratio-of-ratios
    // replays: 2pr/(p+r), NULL when either side is NULL or p+r = 0.
    val f1 = when(precision.isNotNull && recall.isNotNull && (precision + recall > 0),
      snap9(lit(2.0) * precision * recall / (precision + recall)))
    agg.select((groupCols.map(col) ++ Seq(
      col("tp"), col("fp"), col("tn"), col("fn"),
      accuracy.as("accuracy"), precision.as("precision"),
      recall.as("recall"), f1.as("f1"))): _*)
  }

  /** ROC AUC per group via the rank-sum (Mann–Whitney) identity
    * with exact tie averaging: AUC = (Σ ranks⁺ − n⁺(n⁺+1)/2) /
    * (n⁺·n⁻), where tied scores share their block's average rank.
    *
    * Scale shape — the [[DriftOps.ksStatistic]] distinct-value
    * discipline: groupBy(group, score) collapses the rows to the
    * DISTINCT-score frame (counts only, aggregator memory is
    * distinct scores, not rows), a cumulative window over that
    * frame assigns block ranks, and a final groupBy(group) reduces
    * to one row per group. Everything until the last division is
    * exact integer arithmetic: 2·Σranks⁺ = Σ n⁺_block·(2·cumBefore
    * + n_block + 1), so no float enters before the single snapped
    * ratio. One-class groups yield NULL.
    */
  def auc(
      df: DataFrame,
      labelCol: String,
      scoreCol: String,
      groupCols: Seq[String] = Nil
  ): DataFrame = {
    val lbl = col(labelCol).cast("boolean")
    val blocks = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy((groupCols.map(col) :+ col(scoreCol).as("__s")): _*)
      .agg(count(lit(1)).as("__n"),
        sum(when(lbl, 1L).otherwise(0L)).as("__np"))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = blocks.withColumn("__cum", coalesce(sum(col("__n")).over(w), lit(0L)))
    val agg = ranked.groupBy(groupCols.map(col): _*).agg(
      // 2·Σ(average ranks of positives), exact in longs
      sum(col("__np") * (lit(2L) * col("__cum") + col("__n") + lit(1L))).as("__r2"),
      sum(col("__np")).as("n_pos"),
      sum(col("__n") - col("__np")).as("n_neg"))
    val np = col("n_pos"); val nn = col("n_neg")
    val aucCol = when(np > 0 && nn > 0,
      snap9((col("__r2") - np * (np + lit(1L))).cast("double") /
        (lit(2.0) * np.cast("double") * nn.cast("double"))))
    agg.select((groupCols.map(col) ++ Seq(np, nn, aucCol.as("auc"))): _*)
  }

  /** Cohen's kappa between two categorical columns per group —
    * chance-corrected agreement (annotator consistency, heuristic
    * vs declared metadata, model vs model). ONE groupBy(group, a,
    * b) contingency shuffle (the [[StatsOps.chiSquaredIndependence]]
    * machinery), marginal joins over the |groups|·|cats| frame
    * only. p_o and p_e are integer-count ratios snapped to the
    * 1e-9 grid; kappa = (p_o − p_e)/(1 − p_e) from the snapped
    * terms, NULL when p_e = 1 (a single-cell degenerate table).
    */
  def cohenKappa(
      df: DataFrame,
      colA: String,
      colB: String,
      groupCols: Seq[String] = Nil
  ): DataFrame = {
    if (groupCols.isEmpty) {
      // grouped path throughout — a constant key makes the joins
      // uniform; dropped on the way out
      val g = "__g"
      return cohenKappa(df.withColumn(g, lit(1)), colA, colB, Seq(g)).drop(g)
    }
    val cells = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy((groupCols.map(col) ++ Seq(col(colA).as("__a"), col(colB).as("__b"))): _*)
      .agg(count(lit(1)).as("__n"))
    val gCols = groupCols.map(col)
    val totals = cells.groupBy(gCols: _*).agg(sum("__n").as("__t"))
    val rowM = cells.groupBy((gCols :+ col("__a")): _*).agg(sum("__n").as("__ra"))
    val colM = cells.groupBy((gCols :+ col("__b")): _*).agg(sum("__n").as("__cb"))
    // expected agreement: Σ_k rowMarg(k)·colMarg(k) over categories
    // present on BOTH axes (absent-side marginal is 0 — drops out)
    val pairKeys = groupCols :+ "__k"
    val eTerms = rowM.withColumnRenamed("__a", "__k")
      .join(colM.withColumnRenamed("__b", "__k"), pairKeys, "inner")
      .groupBy(gCols: _*).agg(sum(col("__ra") * col("__cb")).as("__e"))
    val diag = cells.filter(col("__a") === col("__b"))
      .groupBy(gCols: _*).agg(sum("__n").as("__d"))
    val joined = totals
      .join(diag, groupCols, "left")
      .join(eTerms, groupCols, "left")
      .na.fill(0L, Seq("__d"))
    val t = col("__t").cast("double")
    val po = snap9(coalesce(col("__d"), lit(0L)).cast("double") / t)
    val pe = snap9(coalesce(col("__e"), lit(0L)).cast("double") / (t * t))
    val kappa = when(pe < 1.0, snap9((po - pe) / (lit(1.0) - pe)))
    joined.select((gCols ++ Seq(col("__t").as("n"), po.as("p_o"), pe.as("p_e"),
      kappa.as("kappa"))): _*)
  }

  /** Reliability (calibration) curve per group: scores in [0, 1]
    * fall into `bins` fixed-width buckets; each bucket reports its
    * population, mean predicted score, and empirical positive rate —
    * the classifier-calibration diagnostic behind reliability
    * diagrams and ECE. `gap = mean_score − pos_rate` (positive =
    * over-confident) from the snapped terms.
    *
    * ONE map-side-combinable `groupBy(group, bin)` — no sort, no
    * window, no per-row state; the output frame is |groups|·bins
    * rows. pos_rate is an exact integer ratio; mean_score is the
    * snapped-mean discipline ([[StatsOps.momentsProfile]]).
    */
  def calibrationCurve(
      df: DataFrame,
      labelCol: String,
      scoreCol: String,
      bins: Int = 10,
      groupCols: Seq[String] = Nil
  ): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val lbl = col(labelCol).cast("boolean")
    val s = col(scoreCol).cast("double")
    val bin = least(greatest(floor(s * bins), lit(0)), lit(bins - 1)).cast("int")
    val gs = groupCols.map(col)
    val agg = df.filter(s.isNotNull && col(labelCol).isNotNull)
      .groupBy(gs :+ bin.as("bin"): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(when(lbl, 1L).otherwise(0L)).as("n_pos"),
        snap9(avg(s)).as("mean_score"))
    val rate = snap9(col("n_pos").cast("double") / col("n").cast("double"))
    agg.select(gs ++ Seq(col("bin"),
      (col("bin").cast("double") / bins).as("bin_lo"),
      ((col("bin") + 1).cast("double") / bins).as("bin_hi"),
      col("n"), col("n_pos"), col("mean_score"), rate.as("pos_rate"),
      snap9(col("mean_score") - rate).as("gap")): _*)
  }

  /** Two-proportion z-test per experiment group — the A/B-test
    * read-out ("did variant B convert better, and is the lift
    * real"): pooled-variance z on conversion rates, two-sided
    * p-value via the same Abramowitz–Stegun erfc chain as the
    * [[graft.operators.StatsOps]] t/χ² tests, so significance is
    * graded consistently across the stats surface.
    *
    * Input: one row per SUBJECT — `(groupCols*, variantCol,
    * convCol)` with conv 0/1. ONE map-side-combinable `groupBy`
    * collapses subjects to four exact counters per group (n/x per
    * variant); everything after is closed-form column arithmetic on
    * the 1e-9 grid over the tiny group frame. Groups missing either
    * variant, or with a degenerate pooled rate (0 or 1 — no
    * variance), emit null z/p.
    *
    * @param variantA control label, `variantB` treatment label
    *                 (other variant values drop)
    * @return (groupCols*, n_a, x_a, n_b, x_b, p_a, p_b, lift, z,
    *         p_value)
    */
  def abTest(
      df: DataFrame,
      groupCols: Seq[String],
      variantCol: String,
      convCol: String,
      variantA: String,
      variantB: String
  ): DataFrame = {
    val gs = groupCols.map(col)
    val isA = col(variantCol) === variantA
    val isB = col(variantCol) === variantB
    val conv = col(convCol).cast("long")
    val agg = df
      .filter((isA || isB) && conv.isNotNull)
      .groupBy(gs: _*)
      .agg(
        sum(when(isA, 1L).otherwise(0L)).as("n_a"),
        sum(when(isA, conv).otherwise(0L)).as("x_a"),
        sum(when(isB, 1L).otherwise(0L)).as("n_b"),
        sum(when(isB, conv).otherwise(0L)).as("x_b"))
    val pA = snap9(col("x_a").cast("double") / col("n_a"))
    val pB = snap9(col("x_b").cast("double") / col("n_b"))
    val pooled = snap9((col("x_a") + col("x_b")).cast("double") / (col("n_a") + col("n_b")))
    val se = sqrt(col("__pool") * (lit(1.0) - col("__pool")) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    val z = snap9((col("p_b") - col("p_a")) / se)
    agg
      .withColumn("p_a", when(col("n_a") > 0, pA))
      .withColumn("p_b", when(col("n_b") > 0, pB))
      .withColumn("__pool", pooled)
      .withColumn("z",
        when(col("n_a") > 0 && col("n_b") > 0 &&
          col("__pool") > 0 && col("__pool") < 1, z))
      .select(gs ++ Seq(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        col("p_a"), col("p_b"), snap9(col("p_b") - col("p_a")).as("lift"),
        col("z"),
        snap9(StatsOps.normalTwoSided(col("z"))).as("p_value")): _*)
  }

  /** nDCG@k per ranking group (Järvelin & Kekäläinen 2002) — graded
    * ranking quality for the retrieval stack (BM25/TF-IDF/RRF
    * produce rankings; [[auc]] grades binary separation, this grades
    * POSITION-discounted graded relevance). `DCG = Σ_{i≤k}
    * rel_i/log₂(i+1)` over the given order; IDCG re-ranks the SAME
    * candidate rows by relevance (the self-contained form — supply
    * the full judged pool per group if you need pool-ideal nDCG).
    *
    * Scale shape: two `row_number` windows over the same group
    * partitioning (rank order + ideal order — one shuffle, two
    * sorts), then ONE map-side-combinable `groupBy`; per-group
    * memory is O(1). Discounts use `ln(i+1)` against the plan-time
    * `ln 2` literal so an oracle replays each term; sums snap at
    * 1e-9 before the final ratio.
    *
    * @param orderCols the ranking order (best first — include a
    *                  unique tie-break)
    * @return (groupCols*, n_items, dcg, idcg, ndcg) — ndcg null when
    *         the group has no positive relevance
    */
  def ndcgAtK(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[String],
      relCol: String,
      k: Int
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(orderCols.nonEmpty, "need at least one ordering column")
    val gs = groupCols.map(col)
    val ln2 = lit(math.log(2.0))
    val rel = col(relCol).cast("double")
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(gs: _*).orderBy(orderCols.map(col): _*)
    val wIdeal = org.apache.spark.sql.expressions.Window
      .partitionBy(gs: _*)
      .orderBy(rel.desc +: orderCols.map(col): _*)
    val terms = df.filter(rel.isNotNull)
      .withColumn("__rn", row_number().over(wRank))
      .withColumn("__irn", row_number().over(wIdeal))
      .withColumn("__t",
        when(col("__rn") <= k, rel / (log(col("__rn").cast("double") + 1.0) / ln2))
          .otherwise(lit(0.0)))
      .withColumn("__it",
        when(col("__irn") <= k, rel / (log(col("__irn").cast("double") + 1.0) / ln2))
          .otherwise(lit(0.0)))
    terms.groupBy(gs: _*)
      .agg(count(lit(1)).as("n_items"),
        snap9(sum(col("__t"))).as("dcg"),
        snap9(sum(col("__it"))).as("idcg"))
      .select(gs ++ Seq(col("n_items"), col("dcg"), col("idcg"),
        when(col("idcg") > 0, snap9(col("dcg") / col("idcg"))).as("ndcg")): _*)
  }

  /** Binary rank metrics per group — precision@k, recall@k, hit@k
    * and MRR in ONE pass (the binary companions to [[ndcgAtK]]'s
    * graded score, the standard retrieval/recommender report row).
    *
    * One `row_number` window over the ranking order, then one
    * map-side-combinable `groupBy`: hits@k and the total relevant
    * count are exact integer sums, the first-relevant rank is a
    * conditional `min` — every metric an exact-integer ratio on the
    * 1e-9 grid. Recall/MRR null when the group has no relevant item;
    * precision divides by the FIXED k (the standard form — groups
    * with fewer than k candidates are penalized, as a cut-off
    * report should).
    *
    * @param relCol nonzero/true = relevant
    * @return (groupCols*, n_items, n_rel, hits_at_k, precision_at_k,
    *         recall_at_k, hit_at_k, mrr)
    */
  def rankMetrics(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[String],
      relCol: String,
      k: Int
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(orderCols.nonEmpty, "need at least one ordering column")
    val gs = groupCols.map(col)
    val rel = col(relCol).cast("double") =!= 0.0
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gs: _*).orderBy(orderCols.map(col): _*)
    val agg = df.filter(col(relCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .groupBy(gs: _*)
      .agg(
        count(lit(1)).as("n_items"),
        sum(when(rel, 1L).otherwise(0L)).as("n_rel"),
        sum(when(rel && col("__rn") <= k, 1L).otherwise(0L)).as("hits_at_k"),
        min(when(rel, col("__rn"))).as("__first"))
    agg.select(gs ++ Seq(col("n_items"), col("n_rel"), col("hits_at_k"),
      snap9(col("hits_at_k").cast("double") / lit(k.toDouble)).as("precision_at_k"),
      when(col("n_rel") > 0,
        snap9(col("hits_at_k").cast("double") / col("n_rel"))).as("recall_at_k"),
      when(col("hits_at_k") > 0, 1).otherwise(0).as("hit_at_k"),
      when(col("n_rel") > 0,
        snap9(lit(1.0) / col("__first"))).as("mrr")): _*)
  }

  /** Group-fairness report for a thresholded score (the 80%-rule /
    * disparate-impact screen plus equal-opportunity gaps): per
    * protected-attribute value, selection rate at `score >=
    * threshold`, its ratio to the MOST-selected group
    * (`di_ratio` — the four-fifths rule reads this against 0.8),
    * and truth-conditioned TPR/FPR with the equal-opportunity gap
    * `max TPR − TPR`. A curation gate (quality/classifier/LM
    * score) that silently under-selects one language or source is
    * exactly this report's job to surface.
    *
    * Scale shape: ONE map-side-combinable groupBy carrying six
    * conditional counters collapses any input to |groups ×
    * protected values| rows; the cross-group maxima are window
    * aggregates over THAT tiny frame (partitioned by `groupCols`),
    * never a second data pass. All rates are integer-count ratios
    * snapped to the 1e-9 grid; ratios-of-rates divide the SNAPPED
    * rates so the frame replays cross-engine. Degenerate
    * denominators (empty class, zero max rate) yield NULL.
    */
  def fairnessReport(
      df: DataFrame,
      protectedCol: String,
      labelCol: String,
      scoreCol: String,
      threshold: Double,
      groupCols: Seq[String] = Nil
  ): DataFrame = {
    val gs = groupCols.map(col)
    val lbl = col(labelCol).cast("boolean")
    val pred = col(scoreCol) >= lit(threshold)
    val agg = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull && col(protectedCol).isNotNull)
      .groupBy(gs :+ col(protectedCol): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(when(pred, 1L).otherwise(0L)).as("sel"),
        sum(when(lbl && pred, 1L).otherwise(0L)).as("tp"),
        sum(when(lbl && !pred, 1L).otherwise(0L)).as("fn"),
        sum(when(!lbl && pred, 1L).otherwise(0L)).as("fp"),
        sum(when(!lbl && !pred, 1L).otherwise(0L)).as("tn"))
      .withColumn("sel_rate", snap9(col("sel").cast("double") / col("n")))
      .withColumn("tpr", when(col("tp") + col("fn") > 0,
        snap9(col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))))
      .withColumn("fpr", when(col("fp") + col("tn") > 0,
        snap9(col("fp").cast("double") / (col("fp") + col("tn")).cast("double"))))
    // cross-group maxima over the |groups·values|-sized agg frame —
    // a window on the tiny frame, not a second pass over the data
    val w = org.apache.spark.sql.expressions.Window.partitionBy(gs: _*)
    agg
      .withColumn("__max_sel", max(col("sel_rate")).over(w))
      .withColumn("__max_tpr", max(col("tpr")).over(w))
      .withColumn("di_ratio", when(col("__max_sel") > 0,
        snap9(col("sel_rate") / col("__max_sel"))))
      .withColumn("eq_opp_gap", when(col("tpr").isNotNull && col("__max_tpr").isNotNull,
        snap9(col("__max_tpr") - col("tpr"))))
      .drop("__max_sel", "__max_tpr")
  }

  /** Average precision per group (AP — the area under the PR curve
    * as the threshold sweeps every distinct score; sklearn's
    * `average_precision_score` step formulation `Σ ΔRecall·P`; the
    * single-number imbalanced-data metric next to [[auc]]'s ROC
    * view and [[prCurve]]'s fixed grid): descending distinct-score
    * blocks contribute `(blockTP/n_pos) · P(after block)`.
    *
    * Scale shape — the [[auc]] distinct-value discipline: ONE
    * groupBy(group, score) collapses rows to the distinct-score
    * frame (counts only), cumulative windows over that frame give
    * the per-block precision, and ONE final groupBy reduces to a
    * row per group. All counts exact integers; each block's P and
    * term snap to the 1e-9 grid before the snapped sum. No-positive
    * groups yield NULL.
    */
  def averagePrecision(
      df: DataFrame,
      labelCol: String,
      scoreCol: String,
      groupCols: Seq[String] = Nil
  ): DataFrame = {
    val gs = groupCols.map(col)
    val pos = col(labelCol).cast("double") =!= 0.0
    val blocks = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(gs :+ col(scoreCol).cast("double").as("__s"): _*)
      .agg(count(lit(1)).as("__n"), sum(when(pos, 1L).otherwise(0L)).as("__np"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gs: _*).orderBy(col("__s").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(gs: _*)
    val staged = blocks
      .withColumn("__cumN", sum(col("__n")).over(w))
      .withColumn("__cumP", sum(col("__np")).over(w))
      .withColumn("__npos", sum(col("__np")).over(wAll))
      .withColumn("__term", when(col("__npos") > 0 && col("__np") > 0,
        snap9(snap9(col("__cumP").cast("double") / col("__cumN").cast("double")) *
          col("__np").cast("double") / col("__npos").cast("double"))).otherwise(lit(0.0)))
    staged
      .groupBy(gs: _*)
      .agg(
        max(col("__npos")).as("n_pos"),
        sum(col("__n")).as("n"),
        snap9(sum(col("__term"))).as("__ap"))
      .select(gs ++ Seq(col("n"), col("n_pos"),
        when(col("n_pos") > 0, col("__ap")).as("avg_precision")): _*)
  }

  /** Precision-recall curve at a fixed threshold grid — the sweep
    * form of [[confusionMetrics]] (E2 reads ONE operating point,
    * this frames the whole trade-off; with [[auc]]'s single rank
    * statistic it completes the threshold-choice toolkit for any
    * gate score). Each row of the output is one threshold's
    * confusion counts + snapped P/R/F1.
    *
    * Scale shape: the row side explodes by the (small, plan-time
    * literal) threshold list — a fixed |thresholds|× fan-out — and
    * ONE map-side-combinable groupBy(group, threshold) collapses to
    * |groups·thresholds| rows. No per-threshold pass, no sort, no
    * distinct-score frame.
    */
  def prCurve(
      df: DataFrame,
      labelCol: String,
      scoreCol: String,
      thresholds: Seq[Double],
      groupCols: Seq[String] = Nil
  ): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val gs = groupCols.map(col)
    val lbl = col(labelCol).cast("boolean")
    val pred = col(scoreCol) >= col("threshold")
    df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .withColumn("threshold", explode(array(thresholds.distinct.sorted.map(lit): _*)))
      .groupBy(gs :+ col("threshold"): _*)
      .agg(
        sum(when(lbl && pred, 1L).otherwise(0L)).as("tp"),
        sum(when(!lbl && pred, 1L).otherwise(0L)).as("fp"),
        sum(when(lbl && !pred, 1L).otherwise(0L)).as("fn"))
      .withColumn("precision", when(col("tp") + col("fp") > 0,
        snap9(col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))))
      .withColumn("recall", when(col("tp") + col("fn") > 0,
        snap9(col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))))
      .withColumn("f1", when(col("precision").isNotNull && col("recall").isNotNull &&
          (col("precision") + col("recall") > 0),
        snap9(lit(2.0) * col("precision") * col("recall") /
          (col("precision") + col("recall")))))
  }

  /** Per-group rate with a Wilson score confidence interval (the
    * dashboard-correct error bar for proportions: unlike the
    * normal-approximation ±z√(p(1−p)/n) it never leaves [0,1] and
    * stays honest at small n or extreme p — the interval every
    * conversion/violation/accuracy rate should ship with):
    *
    *   center = (p + z²/2n)/(1 + z²/n),
    *   halfwidth = z·√(p(1−p)/n + z²/4n²)/(1 + z²/n)
    *
    * Scale shape: ONE map-side-combinable groupBy of two counters;
    * the interval is scan-stage arithmetic over the |groups| frame,
    * every derived value snapped at 1e-9 in the same order the
    * oracle replays.
    */
  def rateWithCi(
      df: DataFrame,
      labelCol: String,
      groupCols: Seq[String] = Nil,
      z: Double = 1.96
  ): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    val gs = groupCols.map(col)
    val pos = col(labelCol).cast("double") =!= 0.0
    val agg = df.filter(col(labelCol).isNotNull)
      .groupBy(gs: _*)
      .agg(count(lit(1)).as("n"), sum(when(pos, 1L).otherwise(0L)).as("k"))
    val n = col("n").cast("double")
    val p = col("__p")
    val z2 = lit(z * z)
    agg
      .withColumn("__p", snap9(col("k").cast("double") / n))
      .withColumn("rate", col("__p"))
      .withColumn("__denom", snap9(lit(1.0) + z2 / n))
      .withColumn("__center", snap9((p + z2 / (lit(2.0) * n)) / col("__denom")))
      .withColumn("__hw", snap9(lit(z) *
        sqrt(p * (lit(1.0) - p) / n + z2 / (lit(4.0) * n * n)) / col("__denom")))
      .withColumn("ci_lo", snap9(col("__center") - col("__hw")))
      .withColumn("ci_hi", snap9(col("__center") + col("__hw")))
      .select(gs ++ Seq(col("n"), col("k"), col("rate"), col("ci_lo"), col("ci_hi")): _*)
  }

  /** STREAMING windowed rates with Wilson intervals — [[rateWithCi]]
    * per event-time window (conversion/error rate monitoring with
    * honest error bars, the metric twin of
    * [[graft.operators.QualityOps.checkWindowed]]): ONE windowed
    * streaming aggregation of two counters (per-window state is two
    * longs, SUM-mergeable downstream), the Wilson arithmetic a
    * stateless post-projection. Works identically on a batch frame
    * — the batch run IS the oracle twin.
    */
  def rateWithCiWindowed(
      events: DataFrame,
      tsCol: String,
      labelCol: String,
      windowLen: String,
      z: Double = 1.96,
      watermark: String = "2 hours"
  ): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    val pos = col(labelCol).cast("double") =!= 0.0
    val src = if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    val agg = src.filter(col(labelCol).isNotNull)
      .groupBy(window(col(tsCol), windowLen).as("w"))
      .agg(count(lit(1)).as("n"), sum(when(pos, 1L).otherwise(0L)).as("k"))
      .select(col("w.start").as("window_start"), col("n"), col("k"))
    val n = col("n").cast("double")
    val p = col("__p")
    val z2 = lit(z * z)
    agg
      .withColumn("__p", snap9(col("k").cast("double") / n))
      .withColumn("rate", col("__p"))
      .withColumn("__denom", snap9(lit(1.0) + z2 / n))
      .withColumn("__center", snap9((p + z2 / (lit(2.0) * n)) / col("__denom")))
      .withColumn("__hw", snap9(lit(z) *
        sqrt(p * (lit(1.0) - p) / n + z2 / (lit(4.0) * n * n)) / col("__denom")))
      .withColumn("ci_lo", snap9(col("__center") - col("__hw")))
      .withColumn("ci_hi", snap9(col("__center") + col("__hw")))
      .select(col("window_start"), col("n"), col("k"), col("rate"),
        col("ci_lo"), col("ci_hi"))
  }

  /** Cumulative gains / lift chart at equal-population score
    * buckets ("target the top decile, capture X% of responders" —
    * the campaign-targeting read-out next to [[prCurve]]'s
    * threshold sweep): rows bucket by descending score via ntile
    * (ties broken by `tieCol` for an engine-total order), then per
    * bucket: counts, positives, cumulative capture rate and
    * cumulative lift vs the base rate.
    *
    * Scale shape: one ntile window per group (the same single
    * total-order axis as G7's buckets — grouped use keeps
    * partitions parallel), ONE map-side-combinable
    * groupBy(group, bucket), then cumulative windows over the
    * |groups·n| bucket frame. Ratios snap at 1e-9.
    */
  def gainsChart(
      df: DataFrame,
      labelCol: String,
      scoreCol: String,
      tieCol: String,
      n: Int = 10,
      groupCols: Seq[String] = Nil
  ): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    val gs = groupCols.map(col)
    val pos = col(labelCol).cast("double") =!= 0.0
    val wTile = org.apache.spark.sql.expressions.Window
      .partitionBy(gs: _*).orderBy(col(scoreCol).desc, col(tieCol))
    val buckets = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .withColumn("bucket", ntile(n).over(wTile))
      .groupBy(gs :+ col("bucket"): _*)
      .agg(count(lit(1)).as("n_rows"), sum(when(pos, 1L).otherwise(0L)).as("n_pos"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(gs: _*).orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(gs: _*)
    buckets
      .withColumn("cum_rows", sum(col("n_rows")).over(wCum))
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .withColumn("__tp", sum(col("n_pos")).over(wAll))
      .withColumn("__tn", sum(col("n_rows")).over(wAll))
      .withColumn("capture_rate", when(col("__tp") > 0,
        snap9(col("cum_pos").cast("double") / col("__tp"))))
      .withColumn("cum_lift", when(col("__tp") > 0,
        snap9(snap9(col("cum_pos").cast("double") / col("cum_rows")) /
          snap9(col("__tp").cast("double") / col("__tn")))))
      .drop("__tp", "__tn")
  }

  /** Clipped n-gram precision/recall/F1 between a candidate and a
    * reference text per row — the core of BLEU-n/ROUGE-n (modified
    * n-gram precision WITH multiplicity clipping: a candidate that
    * repeats "the the the" cannot farm credit beyond the
    * reference's own count). The eval harness for summarization/
    * paraphrase/synthetic-data pipelines, and a graded text-pair
    * similarity next to [[graft.operators.DedupOps.ngramNovelty]]'s
    * corpus-level novelty.
    *
    * overlap = Σ_g min(count_cand(g), count_ref(g));
    * precision = overlap / |cand grams|, recall = overlap /
    * |ref grams|, F1 from the SNAPPED P/R. Texts with fewer than n
    * tokens have no n-grams → NULL metrics (BLEU's convention, not
    * a fake 0). Tokenization is the corpus-wide `[^\p{L}\p{N}]+`
    * lower split shared by the dedup family.
    *
    * Scale shape: each side explodes to its grams WITH multiplicity
    * and collapses to (id, gram, count) in ONE map-side-combinable
    * groupBy; the overlap is a hash equi-join on (id, gram) —
    * per-pair cost is the pair's own gram count, never corpus-wide
    * state — and ONE groupBy(id) re-collapses. All counts exact
    * integers; ratios snap to the 1e-9 grid.
    */
  def ngramPrf(
      df: DataFrame,
      idCol: String,
      candCol: String,
      refCol: String,
      n: Int = 2
  ): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    def grams(c: Column): Column = {
      val toks = filter(split(lower(c), "[^\\p{L}\\p{N}]+"), x => x =!= "")
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array().cast("array<string>"))
    }
    def sideCounts(textCol: String, cnt: String): DataFrame =
      df.select(col(idCol), explode(coalesce(grams(col(textCol)),
          array().cast("array<string>"))).as("__g"))
        .groupBy(col(idCol), col("__g"))
        .agg(count(lit(1)).as(cnt))
    val cand = sideCounts(candCol, "__cc")
    val ref = sideCounts(refCol, "__rc")
    val joined = cand.join(ref, Seq(idCol, "__g"), "full_outer")
      .groupBy(col(idCol))
      .agg(
        sum(coalesce(col("__cc"), lit(0L))).as("cand_grams"),
        sum(coalesce(col("__rc"), lit(0L))).as("ref_grams"),
        sum(least(coalesce(col("__cc"), lit(0L)), coalesce(col("__rc"), lit(0L))))
          .as("overlap"))
    // rows where BOTH sides have < n tokens never reach the join —
    // restore them with zero counts from the id frame
    df.select(col(idCol)).distinct()
      .join(joined, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cand_grams"), lit(0L)).as("cand_grams"),
        coalesce(col("ref_grams"), lit(0L)).as("ref_grams"),
        coalesce(col("overlap"), lit(0L)).as("overlap"))
      .withColumn("precision", when(col("cand_grams") > 0,
        snap9(col("overlap").cast("double") / col("cand_grams"))))
      .withColumn("recall", when(col("ref_grams") > 0,
        snap9(col("overlap").cast("double") / col("ref_grams"))))
      .withColumn("f1", when(col("precision").isNotNull && col("recall").isNotNull &&
          (col("precision") + col("recall") > 0),
        snap9(lit(2.0) * col("precision") * col("recall") /
          (col("precision") + col("recall")))))
  }

  /** Expected / maximum calibration error over the [[calibrationCurve]]
    * bin frame — the two dashboard numbers of score trustworthiness:
    * `ece = Σ n_k/n · |p̄_k − ō_k|` (population-weighted gap) and
    * `mce = max_k |p̄_k − ō_k|` (worst bin). The threshold companion
    * of [[brierDecomposition]]'s reliability (same gaps, L1/L∞
    * instead of weighted L2). Same scale shape: ONE map-side-
    * combinable groupBy(groups, bin), arithmetic over ≤bins rows,
    * per-bin values snapped in replay order.
    *
    * @return one row per group: (groupCols*, n, n_bins, ece, mce)
    */
  def calibrationError(
      df: DataFrame,
      labelCol: String,
      scoreCol: String,
      bins: Int = 10,
      groupCols: Seq[String] = Nil
  ): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val s = col(scoreCol).cast("double")
    val lbl = col(labelCol).cast("boolean")
    val bin = least(greatest(floor(s * bins), lit(0)), lit(bins - 1)).cast("int")
    val gs = groupCols.map(col)
    val perBin = df.filter(s.isNotNull && col(labelCol).isNotNull)
      .groupBy(gs :+ bin.as("__bin"): _*)
      .agg(
        count(lit(1)).as("__nk"),
        sum(when(lbl, 1L).otherwise(0L)).as("__posk"),
        snap9(avg(s)).as("__pbark"))
      .withColumn("__gap",
        abs(col("__pbark") - snap9(col("__posk").cast("double") / col("__nk"))))
    perBin.groupBy(gs: _*)
      .agg(
        sum(col("__nk")).as("n"),
        count(lit(1)).as("n_bins"),
        snap9(sum(col("__nk") * col("__gap")) /
          sum(col("__nk")).cast("double")).as("ece"),
        snap9(max(col("__gap"))).as("mce"))
  }

  /** Brier score with the Murphy (1973) decomposition over binned
    * forecasts — the one-row "is this score a probability" read-out
    * that [[calibrationCurve]]'s per-bin frame rolls up to:
    * `brier = reliability − resolution + uncertainty + gap`, where
    * the gap carries the two terms binning hides — within-bin
    * forecast variance minus twice the within-bin forecast/outcome
    * covariance (Stephenson–Coelho–Jolliffe 2008); exactly 0 when
    * forecasts take only one value per bin, and NOT sign-definite
    * in general.
    * Pairs with [[graft.operators.CalibrateOps.isotonicCalibrate]]:
    * reliability is the number isotonic recalibration drives toward
    * 0; resolution is the ranking skill it cannot change.
    *
    * Scale shape: ONE map-side-combinable `groupBy(groups, bin)`
    * collapses any row count to ≤ `bins` rows per group (four
    * counters per cell: n, positives, Σscore, Σ(score−label)²);
    * the decomposition is arithmetic over that bounded frame.
    * No window, no second pass over the rows.
    *
    * Snap discipline: per-bin means and rates snap to the 1e-9 grid
    * in replay order (the [[calibrationCurve]] convention), then
    * every decomposition term snaps — the oracle replays the same
    * floor points.
    *
    * Labels MUST be binary {0, 1} — the decomposition's climatology
    * terms are positive RATES, undefined for soft labels. Non-binary
    * labels fail with a row-addressed scan-stage error (the same
    * contract [[calibrationError]] states via its boolean cast).
    *
    * @return one row per group: `n, brier, reliability, resolution,
    *         uncertainty, decomp_gap`
    */
  def brierDecomposition(
      df: DataFrame,
      labelCol: String,
      scoreCol: String,
      bins: Int = 10,
      groupCols: Seq[String] = Nil
  ): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val s = col(scoreCol).cast("double")
    // the Murphy decomposition is defined for BINARY outcomes: the
    // per-bin climatology ō_k is a positive RATE. A fractional (soft)
    // label would silently truncate in the positives sum while still
    // feeding (s−y)² — an internally inconsistent decomposition —
    // so non-{0,1} labels fail loudly in the scan stage instead.
    val yRaw = col(labelCol).cast("double")
    val y = when(yRaw =!= 0.0 && yRaw =!= 1.0,
      raise_error(concat(lit(s"brierDecomposition: $labelCol must be binary (0/1), got "),
        yRaw.cast("string"))))
      .otherwise(yRaw)
    val bin = least(greatest(floor(s * bins), lit(0)), lit(bins - 1)).cast("int")
    val gs = groupCols.map(col)
    val perBin = df.filter(s.isNotNull && col(labelCol).isNotNull)
      .groupBy(gs :+ bin.as("__bin"): _*)
      .agg(
        count(lit(1)).as("__nk"),
        sum(y.cast("long")).as("__posk"),
        snap9(avg(s)).as("__pbark"),
        sum(pow(s - y, 2)).as("__sqk"))
      .withColumn("__obark", snap9(col("__posk").cast("double") / col("__nk")))
    val n = col("__n").cast("double")
    val obar = snap9(col("__pos").cast("double") / n)
    perBin
      .groupBy(gs: _*)
      .agg(
        sum(col("__nk")).as("__n"),
        sum(col("__posk")).as("__pos"),
        sum(col("__sqk")).as("__sq"),
        // Σ n_k (p̄_k − ō_k)²: both factors already snapped, so the
        // per-bin term is deterministic; the ≤bins-row sum snaps once
        sum(col("__nk") * pow(col("__pbark") - col("__obark"), 2)).as("__rel"),
        // resolution needs the GLOBAL ō, which only exists after
        // this agg — carry Σ n_k·ō_k and Σ n_k·ō_k² and expand the
        // square algebraically below
        sum(col("__nk") * col("__obark")).as("__so"),
        sum(col("__nk") * pow(col("__obark"), 2)).as("__so2"))
      .withColumn("brier", snap9(col("__sq") / n))
      .withColumn("reliability", snap9(col("__rel") / n))
      // Σ n_k (ō_k − ō)²/n = Σ n_k ō_k²/n − 2ō·Σ n_k ō_k/n + ō²
      .withColumn("resolution",
        snap9(col("__so2") / n - lit(2.0) * obar * (col("__so") / n) + obar * obar))
      .withColumn("uncertainty", snap9(obar * (lit(1.0) - obar)))
      .withColumn("decomp_gap",
        snap9(col("brier") - col("reliability") + col("resolution") - col("uncertainty")))
      .select(gs ++ Seq(col("__n").as("n"), col("brier"), col("reliability"),
        col("resolution"), col("uncertainty"), col("decomp_gap")): _*)
  }
}
