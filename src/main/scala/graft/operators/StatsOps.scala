package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Descriptive statistics + grouped aggregation surface
  * (reference: HF `Dataset` unique/summary paths the Bioset class
  * re-exports, arrow_dataset.py:26).
  *
  * All pure partial-aggregation shapes: map-side combine reduces
  * each of N input partitions to #groups rows before the single
  * shuffle.
  */
object StatsOps {

  /** Grouped summary of one value column. */
  def summarize(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(valueCol).as("sum"),
        avg(valueCol).as("mean"),
        min(valueCol).as("min"),
        max(valueCol).as("max"),
        stddev_samp(col(valueCol)).as("stddev")
      )

  /** describe() across several numeric columns → long table
    * (column, n, mean, min, max, stddev). One pass over the data.
    */
  def describeAll(df: DataFrame, valueCols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = valueCols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        avg(col(c)).as(s"${c}__mean"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        stddev_samp(col(c)).as(s"${c}__stddev")
      )
    }
    val onerow = df.agg(aggs.head, aggs.tail: _*)
    val stacked = valueCols
      .map(c => s"'$c', `${c}__n`, `${c}__mean`, `${c}__min`, `${c}__max`, `${c}__stddev`")
      .mkString(", ")
    onerow.select(
      expr(s"stack(${valueCols.size}, $stacked) as (column, n, mean, min, max, stddev)")
    )
  }

  /** value_counts: frequency of each value, most frequent first. */
  def valueCounts(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c)).agg(count(lit(1)).as("count")).orderBy(col("count").desc, col(c))

  /** Top-k rows per group by `orderCol` descending, ties broken by
    * `tieBreak` ascending (deterministic). Single window shuffle;
    * with a pushed `k` this is the rank-pushdown pattern AQE/Catalyst
    * optimize via `WindowGroupLimit` in Spark 3.5+ (top-k per group
    * never materializes full partitions).
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: String, tieBreak: String, k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(orderCol).desc, col(tieBreak))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Per-feature two-group differential test over a LONG table
    * (sample, feature, value, group) — the differential-abundance
    * shape downstream of every omics load ("which taxa differ
    * between cases and controls"). Emits, per feature: group
    * means/variances/counts, the Welch t-statistic, its
    * Welch–Satterthwaite degrees of freedom, and a normal-
    * approximation two-sided p-value plus its Benjamini–Hochberg
    * rank (the standard FDR ordering; with BH the rejection set at
    * level α is {features with rank r where p(r) ≤ α·r/m} — the
    * caller applies the cut).
    *
    * Everything through the t-statistic is pure arithmetic over ONE
    * partial-agg groupBy of the long table (no per-feature collect,
    * no window over raw rows) — which is also what makes it
    * oracle-checkable in ANSI SQL. The p-value uses the normal
    * approximation Φ(-|t|)·2 (erf via Abramowitz–Stegun 7.1.26,
    * |err| < 1.5e-7): exact enough for ranking and for the df sizes
    * omics tables have; BH ranking only needs the ORDER of
    * p-values, which equals the order of |t| only within equal df —
    * hence rank is computed on the p-value itself.
    *
    * Features present in only one group yield null t (no variance
    * contrast) and are excluded from the ranked output.
    */
  def differentialTest(
      df: DataFrame,
      featureCol: String,
      valueCol: String,
      groupCol: String,
      groupA: String,
      groupB: String
  ): DataFrame = {
    val agg = df
      .filter(col(groupCol).isin(groupA, groupB))
      .groupBy(col(featureCol))
      .agg(
        count(when(col(groupCol) === groupA, 1)).as("n_a"),
        avg(when(col(groupCol) === groupA, col(valueCol))).as("mean_a"),
        var_samp(when(col(groupCol) === groupA, col(valueCol))).as("var_a"),
        count(when(col(groupCol) === groupB, 1)).as("n_b"),
        avg(when(col(groupCol) === groupB, col(valueCol))).as("mean_b"),
        var_samp(when(col(groupCol) === groupB, col(valueCol))).as("var_b"))
      .filter(col("n_a") >= 2 && col("n_b") >= 2)
    val sa = col("var_a") / col("n_a")
    val sb = col("var_b") / col("n_b")
    val t = (col("mean_a") - col("mean_b")) / sqrt(sa + sb)
    val dfw = (sa + sb) * (sa + sb) /
      (sa * sa / (col("n_a") - 1) + sb * sb / (col("n_b") - 1))
    val stats = agg
      .withColumn("t_stat", t)
      .withColumn("df_welch", dfw)
      .filter(col("t_stat").isNotNull)
      .withColumn("p_value", normalTwoSided(col("t_stat")))
    // BH rank: ascending p, deterministic tie-break by feature. Rank
    // on the 1e-6-rounded p (the grid both engines emit), not the
    // raw exp() chain — a 1-ulp libm difference between JVM and
    // another engine must not be able to permute near-tied rows.
    val pGrid = floor(col("p_value") * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val w = Window.orderBy(pGrid.asc, col(featureCol).asc)
    stats.withColumn("bh_rank", row_number().over(w).cast("long"))
  }

  /** k-group differential test: Kruskal–Wallis rank ANOVA per
    * feature — the k-group complement to the two-group Welch
    * [[differentialTest]] (reference differential-abundance
    * workflows compare ≥2 phenotype groups; rank-based matches the
    * nonparametric tests microbiome pipelines default to).
    *
    * Statistic: average ranks within each feature (ties get the
    * mean rank), H = 12/(N(N+1))·Σ R_g²/n_g − 3(N+1), divided by
    * the tie correction 1 − Σ(t³−t)/(N³−N); p = chi² survival at
    * k−1 df. Every arithmetic step is plain column math an ANSI
    * oracle replays term by term (for even df the survival is the
    * closed-form Poisson series; odd df adds the same A&S erfc
    * chain the Welch test uses).
    *
    * Shape: one rank window per feature (hash partition by feature
    * + sort — the canonical KW shape), then two partial-agg
    * reductions over (feature, group) / (feature, value) frames.
    * Features missing any of `groups`, or fully tied (tie
    * correction 0), are excluded. BH rank as in
    * [[differentialTest]]: 1e-6-grid p ascending, feature
    * tie-break.
    */
  def kruskalWallis(
      df: DataFrame,
      featureCol: String,
      valueCol: String,
      groupCol: String,
      groups: Seq[String]
  ): DataFrame = {
    require(groups.size >= 2, "need at least 2 groups")
    val k = groups.size
    val filtered = df
      .filter(col(groupCol).isin(groups: _*))
      .filter(col(valueCol).isNotNull)
      .select(col(featureCol), col(groupCol), col(valueCol))
    val wOrd = Window.partitionBy(featureCol).orderBy(col(valueCol))
    val wTie = Window.partitionBy(col(featureCol), col(valueCol))
    val ranked = filtered
      .withColumn("__r", rank().over(wOrd) + (count(lit(1)).over(wTie) - 1) / 2.0)
    val perGroup = ranked
      .groupBy(col(featureCol), col(groupCol))
      .agg(count(lit(1)).as("__n"), sum("__r").as("__R"))
    val ties = filtered
      .groupBy(col(featureCol), col(valueCol)).agg(count(lit(1)).as("__t"))
      .groupBy(col(featureCol))
      .agg(sum(col("__t") * col("__t") * col("__t") - col("__t")).as("__tsum"))
    val stats = perGroup
      .groupBy(col(featureCol))
      .agg(
        sum("__n").as("n_total"),
        count(lit(1)).as("__kp"),
        sum(col("__R") * col("__R") / col("__n")).as("__rss"))
      .filter(col("__kp") === k)
      .join(ties, Seq(featureCol))
    val n = col("n_total").cast("double")
    val h0 = lit(12.0) / (n * (n + lit(1.0))) * col("__rss") - lit(3.0) * (n + lit(1.0))
    val corr = lit(1.0) - col("__tsum").cast("double") / (n * n * n - n)
    val withH = stats
      .filter(corr > 0)
      .withColumn("h_stat", h0 / corr)
      .withColumn("p_value", chi2Survival(h0 / corr, k - 1))
    val pGrid = floor(col("p_value") * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val w = Window.orderBy(pGrid.asc, col(featureCol).asc)
    withH
      .withColumn("bh_rank", row_number().over(w).cast("long"))
      .select(col(featureCol), col("n_total"), col("h_stat"), col("p_value"), col("bh_rank"))
  }

  /** Poisson bootstrap confidence interval for a per-group mean —
    * THE distributed bootstrap (resample multiplicities drawn
    * independently per row as Poisson(1), so no pass ever needs the
    * group's row count up front; the standard method for bootstrap
    * at map-reduce scale, e.g. Chamandy et al. 2012): each row
    * contributes a deterministic hash-coin multiplicity m ∈ [0, 8]
    * to each of `b` resamples, resample means are exact integer
    * ratios, and the interval is the nearest-rank (α/2, 1−α/2)
    * envelope of the b means.
    *
    * Scale shape: ONE b-way explode in the scan stage collapsed
    * immediately by a map-side-combinable groupBy(groups, replica) —
    * the exchange carries b rows per task, never n·b; then window
    * ranks over the |groups|·b frame. No driver state, no second
    * pass over the rows.
    *
    * Determinism/replay: the coin is the house portable-LCG
    * (`(id·480879 + replica·104729 + seed) mod 999983`) compared
    * against INTEGER Poisson(1) CDF thresholds — engine-exact; sums
    * are exact longs (the value column must arrive in INTEGER metric
    * units — pre-scale decimals, e.g. cents); resample means snap at
    * 1e-9; the rank indices use exact decimal arithmetic
    * (`ceil(α/2 · B')` via Spark Decimal — the float-product
    * off-by-one trap documented on filterByQuantilePerGroup).
    * Multiplicities cap at 8 (truncates ~1.1e-6 of the Poisson mass
    * — the standard capped form). Resamples that draw zero rows
    * (probability ≈ e^(−n)) drop, and ranks recompute over the
    * realized B′.
    *
    * @param idCol    row identity feeding the coin (must be integral,
    *                 unique per row for independent draws, and
    *                 |id| < 2^44 — the coin product id·480879 must
    *                 stay inside checked-arithmetic Long range on
    *                 EVERY replay engine: Spark wraps silently past
    *                 2^63 but DuckDB raises, so oversized ids would
    *                 diverge from the documented engine-exact replay.
    *                 Enforced with a row-addressed scan-stage error.)
    * @param valueCol integer metric units (cast to long)
    * @return (groupCols*, n, mean, ci_lo, ci_hi, b_effective)
    */
  def bootstrapMeanCi(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      valueCol: String,
      b: Int = 200,
      alpha: Double = 0.05,
      seed: Long = 42L
  ): DataFrame = {
    require(b >= 10, s"b must be >= 10, got $b")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(groupCols.nonEmpty,
      "groupCols must be non-empty (for a global interval pass a literal group)")
    val gs = groupCols.map(col)
    val v = col(valueCol).cast("long")
    // |id| < 2^44 keeps id·480879 + b·104729 + seed within ±2^63 on
    // checked-arithmetic replay engines (2^44·480879 ≈ 2^62.8) —
    // fail row-addressed in the scan stage rather than replay-diverge.
    // Two-sided explicit bound, NOT abs(): non-ANSI abs(Long.MinValue)
    // wraps negative, so the one id the guard most needs to catch
    // would otherwise slip through it.
    val idBound = 1L << 44
    val idLong = col(idCol).cast("long")
    val idChecked = when(idLong >= idBound || idLong <= -idBound,
      raise_error(concat(lit(s"bootstrapMeanCi: |$idCol| must be < 2^44 for the "
        + "engine-portable coin, got "), col(idCol).cast("string"))))
      .otherwise(col(idCol).cast("long"))
    val base = df.filter(v.isNotNull && col(idCol).isNotNull)
      .select(gs :+ idChecked.as("__id") :+ v.as("__v"): _*)
    // Poisson(1) inverse CDF on the integer coin grid (mod 999983):
    // thresholds floor(cdf_k * 999983), k = 0..8
    val thresholds = Seq(367873L, 735746L, 919682L, 980995L, 996323L,
      999388L, 999899L, 999972L, 999981L)
    val coin = pmod(col("__id") * lit(480879L) + col("__b") * lit(104729L) + lit(seed),
      lit(999983L))
    val m = thresholds.zipWithIndex.foldRight(lit(9): Column) {
      case ((t, k), rest) => when(coin < t, k).otherwise(rest)
    }.cast("long")
    val boots = base
      .withColumn("__b", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("__m", least(m, lit(8L)))
      .groupBy(gs :+ col("__b"): _*)
      .agg(sum(col("__m") * col("__v")).as("__S"), sum(col("__m")).as("__C"))
      .filter(col("__C") > 0)
      .withColumn("__mean", snap9(col("__S").cast("double") / col("__C")))
    // nearest-rank envelope over the realized B' resamples, rank
    // indices in exact decimal (alpha's shortest decimal repr)
    val aDec = lit(new java.math.BigDecimal(java.lang.Double.toString(alpha)))
    val wOrd = Window.partitionBy(gs: _*).orderBy(col("__mean"), col("__b"))
    val wAll = Window.partitionBy(gs: _*)
    val ranked = boots
      .withColumn("__rn", row_number().over(wOrd).cast("long"))
      .withColumn("__B", count(lit(1)).over(wAll))
      .withColumn("__lo", greatest(ceil(aDec / 2 * col("__B")).cast("long"), lit(1L)))
      .withColumn("__hi", ceil((lit(1) - aDec / 2) * col("__B")).cast("long"))
    val ci = ranked
      .groupBy(gs: _*)
      .agg(
        min(when(col("__rn") === col("__lo"), col("__mean"))).as("ci_lo"),
        min(when(col("__rn") === col("__hi"), col("__mean"))).as("ci_hi"),
        first(col("__B")).as("b_effective"))
    val point = base.groupBy(gs: _*)
      .agg(count(lit(1)).as("n"),
        snap9(sum(col("__v")).cast("double") / count(lit(1))).as("mean"))
    point.join(ci, groupCols)
      .select(gs ++ Seq(col("n"), col("mean"), col("ci_lo"), col("ci_hi"),
        col("b_effective")): _*)
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) per feature — the k=2
    * workhorse the [[kruskalWallis]] family specializes to, with
    * the pieces KW's H statistic cannot give back: the U statistic
    * itself, a DIRECTIONAL z (which group is stochastically
    * larger), and the rank-biserial effect size
    * `r = 2·U_A/(n_A·n_B) − 1` — the "how big, not just how
    * unlikely" read-out a filter-threshold decision needs.
    *
    * Identical scale shape to KW: ranks from ONE hash exchange on
    * `featureCol` (in-partition sort; average ranks via the tie
    * window, so ties get the textbook midrank), a map-side-
    * combinable per-(feature, group) rollup, and the tie-correction
    * frame `Σ(t³−t)` from a second bounded aggregate. The normal
    * approximation uses the tie-corrected variance
    * `σ² = n_A n_B/12 · ((n+1) − Σ(t³−t)/(n(n−1)))`; features where
    * σ² = 0 (all values identical) emit null z/p. Rank sums are
    * exact in double (midranks are half-integer), so U is exact;
    * z/p/r snap to the 1e-9 grid in replay order. No continuity
    * correction (documented; the oracle replays the same formula).
    *
    * @return one row per feature with both groups present:
    *         (feature, n_a, n_b, u_a, u_b, z, p_value,
    *         r_rank_biserial)
    */
  def mannWhitneyU(
      df: DataFrame,
      featureCol: String,
      valueCol: String,
      groupCol: String,
      groupA: String,
      groupB: String
  ): DataFrame = {
    require(groupA != groupB, "groupA and groupB must differ")
    val filtered = df
      .filter(col(groupCol).isin(groupA, groupB))
      .filter(col(valueCol).isNotNull)
      .select(col(featureCol), col(groupCol), col(valueCol))
    val wOrd = Window.partitionBy(featureCol).orderBy(col(valueCol))
    val wTie = Window.partitionBy(col(featureCol), col(valueCol))
    val ranked = filtered
      .withColumn("__r", rank().over(wOrd) + (count(lit(1)).over(wTie) - 1) / 2.0)
    val perGroup = ranked
      .groupBy(col(featureCol))
      .agg(
        sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("n_a"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("n_b"),
        sum(when(col(groupCol) === groupA, col("__r")).otherwise(lit(0.0))).as("__ra"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
    val ties = filtered
      .groupBy(col(featureCol), col(valueCol)).agg(count(lit(1)).as("__t"))
      .groupBy(col(featureCol))
      .agg(sum(col("__t") * col("__t") * col("__t") - col("__t")).as("__tsum"))
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    val n = nA + nB
    val uA = col("__ra") - nA * (nA + lit(1.0)) / lit(2.0)
    val mu = nA * nB / lit(2.0)
    val sigma2 = nA * nB / lit(12.0) *
      ((n + lit(1.0)) - col("__tsum").cast("double") / (n * (n - lit(1.0))))
    val z = (col("u_a") - mu) / sqrt(sigma2)
    perGroup.join(ties, Seq(featureCol))
      .withColumn("u_a", uA)
      .withColumn("u_b", nA * nB - col("u_a"))
      .withColumn("z", when(sigma2 > 0, snap9(z)))
      .withColumn("p_value", when(col("z").isNotNull, snap9(normalTwoSided(col("z")))))
      .withColumn("r_rank_biserial", snap9(lit(2.0) * col("u_a") / (nA * nB) - lit(1.0)))
      .select(col(featureCol), col("n_a"), col("n_b"), col("u_a"), col("u_b"),
        col("z"), col("p_value"), col("r_rank_biserial"))
  }

  /** Pearson chi-squared test of independence between two
    * categorical columns, per group — the categorical complement of
    * the Welch-t/Kruskal–Wallis family (is `source` independent of
    * `lang`? is ship mode independent of return status?).
    *
    * ONE wide shuffle: `groupBy(group, a, b)` collapses the fact
    * table to contingency counts with map-side partials; everything
    * after runs on the |groups|·|a-cats|·|b-cats| frame (marginals,
    * the FULL a×b grid per group — a cell observed zero still
    * contributes (0−e)²/e, so the grid is rebuilt from the marginal
    * cross join, not just the observed cells), all broadcast-scale.
    *
    * Degrees of freedom are data-driven per group,
    * `(|a|−1)·(|b|−1)` over that group's OBSERVED categories, so the
    * survival function is unrolled for every df ≤ `maxDf` and
    * selected per row; a group needing more gets a null p (the
    * statistic and df still emit). Every arithmetic step (expected
    * counts from integer marginals, term snap at 1e-9, p at 1e-9) is
    * engine-deterministic and SQL-replayable.
    *
    * @return one row per group: (groupCols*, n, dof, chi2, p_value)
    */
  def chiSquaredIndependence(
      df: DataFrame,
      groupCols: Seq[String],
      aCol: String,
      bCol: String,
      maxDf: Int = 12
  ): DataFrame = {
    require(maxDf >= 1, "maxDf >= 1")
    val gs = groupCols.map(col)
    val obs = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(gs :+ col(aCol).as("__a") :+ col(bCol).as("__b"): _*)
      .agg(count(lit(1)).as("__o"))
    val rowm = obs.groupBy(gs :+ col("__a"): _*).agg(sum("__o").as("__ra"))
    val colm = obs.groupBy(gs :+ col("__b"): _*).agg(sum("__o").as("__rb"))
    val tot = obs.groupBy(gs: _*)
      .agg(sum("__o").as("__n"),
        countDistinct(col("__a")).as("__ka"), countDistinct(col("__b")).as("__kb"))
    // full grid: every (a, b) with positive marginals in the group
    val grid = rowm.join(colm, groupCols).join(tot, groupCols)
      .join(obs, groupCols ++ Seq("__a", "__b"), "left")
      .withColumn("__e", col("__ra") * col("__rb") / col("__n").cast("double"))
    val o = coalesce(col("__o"), lit(0L)).cast("double")
    val term = snap9((o - col("__e")) * (o - col("__e")) / col("__e"))
    val stats = grid
      .groupBy(gs :+ col("__n") :+ col("__ka") :+ col("__kb"): _*)
      .agg(snap9(sum(term)).as("chi2"))
      .withColumn("dof", ((col("__ka") - 1) * (col("__kb") - 1)).cast("int"))
    val p = (1 to maxDf).foldLeft(lit(null).cast("double")) { (acc, d) =>
      when(col("dof") === d, chi2Survival(col("chi2"), d)).otherwise(acc)
    }
    stats.select(
      gs ++ Seq(col("__n").as("n"), col("dof").cast("long").as("dof"),
        col("chi2"), snap9(p).as("p_value")): _*)
  }

  /** Cramér's V effect size per group (the MAGNITUDE companion to
    * [[chiSquaredIndependence]]'s significance: at 100 TB nearly
    * everything is "significant" — V = √(χ²/(n·min(a−1, b−1))) ∈
    * [0,1] says whether the association is worth acting on; ~0.1
    * weak / ~0.3 moderate / ~0.5 strong): the χ² machinery plus
    * ONE extra count-distinct aggregation for the table dimensions,
    * joined over the |groups| frame.
    */
  def cramersV(
      df: DataFrame,
      groupCols: Seq[String],
      aCol: String,
      bCol: String,
      maxDf: Int = 12
  ): DataFrame = {
    val gs = groupCols.map(col)
    val chi = chiSquaredIndependence(df, groupCols, aCol, bCol, maxDf)
    val dims = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(gs: _*)
      .agg(countDistinct(col(aCol)).as("__ka"), countDistinct(col(bCol)).as("__kb"))
    val minK = least(col("__ka"), col("__kb")) - 1
    chi.join(dims, groupCols)
      .withColumn("cramers_v", when(minK > 0 && col("n") > 0,
        snap9(sqrt(col("chi2") / (col("n").cast("double") * minK.cast("double"))))))
      .drop("__ka", "__kb")
  }

  private def snap9(c: Column): Column =
    floor(c * lit(1e9) + lit(0.5)) / lit(1e9)

  /** Chi-squared survival S(x; df) as plan-time-unrolled column
    * arithmetic: even df → exp(−x/2)·Σ_{i<df/2}(x/2)^i/i!; odd df
    * adds erfc(√(x/2)) (the A&S chain) plus the half-integer-gamma
    * series — both shapes an oracle replays exactly.
    */
  private def chi2Survival(x: Column, df: Int): Column = {
    require(df >= 1, "df >= 1")
    val half = x / lit(2.0)
    if (df % 2 == 0) {
      val terms = (0 until df / 2).map { i =>
        val fact = (1 to i).foldLeft(1.0)(_ * _)
        pow(half, lit(i.toDouble)) / lit(fact)
      }
      exp(-half) * terms.reduce(_ + _)
    } else {
      // Γ(i + 1/2) = (2i)!/(4^i i!) √π
      def gammaHalf(i: Int): Double = {
        var g = math.sqrt(math.Pi)
        var j = 1
        while (j <= i) { g *= (j - 0.5); j += 1 }
        g
      }
      val base = normalTwoSided(sqrt(x)) // erfc(√(x/2))
      val extra = (1 to (df - 1) / 2).map(i => pow(half, lit(i - 0.5)) / lit(gammaHalf(i)))
      if (extra.isEmpty) base else base + exp(-half) * extra.reduce(_ + _)
    }
  }

  /** 2·Φ(−|t|) via the Abramowitz–Stegun 7.1.26 erf polynomial —
    * column arithmetic only, so the oracle can replay it term by
    * term.
    */
  private[operators] def normalTwoSided(t: Column): Column = {
    val z = abs(t) / math.sqrt(2.0)
    val s = lit(1.0) / (lit(1.0) + lit(0.3275911) * z)
    val poly = s * (lit(0.254829592) +
      s * (lit(-0.284496736) +
        s * (lit(1.421413741) +
          s * (lit(-1.453152027) + s * lit(1.061405429)))))
    val erfc = poly * exp(-z * z)
    erfc // two-sided p = erfc(|t|/sqrt(2))
  }

  /** Hierarchical rollup: re-aggregate a long fact table after a
    * broadcast join to a (feature → level) mapping — e.g. OTU →
    * genus/phylum taxonomy rollup.
    */
  /** Trailing event-time window aggregates per key — the moving
    * average/sum/count of time-series feature engineering ("events
    * per user in the last hour", "rolling mean sensor value").
    *
    * Pure window shape: ONE shuffle on the partition keys, then an
    * in-partition sort and a `rangeBetween` frame on the MICROSECOND
    * axis. Spark's `SlidingWindowFunctionFrame` re-aggregates a
    * frame when its boundaries move, so per-key cost is
    * O(rows · rows-in-horizon) worst case — fine whenever the
    * horizon holds bounded rows (the monitoring regime); for dense
    * keys widen the partition axis or pre-bucket time. Skew is
    * bounded by the hottest key's row count, same as any keyed
    * window. Emits `roll_cnt`, `roll_sum`, `roll_avg` over
    * `[ts − horizon, ts]` inclusive.
    */
  def rollingAgg(
      df: DataFrame,
      partitionCols: Seq[String],
      tsCol: String,
      valueCol: String,
      horizon: String
  ): DataFrame = {
    val micros = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(horizon))
    require(micros.months == 0 && micros.days == 0,
      s"horizon must be sub-day-exact (hours/minutes/seconds), got '$horizon'")
    val w = Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(col("__us"))
      .rangeBetween(-micros.microseconds, 0)
    df.withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("roll_cnt", count(col(valueCol)).over(w))
      .withColumn("roll_sum", sum(col(valueCol)).over(w))
      .withColumn("roll_avg", col("roll_sum") / col("roll_cnt"))
      .drop("__us")
  }

  /** EXACT per-group linear-interpolation quantile (the ANSI
    * `quantile_cont` / NumPy type-7 convention: index `h = (n−1)·q`,
    * result `v_lo + (h − ⌊h⌋)·(v_hi − v_lo)`) computed WITHOUT
    * buffering a group's values in any single aggregator — the
    * scale problem with `percentile()`-style exact aggregates, whose
    * state is the whole group.
    *
    * Shape: ONE map-side-combinable `groupBy(group, value)` count,
    * then cumulative windows over the DISTINCT-VALUE frame pick the
    * two covering values. Memory is bounded by a group's distinct
    * values, not its rows — exact quantiles stay cheap for
    * quantized/discrete features at any row scale (for unbounded
    * continuous data at 100 TB, `approx_percentile` is the
    * documented trade).
    *
    * @return one row per group: (groupCols*, q_value)
    */
  def groupQuantileExact(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      q: Double
  ): DataFrame = {
    require(q >= 0 && q <= 1, s"q must be in [0,1], got $q")
    val gcols = groupCols.map(col)
    val counts = df
      .filter(col(valueCol).isNotNull)
      .groupBy(gcols :+ col(valueCol).cast("double").as("v"): _*)
      .agg(count(lit(1)).as("c"))
    val grp = Window.partitionBy(groupCols.map(counts(_)): _*)
    val cum = grp.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = counts.select(gcols ++ Seq(col("v"), col("c"),
      sum(col("c")).over(cum).as("cumc"),
      sum(col("c")).over(grp).as("n")): _*)
    // 0-indexed target positions: h = (n−1)q; value v covers
    // positions [cumc − c, cumc − 1]
    val h = (col("n") - 1).cast("double") * lit(q)
    val lo = floor(h)
    val hi = ceil(h)
    staged
      .groupBy(gcols: _*)
      .agg(
        max(when(col("cumc") - col("c") <= lo && lo < col("cumc"), col("v"))).as("vlo"),
        max(when(col("cumc") - col("c") <= hi && hi < col("cumc"), col("v"))).as("vhi"),
        max(h).as("h"))
      .select(gcols :+
        (col("vlo") + (col("h") - floor(col("h"))) * (col("vhi") - col("vlo")))
          .as("q_value"): _*)
  }

  /** Robust per-group outlier scores: `z = 0.6745·(x − med) / MAD`
    * with `med` the exact group median and `MAD` the exact median
    * absolute deviation (0.6745 = Φ⁻¹(3/4), the standard-normal
    * consistency factor — |z| > 3.5 is the classic Iglewicz–Hoaglin
    * cut). The median/MAD pair is the outlier detector that heavy
    * tails can't break: a mean/stddev z-score lets extreme rows
    * inflate σ and mask themselves.
    *
    * Plan shape: two [[groupQuantileExact]] passes (med, then MAD of
    * the broadcast-joined deviations) + one broadcast join back —
    * the row frame shuffles only inside the two distinct-value
    * counts, and the tiny per-group frames ride broadcasts.
    * Degenerate groups (MAD = 0, e.g. >50% identical values) emit
    * null `robust_z` rather than ±∞.
    *
    * @return the input columns + (med, mad, robust_z)
    */
  def robustZ(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String
  ): DataFrame = {
    val med = groupQuantileExact(df, groupCols, valueCol, 0.5)
      .withColumnRenamed("q_value", "med")
    val withMed = df.join(broadcast(med), groupCols)
      .withColumn("dev", abs(col(valueCol) - col("med")))
    val mad = groupQuantileExact(withMed, groupCols, "dev", 0.5)
      .withColumnRenamed("q_value", "mad")
    withMed.join(broadcast(mad), groupCols)
      .withColumn("robust_z",
        when(col("mad") > 0,
          lit(0.6745) * (col(valueCol) - col("med")) / col("mad")))
      .drop("dev")
  }

  /** Winsorization: clip each value into its group's
    * [pLo, pHi] exact type-7 quantile band — the heavy-tail tamer
    * that keeps rows (unlike a filter) while bounding leverage
    * (unlike a z-clip, which the tail itself inflates). Two
    * [[groupQuantileExact]] passes + one broadcast join back; the
    * row frame shuffles only inside the distinct-value counts.
    *
    * @return input columns + (q_lo, q_hi, winsorized)
    */
  def winsorize(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      pLo: Double = 0.05,
      pHi: Double = 0.95
  ): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val lo = groupQuantileExact(df, groupCols, valueCol, pLo)
      .withColumnRenamed("q_value", "q_lo")
    val hi = groupQuantileExact(df, groupCols, valueCol, pHi)
      .withColumnRenamed("q_value", "q_hi")
    df.join(broadcast(lo), groupCols)
      .join(broadcast(hi), groupCols)
      .withColumn("winsorized",
        least(greatest(col(valueCol).cast("double"), col("q_lo")), col("q_hi")))
  }

  def rollup(
      fact: DataFrame,
      mapping: DataFrame,
      featureCol: String,
      levelCol: String,
      sampleCol: String,
      valueCol: String
  ): DataFrame =
    fact
      .join(broadcast(mapping.select(featureCol, levelCol)), Seq(featureCol))
      .groupBy(col(sampleCol), col(levelCol))
      .agg(sum(valueCol).as(valueCol))

  /** Mutual information between two categorical columns per group —
    * the information-theoretic twin of [[chiSquaredIndependence]]
    * (chi² asks "is the deviation from independence significant",
    * MI asks "how many nats does knowing A tell you about B" —
    * the feature-selection score).
    *
    * Same scale shape as chi²: ONE map-side-combinable
    * groupBy(group, a, b) count shuffle; marginals and entropies
    * re-aggregate the contingency frame, never the raw rows. All
    * ratios are integer-count ratios and every log term lands on
    * the 1e-9 grid, so the result is a deterministic function of
    * the counts (oracle replays it term by term).
    *
    * @return one row per group: (groupCols*, n, mi, h_a, h_b, nmi)
    *         where nmi = mi/sqrt(h_a·h_b) (null when either
    *         entropy is 0 — a constant column carries no
    *         information to normalize against)
    */
  def mutualInformation(
      df: DataFrame,
      groupCols: Seq[String],
      aCol: String,
      bCol: String
  ): DataFrame = {
    val gs = groupCols.map(col)
    val obs = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(gs :+ col(aCol).as("__a") :+ col(bCol).as("__b"): _*)
      .agg(count(lit(1)).as("__o"))
    val rowm = obs.groupBy(gs :+ col("__a"): _*).agg(sum("__o").as("__ra"))
    val colm = obs.groupBy(gs :+ col("__b"): _*).agg(sum("__o").as("__rb"))
    val tot = obs.groupBy(gs: _*).agg(sum("__o").as("__n"))
    val joint = obs.join(rowm, groupCols :+ "__a")
      .join(colm, groupCols :+ "__b")
      .join(tot, groupCols)
    val n = col("__n").cast("double")
    val miTerm = snap9(col("__o") / n *
      log(col("__o") * n / (col("__ra") * col("__rb"))))
    val mi = joint.groupBy(gs: _*).agg(snap9(sum(miTerm)).as("mi"))
    def entropy(m: DataFrame, cnt: String, out: String): DataFrame =
      m.join(tot, groupCols)
        .groupBy(gs: _*)
        .agg(snap9(sum(snap9(-col(cnt) / col("__n").cast("double") *
          log(col(cnt) / col("__n").cast("double"))))).as(out))
    mi.join(entropy(rowm, "__ra", "h_a"), groupCols)
      .join(entropy(colm, "__rb", "h_b"), groupCols)
      .join(tot.select(gs :+ col("__n").as("n"): _*), groupCols)
      .select(gs ++ Seq(col("n"), col("mi"), col("h_a"), col("h_b"),
        when(col("h_a") > 0 && col("h_b") > 0,
          snap9(col("mi") / sqrt(col("h_a") * col("h_b")))).as("nmi")): _*)
  }

  /** One-way ANOVA F statistic per feature — the parametric
    * companion to [[kruskalWallis]] (rank-free, assumes normality;
    * the classic differential-expression screen). Emits the F
    * statistic and dofs; significance calls belong to the caller
    * (the F survival function has no closed column form — rank by
    * F within equal dofs, or feed kruskalWallis for p-values).
    *
    * ONE partial-agg groupBy(feature, group) over raw rows, then a
    * feature-sized re-aggregation — sums only, no value buffering.
    * Group means and both sums of squares land on the 1e-9 grid.
    *
    * @return (featureCol, n, k, ss_between, ss_within, f_stat);
    *         f_stat null when k < 2, n ≤ k, or ss_within = 0
    */
  def anovaF(
      df: DataFrame,
      featureCol: String,
      valueCol: String,
      groupCol: String
  ): DataFrame = {
    val v = col(valueCol).cast("double")
    val perGroup = df
      .filter(v.isNotNull && col(groupCol).isNotNull)
      .groupBy(col(featureCol), col(groupCol))
      .agg(count(lit(1)).as("__c"), sum(v).as("__s"), sum(v * v).as("__s2"))
      .withColumn("__m", snap9(col("__s") / col("__c")))
    val byFeat = perGroup
      .groupBy(col(featureCol))
      .agg(
        sum(col("__c")).as("n"),
        count(lit(1)).as("k"),
        snap9(sum(col("__s"))).as("__ts"),
        snap9(sum(col("__s2"))).as("__ts2"),
        snap9(sum(col("__c") * col("__m") * col("__m"))).as("__sgm"))
    val grand = snap9(col("__ts") / col("n"))
    byFeat
      .withColumn("ss_between", snap9(col("__sgm") - col("n") * grand * grand))
      .withColumn("ss_within", snap9(col("__ts2") - col("__sgm")))
      .withColumn("f_stat",
        when(col("k") >= 2 && col("n") > col("k") && col("ss_within") > 0,
          snap9((col("ss_between") / (col("k") - 1)) /
            (col("ss_within") / (col("n") - col("k"))))))
      .select(col(featureCol), col("n"), col("k"),
        col("ss_between"), col("ss_within"), col("f_stat"))
  }

  /** Pairwise Pearson correlation between features stored long
    * (entity, feature, value) — the correlation-matrix screen over
    * a bounded feature set (co-abundance networks, collinearity
    * checks). Pairwise-complete semantics: each (f1, f2) cell uses
    * exactly the entities carrying BOTH features.
    *
    * Shape: one self-equi-join on the entity key (shuffle on
    * entity, output n_entities·F² pair rows worst case — bounded
    * by the feature-set width, NOT the corpus; F features make
    * this the documented F² blowup every correlation matrix pays)
    * then ONE map-side-combinable groupBy(f1, f2). Entities with
    * one row per feature are assumed (pre-aggregate upstream).
    *
    * Engine-determinism: Pearson is affine-invariant, so values
    * first normalize per feature onto [0, 1] (one tiny groupBy
    * (feature) min/max broadcast back) and SNAP there — the
    * five-moment pass then aggregates snapped MEANS of products
    * ≤ 1, which stay genuine 1e-9 grid points at any entity count.
    * The r11 sum-based form snapped Σx², n·Σxy − Σx·Σy, … — at
    * sf1 those cross ~10⁸·10⁹ > 2⁵³, the snap floor degenerates,
    * and the cancellation in the small numerator amplified the two
    * engines' summation-order difference to a 0.025 corr divergence
    * (caught by the r12 sf1 sweep; the N36 Spearman overflow lesson
    * again — its normalized-rank fix is exactly this one).
    *
    * @return (f1, f2, n_pairs, corr) for f1 < f2; corr null when
    *         either side is constant over the complete pairs
    */
  def correlationMatrix(
      df: DataFrame,
      entityCol: String,
      featureCol: String,
      valueCol: String
  ): DataFrame = {
    val base = df
      .filter(col(entityCol).isNotNull && col(featureCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(entityCol).as("__e"), col(featureCol).as("__f"),
        col(valueCol).cast("double").as("__v"))
    // per-feature affine normalization onto [0,1]; constant features
    // map to 0.0 (their variance is 0 → corr NULL downstream either way)
    val bounds = base.groupBy(col("__f"))
      .agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    val normed = base.join(broadcast(bounds), Seq("__f"))
      .select(col("__e"), col("__f"),
        when(col("__hi") > col("__lo"),
          snap9((col("__v") - col("__lo")) / (col("__hi") - col("__lo"))))
          .otherwise(lit(0.0)).as("__v"))
    val a = normed.select(col("__e"), col("__f").as("f1"), col("__v").as("__x"))
    val b = normed.select(col("__e"), col("__f").as("f2"), col("__v").as("__y"))
    val pairs = a.join(b, Seq("__e")).filter(col("f1") < col("f2"))
    pairs.groupBy(col("f1"), col("f2"))
      .agg(
        count(lit(1)).as("n_pairs"),
        snap9(avg(col("__x"))).as("__mx"), snap9(avg(col("__y"))).as("__my"),
        snap9(avg(col("__x") * col("__x"))).as("__mxx"),
        snap9(avg(col("__y") * col("__y"))).as("__myy"),
        snap9(avg(col("__x") * col("__y"))).as("__mxy"))
      .withColumn("__cov", snap9(col("__mxy") - col("__mx") * col("__my")))
      .withColumn("__vx", snap9(col("__mxx") - col("__mx") * col("__mx")))
      .withColumn("__vy", snap9(col("__myy") - col("__my") * col("__my")))
      .withColumn("corr",
        when(col("__vx") > 0 && col("__vy") > 0,
          snap9(col("__cov") / sqrt(col("__vx") * col("__vy")))))
      .select(col("f1"), col("f2"), col("n_pairs"), col("corr"))
  }

  /** Pairwise Spearman rank correlation over long-format features —
    * [[correlationMatrix]]'s robust twin (monotone association:
    * outliers and nonlinear-but-monotone relationships that wreck
    * Pearson leave rank correlation intact; the screen to run FIRST
    * on raw abundance/metric data). Values transform to fractional
    * ranks per feature — tied values share the average rank,
    * `rank() + (ties − 1)/2`, exact binary halves — and the ranked
    * frame rides the identical five-sum Pearson machinery.
    *
    * Scale shape: ONE window shuffle by feature for the ranks (the
    * feature axis is the parallel axis), then [[correlationMatrix]]'s
    * entity-key self-join bounded by feature-set width F (the F²
    * blowup every correlation matrix pays).
    */
  def spearmanMatrix(
      df: DataFrame,
      entityCol: String,
      featureCol: String,
      valueCol: String
  ): DataFrame = {
    val base = df
      .filter(col(entityCol).isNotNull && col(featureCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(entityCol).as("__e2"), col(featureCol).as("__f2"),
        col(valueCol).cast("double").as("__v2"))
    val wRank = Window.partitionBy(col("__f2")).orderBy(col("__v2"))
    val wTies = Window.partitionBy(col("__f2"), col("__v2"))
    val wAll = Window.partitionBy(col("__f2"))
    // ranks NORMALIZED to (0, 1]: Spearman is affine-invariant, and
    // raw ranks at 100 TB cardinalities push Σr·r past the snap
    // grid's exact-long range (the linearTrend overflow lesson) —
    // normalized products stay ≤ 1 so the snapped MEANS below are
    // genuine grid points
    val ranked = base.withColumn("__r",
      (rank().over(wRank).cast("double") +
        (count(lit(1)).over(wTies).cast("double") - 1.0) / 2.0) /
        count(lit(1)).over(wAll).cast("double"))
    val a = ranked.select(col("__e2"), col("__f2").as("f1"), col("__r").as("__x"))
    val b = ranked.select(col("__e2"), col("__f2").as("f2"), col("__r").as("__y"))
    a.join(b, Seq("__e2")).filter(col("f1") < col("f2"))
      .groupBy(col("f1"), col("f2"))
      .agg(
        count(lit(1)).as("n_pairs"),
        snap9(avg(col("__x"))).as("__mx"), snap9(avg(col("__y"))).as("__my"),
        snap9(avg(col("__x") * col("__x"))).as("__mxx"),
        snap9(avg(col("__y") * col("__y"))).as("__myy"),
        snap9(avg(col("__x") * col("__y"))).as("__mxy"))
      .withColumn("__cov", snap9(col("__mxy") - col("__mx") * col("__my")))
      .withColumn("__vx", snap9(col("__mxx") - col("__mx") * col("__mx")))
      .withColumn("__vy", snap9(col("__myy") - col("__my") * col("__my")))
      .withColumn("corr", when(col("__vx") > 0 && col("__vy") > 0,
        snap9(col("__cov") / sqrt(col("__vx") * col("__vy")))))
      .select(col("f1"), col("f2"), col("n_pairs"), col("corr"))
  }

  /** Weight-of-evidence / information value per categorical feature
    * (the credit-scoring feature screen, a monotone-story companion
    * to [[mutualInformation]]: WOE_c = ln(P(c|pos)/P(c|neg)) per
    * category, IV = Σ_c (P(c|pos) − P(c|neg))·WOE_c — IV < 0.02
    * useless, > 0.3 strong, the classic thresholds): per (feature
    * value, label) counts in ONE map-side-combinable shuffle, class
    * totals as window sums over the tiny category frame, ε-smoothed
    * fractions so empty cells stay finite (the N14 PSI discipline),
    * every ratio/ln term snapped at 1e-9.
    *
    * @return one row per (groupCols*, category): counts, WOE, and
    *         the category's IV contribution (sum per group for the
    *         feature's IV)
    */
  def weightOfEvidence(
      df: DataFrame,
      categoryCol: String,
      labelCol: String,
      groupCols: Seq[String] = Nil,
      eps: Double = 1e-6
  ): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    val gs = groupCols.map(col)
    val pos = col(labelCol).cast("double") =!= 0.0
    val counts = df
      .filter(col(categoryCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(gs :+ col(categoryCol).as("category"): _*)
      .agg(
        sum(when(pos, 1L).otherwise(0L)).as("n_pos"),
        sum(when(!pos, 1L).otherwise(0L)).as("n_neg"))
    val w = Window.partitionBy(gs: _*)
    counts
      .withColumn("__tp", sum(col("n_pos")).over(w))
      .withColumn("__tn", sum(col("n_neg")).over(w))
      .withColumn("__dp", when(col("__tp") > 0,
        snap9(col("n_pos").cast("double") / col("__tp") + lit(eps))))
      .withColumn("__dn", when(col("__tn") > 0,
        snap9(col("n_neg").cast("double") / col("__tn") + lit(eps))))
      .withColumn("woe", when(col("__dp").isNotNull && col("__dn").isNotNull,
        snap9(log(col("__dp") / col("__dn")))))
      .withColumn("iv_contrib", when(col("woe").isNotNull,
        snap9((col("__dp") - col("__dn")) * col("woe"))))
      .select(gs ++ Seq(col("category"), col("n_pos"), col("n_neg"),
        col("woe"), col("iv_contrib")): _*)
  }

  /** Per-group OLS linear trend `y = slope·x + intercept` with r²
    * (metric drift over time, per-feature trend screens). Two-pass
    * shift-and-sum: pass 1 takes each group's min(x) (a tiny frame
    * broadcast back), pass 2 accumulates the five shifted sums in
    * ONE map-side-combinable groupBy — shifting x to the group's
    * origin is what keeps `n·Σx² − (Σx)²` away from catastrophic
    * cancellation when x is epoch-scaled, the failure mode of the
    * textbook one-pass formula at 100 TB timestamp ranges. Sums
    * snap to the 1e-9 grid (the [[correlationMatrix]] discipline)
    * so the closed form replays cross-engine; slope/r² are
    * shift-invariant, the intercept is mapped back to original-x
    * coordinates at the end. Degenerate groups (constant x) yield
    * NULL slope/intercept/r².
    */
  def linearTrend(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      yCol: String
  ): DataFrame = {
    val gs = groupCols.map(col)
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select((gs :+ col(xCol).cast("double").as("__x")) :+
        col(yCol).cast("double").as("__y"): _*)
    val origins = base.groupBy(gs: _*).agg(min(col("__x")).as("__x0"))
    // snapped MEANS, never n-scaled sums: E[·] is bounded by the
    // data's magnitude no matter how many rows the group holds, so
    // the 1e-9 snap grid stays inside double precision at any
    // scale (a sum-based `n·Σxy − Σx·Σy` overflows the snap's
    // integer range once n·Σ crosses ~9e9)
    val sums = base.join(broadcast(origins), groupCols)
      .withColumn("__xs", col("__x") - col("__x0"))
      .groupBy((gs :+ col("__x0")): _*)
      .agg(
        count(lit(1)).as("n"),
        snap9(avg(col("__xs"))).as("__mx"), snap9(avg(col("__y"))).as("__my"),
        snap9(avg(col("__xs") * col("__xs"))).as("__mxx"),
        snap9(avg(col("__y") * col("__y"))).as("__myy"),
        snap9(avg(col("__xs") * col("__y"))).as("__mxy"))
    val out = sums
      .withColumn("__cov", snap9(col("__mxy") - col("__mx") * col("__my")))
      .withColumn("__vx", snap9(col("__mxx") - col("__mx") * col("__mx")))
      .withColumn("__vy", snap9(col("__myy") - col("__my") * col("__my")))
      .withColumn("slope", when(col("__vx") > 0, snap9(col("__cov") / col("__vx"))))
      // intercept in SHIFTED coords, then back: b = b' − slope·x0
      .withColumn("__b", when(col("__vx") > 0,
        snap9(col("__my") - col("slope") * col("__mx"))))
      .withColumn("intercept", when(col("__vx") > 0,
        snap9(col("__b") - col("slope") * col("__x0"))))
      .withColumn("r2", when(col("__vx") > 0 && col("__vy") > 0,
        snap9(col("__cov") * col("__cov") / (col("__vx") * col("__vy")))))
    out.select((gs ++ Seq(col("n"), col("slope"), col("intercept"), col("r2"))): _*)
  }

  /** Distribution-shape profile per group: mean, population
    * variance, skewness, excess kurtosis, and the Jarque–Bera
    * normality statistic `JB = n/6·(g₁² + g₂²/4)` — the
    * higher-moment companion to [[describeAll]] (is the
    * distribution skewed? heavy-tailed? plausibly normal?). ONE
    * map-side-combinable groupBy carrying the four power sums —
    * no value buffering, |groups| output rows; every derived stage
    * snaps to the 1e-9 grid so central moments replay
    * cross-engine. Degenerate groups (n < 2 or zero variance)
    * yield NULL shape stats.
    */
  def momentsProfile(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      scalePow2: Int = -1
  ): DataFrame = {
    require(scalePow2 <= 40, s"scalePow2 at most 40, got $scalePow2")
    val gs = groupCols.map(col)
    // values run through the moments PRESCALED by an exact power of
    // two (no precision cost — pure exponent shift): 4th powers of
    // raw values overflow the snap grid's double/long range fast
    // (|v| ≈ 500 → v⁴ ≈ 6e10), while skew/kurt/JB are
    // scale-invariant and mean/variance rescale exactly. The
    // default (-1) auto-picks the smallest k with max|v|/2^k ≤ 256
    // from one bounded max-aggregate (over-scaling costs precision
    // too — |v| ≪ 2^k pushes the scaled 4th moments BELOW the snap
    // grid); pass an explicit k when the replay must be pinned.
    val k =
      if (scalePow2 >= 0) scalePow2
      else {
        val m = df.agg(max(abs(col(valueCol).cast("double")))).head()
        val mx = if (m.isNullAt(0)) 0.0 else m.getDouble(0)
        if (mx <= 256.0) 0
        else math.min(40, math.ceil(math.log(mx / 256.0) / math.log(2.0)).toInt)
      }
    val sc = math.pow(2.0, k)
    val v = col(valueCol).cast("double") / lit(sc)
    val sums = df.filter(col(valueCol).isNotNull)
      .groupBy(gs: _*)
      .agg(
        count(lit(1)).as("n"),
        snap9(avg(v)).as("__g1"),
        snap9(avg(v * v)).as("__g2"),
        snap9(avg(v * v * v)).as("__g3"),
        snap9(avg(v * v * v * v)).as("__g4"))
    val n = col("n").cast("double")
    val g1 = col("__g1")
    val out = sums
      // central moments of the SCALED values from snapped raw moments
      .withColumn("__c2", snap9(col("__g2") - g1 * g1))
      .withColumn("__c3", snap9(col("__g3") - lit(3.0) * g1 * col("__g2")
        + lit(2.0) * g1 * g1 * g1))
      .withColumn("__c4", snap9(col("__g4") - lit(4.0) * g1 * col("__g3")
        + lit(6.0) * g1 * g1 * col("__g2")
        - lit(3.0) * g1 * g1 * g1 * g1))
      // exact power-of-two rescale back to data units
      .withColumn("mean", snap9(g1 * lit(sc)))
      .withColumn("variance", snap9(col("__c2") * lit(sc * sc)))
      .withColumn("skewness", when(col("n") >= 2 && col("__c2") > 0,
        snap9(col("__c3") / sqrt(col("__c2") * col("__c2") * col("__c2")))))
      .withColumn("kurtosis", when(col("n") >= 2 && col("__c2") > 0,
        snap9(col("__c4") / (col("__c2") * col("__c2")) - lit(3.0))))
      .withColumn("jarque_bera", when(col("skewness").isNotNull,
        snap9(n / lit(6.0) * (col("skewness") * col("skewness")
          + col("kurtosis") * col("kurtosis") / lit(4.0)))))
    out.select((gs ++ Seq(col("n"), col("mean"), col("variance"),
      col("skewness"), col("kurtosis"), col("jarque_bera"))): _*)
  }

  /** Column-profile report — the dataset-quality summary every
    * ingest pipeline runs first: per column the row count, null
    * count, EXACT distinct count, and min/max rendered as strings.
    * ONE aggregation (Spark plans the multi-column distinct via
    * expand — cost is columns × one pass, never a per-column job),
    * then a `stack` to one row per column. For wide interactive
    * profiling at extreme scale swap the distinct for
    * approx_count_distinct; this is the exact, oracle-able form.
    */
  /** Fixed-boundary equal-width histogram per group — the
    * distribution companion to [[profileColumns]] and the building
    * block [[graft.operators.DriftOps.psi]] uses for its two-sided
    * compare (identical clamp-to-edge binning, so a histogram and a
    * PSI over the same [lo, hi, bins] see the same cells). ONE
    * map-side-combinable groupBy(group, bin); output ≤ groups·bins
    * rows with exact integer counts and the bin's [lo, hi) edges.
    * Nulls drop; out-of-range values clamp into the edge bins.
    */
  def histogram(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      lo: Double,
      hi: Double,
      bins: Int
  ): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val width = (hi - lo) / bins
    val gs = groupCols.map(col)
    df.filter(col(valueCol).isNotNull)
      .select(gs :+
        least(greatest(floor((col(valueCol) - lit(lo)) / lit(width)), lit(0)),
          lit(bins - 1)).cast("long").as("bin"): _*)
      .groupBy(gs :+ col("bin"): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("bin_lo", lit(lo) + col("bin") * lit(width))
      .withColumn("bin_hi", lit(lo) + (col("bin") + 1) * lit(width))
  }

  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      s"'$c', __n, __null_$c, __dist_$c, __min_$c, __max_$c"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stacked) AS (column_name, n_rows, n_nulls, n_distinct, min_value, max_value)")
  }

  /** Benford first-significant-digit conformity test per group —
    * the fraud/data-quality screen for naturally-generated positive
    * amounts (invoice totals, populations, file sizes): observed
    * first-digit frequencies against `P(d) = log₁₀(1 + 1/d)`, with
    * the per-group Pearson χ² statistic over the FULL 9-digit grid
    * (an unobserved digit still contributes `(0 − n·p)²/(n·p)` —
    * the [[chiSquaredIndependence]] zero-cell discipline).
    *
    * `valueCol` must be integral and >= 1 (pre-scale currency to
    * cents); rows with value < 1 are excluded so fractional values
    * in (0,1) cannot inflate `__n` without landing on any digit
    * row. The digit comes from the decimal STRING of the
    * exact long — no log₁₀/pow float extraction, whose boundary
    * behavior at powers of ten is engine-dependent. ONE map-side
    * groupBy(group, digit) + a 9-row literal grid join; expected
    * fractions are plan-time literals.
    *
    * @return (groupCols*, digit, n_digit, frac, expected, chi2) —
    *         one row per (group, digit 1–9), chi2 repeated per
    *         group (the group-level statistic)
    */
  def benfordTest(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String
  ): DataFrame = {
    val gs = groupCols.map(col)
    val digits = (1 to 9).map(d => (d, math.log10(1.0 + 1.0 / d)))
    val base = df
      .filter(col(valueCol).isNotNull && col(valueCol) >= 1)
      .select(gs :+ substring(col(valueCol).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"): _*)
    val cnts = base.groupBy(gs :+ col("digit"): _*).agg(count(lit(1)).as("n_digit"))
    val totals = base.groupBy(gs: _*).agg(count(lit(1)).as("__n"))
    val grid = totals.select(gs :+ col("__n") :+
      explode(typedlit(digits.map(_._1))).as("digit"): _*)
    val expected = digits.tail.foldLeft(
      when(col("digit") === 1, lit(digits.head._2))) {
      case (acc, (d, p)) => acc.when(col("digit") === d, lit(p))
    }
    val full = grid.join(cnts, groupCols :+ "digit", "left")
      .na.fill(0L, Seq("n_digit"))
      .withColumn("expected", expected)
      .withColumn("frac", snap9(col("n_digit").cast("double") / col("__n")))
      .withColumn("__t", snap9(
        (col("n_digit") - col("__n") * col("expected")) *
          (col("n_digit") - col("__n") * col("expected")) /
          (col("__n") * col("expected"))))
    val chi2 = full.groupBy(gs: _*).agg(snap9(sum(col("__t"))).as("chi2"))
    full.join(chi2, groupCols)
      .select(gs ++ Seq(col("digit"), col("n_digit"), col("frac"),
        col("expected"), col("chi2")): _*)
  }

  /** Gini concentration coefficient per group — how unequally a
    * non-negative integer quantity (revenue cents, token counts,
    * request counts) is spread across that group's members. The
    * rank-sum closed form over the ascending order:
    * `G = 2·Σ(i·xᵢ) / (n·Σx) − (n+1)/n`, with `i` the 1-based rank.
    *
    * Ties are rank-order-invariant (a tied block contributes
    * `x·Σi` regardless of permutation), so the `(value, tieBreak)`
    * window order is for engine portability, not the result.
    *
    * Scale shape: one `row_number` window partitioned by the group
    * (the group axis is the scale axis — same contract as the other
    * per-group windows) feeding one partial-agg `groupBy`; all sums
    * are exact longs (`valueCol` must be integral — pre-scale
    * currency to cents), the final ratio is one double expression on
    * the 1e-9 grid.
    *
    * @return (groupCols*, n, total, gini) — gini null when the
    *         group's total is 0
    */
  def giniConcentration(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      tieBreakCol: String
  ): DataFrame = {
    val gs = groupCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gs: _*)
      .orderBy(col(valueCol), col(tieBreakCol))
    val ranked = df
      .filter(col(valueCol).isNotNull && col(valueCol) >= 0)
      .withColumn("__i", row_number().over(w).cast("long"))
    ranked
      .groupBy(gs: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol).cast("long")).as("total"),
        sum(col("__i") * col(valueCol).cast("long")).as("__iw"))
      .select(gs ++ Seq(col("n"), col("total"),
        when(col("total") > 0, snap9(
          lit(2.0) * col("__iw") / (col("n").cast("double") * col("total")) -
            (col("n") + 1).cast("double") / col("n"))).as("gini")): _*)
  }

  /** Approximate quantiles per group by a two-pass binned CDF — the
    * quantile member of the mergeable-sketch family (HLL = distinct,
    * CMS = frequency, KMV = similarity, SpaceSaving = heavy hitters;
    * this = percentiles): never a per-group sort, never a buffered
    * value list, state is exactly `bins` integer counts per group no
    * matter how many rows feed it.
    *
    * Pass 1 is a map-side-combinable `groupBy` for each group's
    * (min, max, n); pass 2 bins every value on the group's
    * equal-width grid (AQE-broadcast join of the tiny stats frame)
    * and counts per (group, bin) — again map-side-combinable, ≤
    * groups·bins rows after the shuffle. Quantile q(p) reads the CDF
    * crossing bin (first cumulative count ≥ ⌈p·n⌉) and interpolates
    * linearly inside it; the window runs over the ≤ `bins`-row bin
    * frame, never the data. Deterministic (no sampling, no RNG), and
    * the bin-count frame SUM-merges across shards/days that share a
    * [min, max] grid — re-add counts, re-read the CDF.
    *
    * Error bound: each estimate is within one bin width
    * `(max − min)/bins` of the exact type-1 quantile — tighten with
    * `bins`, whose cost is the shuffle-row cap, not a data pass.
    * Exact when a group has ≤ 1 distinct value. Counts and crossing
    * ranks are exact integers; the only float arithmetic is the
    * fixed-association bin/interp expression on the 1e-9 grid, so an
    * oracle replays it term for term.
    *
    * @param probs quantile probabilities, each in (0, 1]
    * @return one row per (group, prob): (groupCols*, p, n, lo, hi,
    *         quantile)
    */
  def approxQuantilesBinned(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      probs: Seq[Double],
      bins: Int = 1024
  ): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      s"probs must be in (0, 1], got $probs")
    val gs = groupCols.map(col)
    val v = col(valueCol).cast("double")
    val rows = df.filter(v.isNotNull)
    val stats = rows.groupBy(gs: _*).agg(
      min(v).as("lo"), max(v).as("hi"), count(lit(1)).as("n"))
    val spread = col("hi") > col("lo")
    val binned = rows.join(stats, groupCols)
      .select(gs :+ col("lo") :+ col("hi") :+ col("n") :+
        when(spread,
          least(floor((v - col("lo")) / (col("hi") - col("lo")) * lit(bins)),
            lit(bins - 1)).cast("long"))
          .otherwise(lit(0L)).as("bin"): _*)
      .groupBy(gs :+ col("bin"): _*)
      .agg(max(col("lo")).as("lo"), max(col("hi")).as("hi"),
        max(col("n")).as("n"), count(lit(1)).as("cnt"))
    val w = Window.partitionBy(gs: _*).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cdf = binned.withColumn("cum", sum(col("cnt")).over(w))
    val probLits = array(probs.map(p => lit(p)): _*)
    val rank = greatest(ceil(col("p") * col("n")), lit(1L)).cast("long")
    val width = (col("hi") - col("lo")) / lit(bins)
    val frac = (rank - (col("cum") - col("cnt"))).cast("double") / col("cnt")
    cdf
      .withColumn("p", explode(probLits))
      .filter(col("cum") >= rank && (col("cum") - col("cnt")) < rank)
      .select(gs ++ Seq(col("p"), col("n"), col("lo"), col("hi"),
        when(col("hi") > col("lo"),
          snap9(col("lo") + width * (col("bin").cast("double") + frac)))
          .otherwise(col("lo")).as("quantile")): _*)
  }
}
