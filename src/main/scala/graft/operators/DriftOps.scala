package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two cohorts of the same
  * table — the data-quality gate of a continuously-ingested training
  * corpus (did this week's crawl shift against the reference
  * sample?) and the monitoring twin of the reference's two-group
  * differential tests (`StatsOps.differentialTest` asks "is feature
  * X different between biological groups"; drift asks "is the WHOLE
  * distribution different between time slices").
  *
  * Two standard statistics, both engine-deterministic and
  * SQL-replayable:
  *
  * '''PSI''' (population stability index, the industry drift score):
  * fixed affine binning of the value range, per-bin population
  * fractions `p` (reference) and `q` (current), then
  * `PSI = Σ_bins (q − p) · ln(q / p)` with `max(frac, eps)`
  * smoothing so empty bins stay finite. Bins empty on BOTH sides
  * contribute `(eps − eps)·ln 1 = 0`, so enumerating only observed
  * bins is exact. Each side collapses to at most `groups × bins`
  * rows in ONE map-side-combinable `groupBy` before anything joins —
  * the 100 TB row frames never meet, only the tiny histograms do.
  *
  * '''KS''' (two-sample Kolmogorov–Smirnov statistic):
  * `D = max_x |F_a(x) − F_b(x)|` over the pooled observed values.
  * Computed on the DISTINCT-value frame: `groupBy(group, value)`
  * side counts (map-side combinable, one shuffle), cumulative sums
  * by value inside each group window, max absolute ECDF gap. Every
  * intermediate is a ratio of exact integer counts, so the statistic
  * is bit-stable across engines. Scale note: the window partition
  * carries one group's DISTINCT values, not its rows — bounded for
  * discrete/quantized features (the intended regime); for unbounded
  * continuous data use [[psi]]'s fixed bins instead.
  */
object DriftOps {

  private def snap(c: Column, grid: Double): Column =
    floor(c * grid + lit(0.5)) / grid

  /** Per-group PSI of `cur` against `ref` over `valueCol`, with
    * `bins` equal-width bins on [lo, hi] (values outside clamp to
    * the edge bins, nulls drop). Groups present in only one side
    * score against an all-`eps` opposite histogram.
    *
    * Conventional reading: PSI < 0.1 stable, 0.1–0.25 moderate
    * shift, > 0.25 major shift.
    *
    * @return one row per group: (groupCols*, psi, n_ref, n_cur),
    *         psi on the 1e-6 grid (per-bin terms snapped to 1e-9 so
    *         the Σ is rounding-stable cross-engine).
    */
  def psi(
      ref: DataFrame,
      cur: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      lo: Double,
      hi: Double,
      bins: Int,
      eps: Double = 1e-6
  ): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    require(eps > 0, s"eps must be positive, got $eps")
    val width = (hi - lo) / bins
    val gcols = groupCols.map(col)

    def hist(df: DataFrame, fracName: String, nName: String): DataFrame = {
      val binned = df
        .filter(col(valueCol).isNotNull)
        .select(gcols :+
          least(greatest(floor((col(valueCol) - lit(lo)) / lit(width)), lit(0)),
            lit(bins - 1)).cast("long").as("bin"): _*)
      // tiny frame from here on: ≤ groups × bins rows
      val counts = binned.groupBy(gcols :+ col("bin"): _*).agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(groupCols.map(counts(_)): _*)
      counts.select(gcols ++ Seq(col("bin"),
        (col("c").cast("double") / sum(col("c")).over(w)).as(fracName),
        sum(col("c")).over(w).as(nName)): _*)
    }

    val p = hist(ref, "p", "n_ref")
    val q = hist(cur, "q", "n_cur")
    val joined = p.join(q, groupCols :+ "bin", "full_outer")
    val pe = greatest(coalesce(col("p"), lit(0.0)), lit(eps))
    val qe = greatest(coalesce(col("q"), lit(0.0)), lit(eps))
    joined
      .select(gcols ++ Seq(
        snap((qe - pe) * log(qe / pe), 1e9).as("term"),
        col("n_ref"), col("n_cur")): _*)
      .groupBy(gcols: _*)
      .agg(
        snap(sum(col("term")), 1e6).as("psi"),
        coalesce(max(col("n_ref")), lit(0L)).as("n_ref"),
        coalesce(max(col("n_cur")), lit(0L)).as("n_cur"))
  }

  /** EWMA control chart per key — sequential anomaly detection on an
    * ordered value stream (the monitoring twin of [[psi]]/[[ksStatistic]]:
    * those ask "did the distribution shift between cohorts", this
    * asks "is THIS observation surprising given the smoothed past").
    *
    * ONE shuffle: everything is window arithmetic over
    * `partitionBy(keys).orderBy(order...)` — the EWMA runs as the
    * mergeable affine-scan aggregate
    * ([[graft.functions.EwmaAggregate]], snapped per step so the
    * sequential fixed point is engine-independent), and the control
    * band uses running count/sum/sum² windows (running sums add in
    * window order, identical in any engine). Each row is judged
    * against the PRIOR rows only (`lag` of the running stats — no
    * peeking at the value being tested).
    *
    * Flag semantics: `is_anomaly = |x − ewma_prev| > nSigma·σ_prev`
    * with both sides snapped at 1e-9 before comparing; null until
    * `minPrior` prior non-null values exist (σ of one point is not
    * a band). Null values emit null ewma-prev/flag and don't touch
    * the state.
    *
    * Scale: per-key window sort is the only cost; the state per row
    * is O(1). Hot keys bound the partition the same way any keyed
    * window does — salt upstream if one key dominates.
    *
    * @param orderCols total order within key (include a unique
    *                  tie-break — order ties make any sequential
    *                  statistic engine-dependent)
    * @return input columns + (ewma, ewma_prev, sigma_prev,
    *         is_anomaly); `ewma` includes the current value,
    *         `ewma_prev`/`sigma_prev`/`is_anomaly` judge it
    */
  def ewmaChart(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      lambda: Double = 0.25,
      nSigma: Double = 3.0,
      minPrior: Int = 5
  ): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    require(nSigma > 0, s"nSigma must be positive, got $nSigma")
    require(minPrior >= 2, s"minPrior must be >= 2, got $minPrior")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(col): _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = col(valueCol).cast("double")
    val s9 = (c: Column) => snap(c, 1e9)
    val withRun = df
      .withColumn("__ewma", graft.functions.EwmaAggregate.ewma(x, lambda).over(run))
      .withColumn("__cnt", count(x).over(run))
      .withColumn("__s1", sum(x).over(run))
      .withColumn("__s2", sum(x * x).over(run))
    val prev = withRun
      .withColumn("ewma_prev", lag(col("__ewma"), 1).over(w))
      .withColumn("__cntp", lag(col("__cnt"), 1).over(w))
      .withColumn("__s1p", lag(col("__s1"), 1).over(w))
      .withColumn("__s2p", lag(col("__s2"), 1).over(w))
    val np = col("__cntp").cast("double")
    val variance = greatest(
      (col("__s2p") - col("__s1p") * col("__s1p") / np) / np, lit(0.0))
    val sigma = s9(sqrt(variance))
    val dev = s9(abs(x - col("ewma_prev")))
    prev
      .withColumn("ewma", s9(col("__ewma")))
      .withColumn("sigma_prev", when(col("__cntp") >= minPrior, sigma))
      .withColumn("is_anomaly",
        when(x.isNotNull && col("__cntp") >= minPrior && col("ewma_prev").isNotNull,
          dev > s9(lit(nSigma) * sigma)))
      .drop("__ewma", "__cnt", "__s1", "__s2", "__cntp", "__s1p", "__s2p")
  }

  /** Brown double-exponential-smoothing forecast per key — the
    * trend-aware step up from [[ewmaChart]]'s flat smoother (Brown
    * 1963; a flat EWMA lags a trending series by a constant, the
    * double form smooths the smoother and extrapolates): with
    * `S' = ewma(x)` and `S'' = ewma(S')`,
    * `level = 2·S' − S''`, `trend = λ/(1−λ)·(S' − S'')`,
    * `forecast_h = level + h·trend`.
    *
    * Both smoothers are the mergeable affine-scan aggregate
    * ([[graft.functions.EwmaAggregate]], the debiased form, snapped
    * per step), chained over the SAME `partitionBy(keys)
    * .orderBy(order…)` window — ONE shuffle, one sort, two window
    * passes, O(1) state per row; the sequential fixed point is
    * engine-independent so a recursive replay carrying (b₁,w₁,b₂,w₂)
    * reproduces every row bit-for-bit. Null values are dropped (the
    * recurrence advances per OBSERVATION — document gaps upstream if
    * cadence matters).
    *
    * @param orderCols total order within key (include a unique
    *                  tie-break)
    * @param horizon   forecast steps ahead (h ≥ 1)
    * @return input rows (nulls dropped) + (s1, s2, level, trend,
    *         forecast)
    */
  def doubleEwmaForecast(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      lambda: Double = 0.25,
      horizon: Int = 1
  ): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(col): _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val s9 = (c: Column) => snap(c, 1e9)
    val x = col(valueCol).cast("double")
    val withS1 = df.filter(col(valueCol).isNotNull)
      .withColumn("s1", s9(graft.functions.EwmaAggregate.ewma(x, lambda).over(run)))
    val withS2 = withS1
      .withColumn("s2", s9(graft.functions.EwmaAggregate.ewma(col("s1"), lambda).over(run)))
    withS2
      .withColumn("level", s9(lit(2.0) * col("s1") - col("s2")))
      .withColumn("trend",
        s9(lit(lambda) / lit(1.0 - lambda) * (col("s1") - col("s2"))))
      .withColumn("forecast",
        s9(col("level") + lit(horizon.toDouble) * col("trend")))
  }

  /** Per-group two-sample KS statistic between cohorts `a` and `b`
    * over `valueCol` (nulls drop). Groups present in only one
    * cohort get D = 1 exactly (the empty side's ECDF is 0
    * everywhere).
    *
    * @return one row per group: (groupCols*, ks_stat, n_a, n_b),
    *         ks_stat on the 1e-6 grid.
    */
  def ksStatistic(
      a: DataFrame,
      b: DataFrame,
      groupCols: Seq[String],
      valueCol: String
  ): DataFrame = {
    val gcols = groupCols.map(col)
    def side(df: DataFrame, tag: Int): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .select(gcols ++ Seq(col(valueCol).as("v"), lit(tag).as("side")): _*)
    val pooled = side(a, 0).unionByName(side(b, 1))
    val counts = pooled
      .groupBy(gcols :+ col("v"): _*)
      .agg(
        sum(when(col("side") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("cb"))
    val grp = Window.partitionBy(groupCols.map(counts(_)): _*)
    val cum = grp.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .select(gcols ++ Seq(
        sum(col("ca")).over(cum).as("cuma"),
        sum(col("cb")).over(cum).as("cumb"),
        sum(col("ca")).over(grp).as("na"),
        sum(col("cb")).over(grp).as("nb")): _*)
      .groupBy(gcols: _*)
      .agg(
        snap(max(abs(
          when(col("na") > 0, col("cuma").cast("double") / col("na")).otherwise(lit(0.0)) -
          when(col("nb") > 0, col("cumb").cast("double") / col("nb")).otherwise(lit(0.0)))),
          1e6).as("ks_stat"),
        max(col("na")).as("n_a"),
        max(col("nb")).as("n_b"))
  }

  /** Tabular CUSUM control chart per key (Page 1954 — the classic
    * small-persistent-shift detector the EWMA chart complements:
    * EWMA flags single surprising points, CUSUM accumulates
    * evidence of a sustained drift off target):
    * `S⁺ = max(0, S⁺ + x − target − k)`,
    * `S⁻ = max(0, S⁻ + (target − k − x))`, alarm when either
    * exceeds `h`.
    *
    * The `max(0, ·)` makes the recurrence NON-affine — unlike
    * [[ewmaChart]]'s EWMA there is no lawful merge, so this is the
    * documented per-partition imperative case: ONE repartition on
    * the keys + in-partition sort, then a single O(1)-state scan
    * per partition (`mapPartitions`) tracking key changes. No
    * per-key buffering, no window frames. Each step snaps to the
    * 1e-9 grid, so the sequential fixed point is engine-independent
    * (oracle replays it via a recursive CTE, same recipe as the
    * EWMA chart). Null values leave state untouched and emit null
    * statistics.
    *
    * @param orderCols total order within key (include a unique
    *        tie-break)
    * @return input columns + (s_pos, s_neg, alarm)
    */
  def cusum(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      target: Double,
      k: Double,
      h: Double
  ): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    require(k >= 0, s"slack k must be >= 0, got $k")
    require(h > 0, s"threshold h must be positive, got $h")
    val sorted = df
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val kIdx = keyCols.map(sorted.schema.fieldIndex)
    val outSchema = org.apache.spark.sql.types.StructType(sorted.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("s_pos", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("s_neg", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("alarm", org.apache.spark.sql.types.BooleanType)))
    def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
    sorted.mapPartitions { rows =>
      var curKey: Seq[Any] = null
      var sp = 0.0
      var sn = 0.0
      rows.map { row =>
        val key = kIdx.map(row.get)
        if (key != curKey) { curKey = key; sp = 0.0; sn = 0.0 }
        val extra: Seq[Any] =
          if (row.isNullAt(vIdx)) Seq(null, null, null)
          else {
            val x = row.get(vIdx) match {
              case d: Double => d
              case f: Float => f.toDouble
              case n: Number => n.doubleValue()
            }
            sp = snap9(math.max(0.0, sp + x - target - k))
            sn = snap9(math.max(0.0, sn + (target - k - x)))
            Seq(sp, sn, sp > h || sn > h)
          }
        org.apache.spark.sql.Row.fromSeq(row.toSeq ++ extra)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Seasonal-profile anomaly detection — the calendar twin of
    * [[ewmaChart]] (EWMA asks "surprising given the recent past",
    * this asks "surprising FOR A TUESDAY 3 PM"): per (key, hour-of-
    * day[, day-of-week]) bucket, the mean/std profile over the full
    * frame, and every row judged against ITS bucket's band.
    *
    * Two passes, both map-side-combinable: ONE groupBy(key, bucket)
    * for the profile (count/sum/sum² only — no value buffering),
    * then a profile join back to the rows (profile frame is
    * keys×buckets — broadcast-sized by construction). Means/stds
    * land on the 1e-9 grid; the flag compares snapped deviation to
    * the snapped band like the EWMA chart does.
    *
    * @param byDayOfWeek bucket on (dow, hour) instead of hour alone
    * @param minBucket   buckets with fewer rows emit null flags (a
    *                    band from 2 points is noise)
    * @return input columns + (season_mean, season_std, is_anomaly)
    */
  def seasonalAnomalies(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      nSigma: Double = 3.0,
      byDayOfWeek: Boolean = false,
      minBucket: Int = 5
  ): DataFrame = {
    require(nSigma > 0, s"nSigma must be positive, got $nSigma")
    require(minBucket >= 2, s"minBucket must be >= 2, got $minBucket")
    val s9 = (c: Column) => snap(c, 1e9)
    val bucket: Column =
      if (byDayOfWeek) dayofweek(col(tsCol)) * 100 + hour(col(tsCol))
      else hour(col(tsCol))
    val x = col(valueCol).cast("double")
    val withB = df.withColumn("__b", bucket)
    val prof = withB
      .filter(x.isNotNull)
      .groupBy(keyCols.map(col) :+ col("__b"): _*)
      .agg(count(lit(1)).as("__n"), sum(x).as("__s1"), sum(x * x).as("__s2"))
      .withColumn("season_mean", s9(col("__s1") / col("__n")))
      .withColumn("season_std", s9(sqrt(greatest(
        col("__s2") / col("__n") - col("season_mean") * col("season_mean"), lit(0.0)))))
    withB.join(prof, keyCols :+ "__b")
      .withColumn("is_anomaly",
        when(x.isNotNull && col("__n") >= minBucket,
          s9(abs(x - col("season_mean"))) > s9(lit(nSigma) * col("season_std"))))
      .drop("__b", "__n", "__s1", "__s2")
  }

  /** Offline change-point detection per key — binary segmentation's
    * first split (Scott–Knott / CUSUM-literature standard): the
    * position `s` minimizing `SSE(1..s) + SSE(s+1..n)` over the
    * event-time order, i.e. the single level shift that explains
    * the most variance. The retrospective complement of [[cusum]]
    * (which flags drift ONLINE): "when did the metric actually
    * move".
    *
    * Determinism discipline: values quantize to integer cents
    * (`round(value·100)` as long), so the per-key prefix sums
    * S, Q are EXACT integers no matter how either engine
    * associates the window accumulation (DuckDB's segment-tree
    * windowed sums reassociate float adds — ints don't care); the
    * gain arithmetic is one fixed-order double expression per
    * candidate; arg-max ties break to the smallest split. ONE keyed
    * window pass + a per-key total join + one min-by reduction —
    * the group axis is the scale axis.
    *
    * @param minSegment both segments must keep ≥ this many rows
    * @return (keyCols*, n, split_pos, split_ts, gain, mean_left,
    *         mean_right) — one row per key with n ≥ 2·minSegment;
    *         gain and means on the 1e-6 grid
    */
  def changePoint(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      tsCol: String,
      valueCol: String,
      minSegment: Int = 5
  ): DataFrame = {
    require(minSegment >= 1, s"minSegment must be >= 1, got $minSegment")
    val ks = keyCols.map(col)
    val s6 = (c: Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val base = df.filter(col(valueCol).isNotNull)
      .select(ks ++ orderCols.map(col) :+ col(tsCol).as("__ts") :+
        round(col(valueCol) * 100).cast("long").as("__c"): _*)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(ks: _*).orderBy(orderCols.map(col): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val pre = base
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(ks: _*).orderBy(orderCols.map(col): _*)))
      .withColumn("__s", sum(col("__c")).over(win))
      .withColumn("__q", sum(col("__c") * col("__c")).over(win))
    val tot = base.groupBy(ks: _*).agg(
      count(lit(1)).as("n"), sum(col("__c")).as("__st"),
      sum(col("__c") * col("__c")).as("__qt"))
    def sse(q: Column, s: Column, nn: Column): Column =
      q.cast("double") - s.cast("double") * s.cast("double") / nn.cast("double")
    val cand = pre.join(tot, keyCols)
      .filter(col("__rn") >= minSegment && col("n") - col("__rn") >= minSegment)
      .withColumn("gain", s6(
        sse(col("__qt"), col("__st"), col("n")) -
          (sse(col("__q"), col("__s"), col("__rn")) +
            sse(col("__qt") - col("__q"), col("__st") - col("__s"), col("n") - col("__rn"))) ))
    val pick = org.apache.spark.sql.expressions.Window
      .partitionBy(ks: _*).orderBy(col("gain").desc, col("__rn"))
    cand.withColumn("__pk", row_number().over(pick))
      .filter(col("__pk") === 1)
      .select(ks ++ Seq(col("n"), col("__rn").as("split_pos"), col("__ts").as("split_ts"),
        col("gain"),
        s6(col("__s").cast("double") / (col("__rn") * 100)).as("mean_left"),
        s6((col("__st") - col("__s")).cast("double") / ((col("n") - col("__rn")) * 100)).as("mean_right")): _*)
  }

  /** Holt–Winters additive triple exponential smoothing per key
    * (Winters 1960 — the seasonal upgrade of [[doubleEwmaForecast]]:
    * Brown recovers a trend, this also learns a repeating
    * length-`seasonLen` profile, so "every 7th observation runs
    * hot" stops registering as trend or anomaly). State per key is
    * level ℓ, trend b and the m seasonal offsets; per non-null
    * observation i (0-based over the key's non-null rows):
    *
    *   ŝ = s[i mod m]; forecast = ℓ + b + ŝ   (one-step-ahead,
    *     from PRIOR state — each value judged by its past)
    *   ℓ' = α(x − ŝ) + (1−α)(ℓ + b)
    *   b' = β(ℓ' − ℓ) + (1−β)b
    *   s[i mod m] = γ(x − ℓ') + (1−γ)ŝ
    *
    * Deterministic cold start (the replayable convention): the
    * first non-null row sets ℓ = x, b = 0, seasonals all 0, emits a
    * NULL forecast and consumes seasonal slot 0. Every update
    * snaps to the 1e-9 grid, so the sequential fixed point is
    * engine-independent and the whole scan replays via an unrolled
    * recursive CTE carrying (ℓ, b, s₀…s_{m−1}). NULL values emit
    * NULL outputs and leave state untouched.
    *
    * Scale shape — the [[cusum]] discipline: the recurrence is
    * non-affine in the seasonal index, so no lawful merge exists;
    * ONE repartition(keys) + in-partition sort + an O(m)-state
    * imperative scan. Per-key state is m+2 doubles regardless of
    * series length.
    *
    * @return input columns + (level, trend, seasonal, forecast)
    */
  def holtWinters(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      seasonLen: Int,
      alpha: Double,
      beta: Double,
      gamma: Double
  ): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    require(seasonLen >= 2, s"seasonLen must be >= 2, got $seasonLen")
    for ((nm, v) <- Seq("alpha" -> alpha, "beta" -> beta, "gamma" -> gamma))
      require(v > 0 && v < 1, s"$nm must be in (0,1), got $v")
    val sorted = df
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val kIdx = keyCols.map(sorted.schema.fieldIndex)
    val outSchema = org.apache.spark.sql.types.StructType(sorted.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("level", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("trend", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("seasonal", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("forecast", org.apache.spark.sql.types.DoubleType)))
    def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
    sorted.mapPartitions { rows =>
      var curKey: Seq[Any] = null
      var init = false
      var l = 0.0
      var b = 0.0
      var i = 0L
      var s: Array[Double] = null
      rows.map { row =>
        val key = kIdx.map(row.get)
        if (key != curKey) {
          curKey = key; init = false; l = 0.0; b = 0.0; i = 0L
          s = Array.fill(seasonLen)(0.0)
        }
        val extra: Seq[Any] =
          if (row.isNullAt(vIdx)) Seq(null, null, null, null)
          else {
            val x = row.get(vIdx) match {
              case d: Double => d
              case f: Float => f.toDouble
              case n: Number => n.doubleValue()
            }
            val idx = (i % seasonLen).toInt
            i += 1
            if (!init) {
              init = true; l = x; b = 0.0
              Seq(l, 0.0, 0.0, null)
            } else {
              val sHat = s(idx)
              val forecast = snap9(l + b + sHat)
              val lNew = snap9(alpha * (x - sHat) + (1.0 - alpha) * (l + b))
              b = snap9(beta * (lNew - l) + (1.0 - beta) * b)
              s(idx) = snap9(gamma * (x - lNew) + (1.0 - gamma) * sHat)
              l = lNew
              Seq(l, b, s(idx), forecast)
            }
          }
        org.apache.spark.sql.Row.fromSeq(row.toSeq ++ extra)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Additive seasonal decomposition per key (classical
    * decompose — the retrospective companion of [[holtWinters]]:
    * HW tracks level/trend/season ONLINE, this splits a finished
    * series into trend + seasonal + residual for inspection):
    *
    *   trend_t    = centered (2⌊m/2⌋+1)-point moving average
    *                (NULL at the edges where the window is partial)
    *   seasonal_p = per-(key, phase) mean of the detrended values,
    *                centered so the m seasonals sum to ~0
    *   residual_t = value − trend − seasonal
    *
    * The residual is where [[seasonalAnomalies]]-style bands or
    * [[changePoint]] then apply without the calendar pattern
    * polluting them.
    *
    * Scale shape: one keyed window sort (position + centered
    * average in the same frame), ONE map-side-combinable
    * groupBy(key, phase) for the seasonal profile (≤ keys·m rows)
    * + a second tiny agg for centering, both joined back
    * broadcast-sized. Every derived value snaps to the 1e-9 grid.
    */
  def seasonalDecompose(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      seasonLen: Int
  ): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    require(seasonLen >= 2, s"seasonLen must be >= 2, got $seasonLen")
    val s9 = (c: Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val ks = keyCols.map(col)
    val h = seasonLen / 2
    val ordW = org.apache.spark.sql.expressions.Window
      .partitionBy(ks: _*).orderBy(orderCols.map(col): _*)
    val maW = ordW.rowsBetween(-h, h)
    val x = col(valueCol).cast("double")
    val base = df.filter(x.isNotNull)
      .withColumn("phase", (row_number().over(ordW) - 1) % seasonLen)
      .withColumn("trend",
        when(count(lit(1)).over(maW) === (2 * h + 1), s9(avg(x).over(maW))))
      .withColumn("__detr", x - col("trend"))
    // Phase means via exact integer nano-sums, NOT float avg+snap:
    // detrended values sit on the 1e-9 grid (value − grid trend), so
    // a phase mean is (Σ nano-ints)/n — which lands EXACTLY on
    // half-grid points whenever n divides 2Σ, and there the two
    // engines' float-summation ulp decides the floor: the r13 sf1
    // sweep measured 4% of rows flipping by one grid step. Integer
    // sums make the quotient correctly-rounded-identical in both
    // engines, and exact halves floor deterministically (k+0.5 is
    // representable). The corr-matrix/Spearman overflow lesson's
    // sibling: means of GRID values must aggregate on the integer
    // grid. |nano| ≤ ~1e11 · group rows — overflow at ≥ 9·10⁷ rows
    // per (key, phase) × unit scale, far past any phase frame.
    val prof = base.filter(col("__detr").isNotNull)
      .withColumn("__dn", floor(col("__detr") * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(ks :+ col("phase"): _*)
      .agg(sum(col("__dn")).as("__sn"), count(lit(1)).as("__cn"))
      .withColumn("__raw",
        floor(col("__sn").cast("double") / col("__cn") + lit(0.5)) / lit(1e9))
      .drop("__sn", "__cn")
    val center = prof
      .withColumn("__rn", floor(col("__raw") * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(ks: _*)
      .agg(sum(col("__rn")).as("__cs"), count(lit(1)).as("__cp"))
      .withColumn("__adj",
        floor(col("__cs").cast("double") / col("__cp") + lit(0.5)) / lit(1e9))
      .drop("__cs", "__cp")
    val seasonal = prof.join(center, keyCols)
      .withColumn("seasonal", s9(col("__raw") - col("__adj")))
      .select(ks ++ Seq(col("phase"), col("seasonal")): _*)
    base.join(seasonal, keyCols :+ "phase", "left")
      .withColumn("residual",
        when(col("trend").isNotNull && col("seasonal").isNotNull,
          s9(x - col("trend") - col("seasonal"))))
      .drop("__detr")
  }
}
