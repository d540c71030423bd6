package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence modeling over keyed, time-ordered streams — the
  * behavioral layer next to [[FunnelOps]] (funnels ask "did the
  * prescribed path happen", these ask "what paths DO happen").
  */
object SequenceOps {

  /** First-order Markov transition matrix between event types: for
    * each observed (from, to) adjacent pair within a key's
    * time-ordered stream, the transition count and row-normalized
    * probability `P(to | from)`.
    *
    * ONE keyed-window shuffle builds the adjacency (lag over
    * `partitionBy(key).orderBy(order...)`), then a
    * map-side-combinable groupBy(from, to) count and a tiny
    * per-from normalization join — the matrix frame is
    * |types|² rows regardless of the event log. Probabilities are
    * integer-count ratios on the 1e-9 grid.
    *
    * @param orderCols total order within key (include a unique
    *        tie-break — adjacency is order-defined)
    * @return (from_type, to_type, n, p) — p on the 1e-9 grid
    */
  def transitionMatrix(
      events: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      typeCol: String
  ): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val pairs = events
      .filter(col(typeCol).isNotNull)
      .select(col(keyCol), col(typeCol).as("to_type"),
        lag(col(typeCol), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
    val counts = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type")).agg(sum(col("n")).as("__t"))
    counts.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (floor(col("n") / col("__t").cast("double") * lit(1e9) + lit(0.5)) / lit(1e9)).as("p"))
  }

  /** Top-k most common event paths: each key's first `maxLen` events
    * (time order) joined as a `a>b>c` path string, counted across
    * keys, ranked by frequency — "what journeys DO users take".
    *
    * The per-key frame is CAPPED before collection: a row-number
    * window keeps only the first maxLen events per key, so the
    * groupBy(key) collect holds ≤ maxLen elements regardless of key
    * activity (the same bounded-buffer discipline as the dedup
    * caps). Then one map-side-combinable groupBy(path) count and a
    * TakeOrderedAndProject top-k, ties by path string.
    *
    * @return (path, n_keys) — top k by count desc
    */
  def topPaths(
      events: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      typeCol: String,
      maxLen: Int = 5,
      k: Int = 20
  ): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val capped = events
      .filter(col(typeCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxLen)
    val paths = capped
      .groupBy(col(keyCol))
      .agg(concat_ws(">", transform(
        array_sort(collect_list(struct(col("__rn"), col(typeCol).as("t")))),
        s => s("t"))).as("path"))
    paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_keys"))
      .orderBy(col("n_keys").desc, col("path"))
      .limit(k)
  }

  /** Top sliding event n-grams across all keys — the windowed
    * complement of [[topPaths]] (paths look at each key's FIRST
    * maxLen events; n-grams count every consecutive run anywhere in
    * the stream, the event-sequence analog of text n-grams). ONE
    * keyed-window shuffle builds the lag chain (each row carries
    * its n−1 predecessors — no per-key buffering beyond the window
    * sort), then a map-side-combinable groupBy(gram) count and a
    * TakeOrderedAndProject top-k, ties by gram string.
    *
    * @return (gram, n_occurrences) — top k by count desc
    */
  def topEventNgrams(
      events: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      typeCol: String,
      n: Int = 3,
      k: Int = 20
  ): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    require(n >= 2, s"n must be >= 2, got $n")
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val lags = (n - 1 to 1 by -1).map(i => lag(col(typeCol), i).over(w)) :+ col(typeCol)
    events
      .filter(col(typeCol).isNotNull)
      .select(lags.zipWithIndex.map { case (c, i) => c.as(s"__t$i") }: _*)
      .filter((0 until n).map(i => col(s"__t$i").isNotNull).reduce(_ && _))
      .select(concat_ws(">", (0 until n).map(i => col(s"__t$i")): _*).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("gram"))
      .limit(k)
  }

  /** Inter-arrival gap statistics: per-key consecutive event gaps
    * in seconds, summarized per group (event cadence — bot
    * detection, pipeline-lag monitoring, the session-gap tuning
    * signal for sessionization). ONE keyed-window shuffle builds
    * the gaps (each row differenced against its predecessor);
    * mean/min/max are a map-side-combinable groupBy and the exact
    * type-7 median runs on the distinct-gap frame
    * ([[StatsOps.groupQuantileExact]] — aggregator memory is
    * distinct gaps, not rows). Gap = µs difference / 1e6, one IEEE
    * division, replayable.
    *
    * @param groupCols grouping for the SUMMARY (evaluated on the
    *        later event of each gap), e.g. the event type
    * @return (groupCols*, n_gaps, mean_gap_s, min_gap_s, max_gap_s,
    *         p50_gap_s) — mean on the 1e-9 grid, median exact
    */
  def interArrivalStats(
      events: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      tsCol: String,
      groupCols: Seq[String]
  ): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val snap9 = (c: org.apache.spark.sql.Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val gaps = events
      .filter(col(tsCol).isNotNull)
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .withColumn("gap_s",
        (expr(s"unix_micros($tsCol)") - expr("unix_micros(__prev)")).cast("double") / lit(1e6))
    val gs = groupCols.map(col)
    val basic = gaps.groupBy(gs: _*).agg(
      count(lit(1)).as("n_gaps"),
      snap9(avg(col("gap_s"))).as("mean_gap_s"),
      min(col("gap_s")).as("min_gap_s"),
      max(col("gap_s")).as("max_gap_s"))
    val med = StatsOps.groupQuantileExact(gaps, groupCols, "gap_s", 0.5)
      .withColumnRenamed("q_value", "p50_gap_s")
    basic.join(med, groupCols)
      .select(gs ++ Seq(col("n_gaps"), col("mean_gap_s"),
        col("min_gap_s"), col("max_gap_s"), col("p50_gap_s")): _*)
  }

  /** Time-weighted average value per key (TWAP — the correct mean
    * for irregularly-sampled series: each observation holds until
    * the next one, so it weighs by its holding DURATION, not its
    * sample count; a plain avg over-weights bursts). ONE keyed
    * window builds (value, duration-to-next) pairs; the last
    * observation of a key has no duration and drops (standard
    * half-open-interval convention). Σv·dur and Σdur are raw sums,
    * the single ratio snaps to the 1e-9 grid.
    *
    * @return (keyCol, n_intervals, span_s, twap)
    */
  def twap(
      events: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      tsCol: String,
      valueCol: String
  ): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val snap9 = (c: org.apache.spark.sql.Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    events
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .withColumn("__next", lead(col(tsCol), 1).over(w))
      .filter(col("__next").isNotNull)
      // durations stay in EXACT integer microseconds through the
      // sum: the span total is order-proof, and dividing the
      // weighted sum by the exact long denominator keeps twap's
      // float wobble orders below the snap grid (a seconds-double
      // duration sum drifts with summation order at month-scale
      // spans)
      .withColumn("__dur_us",
        expr("unix_micros(__next)") - expr(s"unix_micros($tsCol)"))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("__dur_us")).as("__sus"),
        sum(col(valueCol).cast("double") * col("__dur_us").cast("double")).as("__wsum"))
      .select(col(keyCol), col("n_intervals"),
        snap9(col("__sus").cast("double") / lit(1e6)).as("span_s"),
        snap9(col("__wsum") / col("__sus").cast("double")).as("twap"))
  }

  /** Consecutive same-state runs per key (gaps-and-islands): each
    * maximal run of equal `stateCol` values in the key's time order
    * becomes one row with its bounds and length — uptime/downtime
    * stretches, status streaks, alert episodes. ONE keyed window
    * pass: the island id is `row_number − row_number-within-state`
    * (pure window arithmetic, no iteration), then a
    * map-side-combinable groupBy(key, state, island).
    *
    * @return (keyCol, state, run_start, run_end, run_len) —
    *         run_start/run_end are the first/last `tsCol` of the run
    */
  def stateRuns(
      events: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      tsCol: String,
      stateCol: String
  ): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val ws = Window.partitionBy(col(keyCol), col(stateCol)).orderBy(orderCols.map(col): _*)
    events
      .filter(col(stateCol).isNotNull)
      .withColumn("__island", row_number().over(w) - row_number().over(ws))
      .groupBy(col(keyCol), col(stateCol).as("state"), col("__island"))
      .agg(
        min(col(tsCol)).as("run_start"),
        max(col(tsCol)).as("run_end"),
        count(lit(1)).as("run_len"))
      .drop("__island")
  }

  /** Lagged cross-correlation between two event-type count series
    * ("do errors follow clicks k minutes later?"): both series are
    * per-bucket event counts on a fixed time grid, correlated at
    * every lag 0..maxLag — the temporal-causality screen over an
    * event log. Series build in ONE map-side-combinable
    * groupBy(type, bucket); the lag frame explodes series A by
    * maxLag+1 (bounded small) and joins B on the shifted bucket;
    * Pearson runs per lag with the snapped-means formulation
    * ([[StatsOps.linearTrend]]'s discipline). Buckets missing on
    * either side are treated as ABSENT pairs (not zero) — the
    * pairwise-complete convention of [[StatsOps.correlationMatrix]].
    *
    * @return (lag, n_buckets, corr) for lags 0..maxLag; corr NULL
    *         when either side is constant over the paired buckets
    */
  def laggedCorrelation(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      typeA: String,
      typeB: String,
      bucketSeconds: Long,
      maxLag: Int
  ): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    require(maxLag >= 0, s"maxLag must be >= 0, got $maxLag")
    val snap9 = (c: org.apache.spark.sql.Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val buckets = events
      .filter(col(tsCol).isNotNull && col(typeCol).isin(typeA, typeB))
      .select(col(typeCol).as("__t"),
        // integer division end-to-end: a double `/` would round the
        // quotient before the floor and flip bucket boundaries
        expr(s"(unix_micros($tsCol) div 1000000) div $bucketSeconds").as("__b"))
      .groupBy(col("__t"), col("__b"))
      .agg(count(lit(1)).cast("double").as("__c"))
    val a = buckets.filter(col("__t") === typeA)
      .select(col("__b"), col("__c").as("__x"),
        explode(sequence(lit(0), lit(maxLag))).as("lag"))
    val b = buckets.filter(col("__t") === typeB)
      .select(col("__b").as("__bb"), col("__c").as("__y"))
    val paired = a.join(b, col("__bb") === col("__b") + col("lag"))
    paired.groupBy(col("lag"))
      .agg(
        count(lit(1)).as("n_buckets"),
        snap9(avg(col("__x"))).as("__mx"), snap9(avg(col("__y"))).as("__my"),
        snap9(avg(col("__x") * col("__x"))).as("__mxx"),
        snap9(avg(col("__y") * col("__y"))).as("__myy"),
        snap9(avg(col("__x") * col("__y"))).as("__mxy"))
      .withColumn("__cov", snap9(col("__mxy") - col("__mx") * col("__my")))
      .withColumn("__vx", snap9(col("__mxx") - col("__mx") * col("__mx")))
      .withColumn("__vy", snap9(col("__myy") - col("__my") * col("__my")))
      .withColumn("corr", when(col("__vx") > 0 && col("__vy") > 0,
        snap9(col("__cov") / sqrt(col("__vx") * col("__vy")))))
      .select(col("lag"), col("n_buckets"), col("corr"))
  }

  /** Rolling active-entity counts per calendar day — DAU/WAU/MAU
    * and the stickiness ratio, the health dashboard every event
    * log feeds. For each observed day and each trailing window `w`
    * in `windows` (days, e.g. 1/7/28): the count of DISTINCT
    * entities active in `[day − w + 1, day]`, plus
    * `stickiness = au_min / au_max` (DAU/MAU for the default
    * windows — the classic engagement ratio).
    *
    * Scale shape: the raw log collapses FIRST to the distinct
    * (entity, day) frame (ONE shuffle — multiple events per day
    * never fan out), then each entity-day row expands to the
    * max(windows) report days it supports (fixed fan-out = maxW,
    * e.g. 28×, independent of log size) and ONE groupBy(day)
    * counts distinct entities per window via filtered
    * count-distincts (Spark plans the multi-distinct with one
    * expand). Report days are clamped to OBSERVED activity days by
    * a broadcast semi-join against the tiny distinct-day frame, so
    * trailing partial windows past the data's end never appear.
    * The output frame is |days| rows.
    */
  def activeUsers(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      windows: Seq[Int] = Seq(1, 7, 28)
  ): DataFrame = {
    require(windows.nonEmpty && windows.forall(_ >= 1), s"windows must be >= 1, got $windows")
    val snap9 = (c: org.apache.spark.sql.Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val ws = windows.distinct.sorted
    val maxW = ws.last
    val ud = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(to_date(col(tsCol)).as("__d"), col(userCol).as("__u"))
      .distinct()
    val obsDays = ud.select(col("__d").as("day")).distinct()
    val fan = ud
      .select(col("__u"), col("__d"), explode(sequence(lit(0), lit(maxW - 1))).as("__o"))
      .select(date_add(col("__d"), col("__o")).as("day"), col("__u"), col("__o"))
      .join(broadcast(obsDays), Seq("day"), "left_semi")
    val agg = fan.groupBy(col("day")).agg(
      countDistinct(when(col("__o") < ws.head, col("__u"))).as(s"au_${ws.head}"),
      ws.tail.map(w => countDistinct(when(col("__o") < w, col("__u"))).as(s"au_$w")): _*)
    if (ws.size < 2) agg
    else agg.withColumn("stickiness",
      when(col(s"au_${ws.last}") > 0,
        snap9(col(s"au_${ws.head}").cast("double") / col(s"au_${ws.last}").cast("double"))))
  }

  /** Autocorrelation function per key at lags 1..maxLag — "does
    * this series echo itself k steps later" (the SELF twin of
    * [[laggedCorrelation]], which correlates two different event
    * series): Pearson between x_t and x_{t+lag} over each key's
    * non-null observations in `orderCols` order. The
    * seasonality-detection screen that tells you what `seasonLen`
    * to hand [[graft.operators.DriftOps.holtWinters]], and the
    * mixing diagnostic for any sequential metric.
    *
    * Scale shape: ONE keyed row_number window positions the series
    * (nulls dropped first — ACF over observed positions), the lag
    * pairing is a bounded maxLag-fan-out self equi-join on (key,
    * position + lag) — a hash join carrying n·maxLag small rows,
    * never a window over an unbounded frame — and ONE map-side-
    * combinable groupBy(key, lag) collapses to the snapped-means
    * Pearson (the [[laggedCorrelation]] formulation). Output is
    * |keys|·maxLag rows; degenerate variances yield NULL.
    */
  def autocorrelation(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      maxLag: Int
  ): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val snap9 = (c: org.apache.spark.sql.Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val ks = keyCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(ks: _*).orderBy(orderCols.map(col): _*)
    val pos = df.filter(col(valueCol).isNotNull)
      .select(ks ++ orderCols.map(col) :+ col(valueCol).cast("double").as("__x"): _*)
      .withColumn("__rn", row_number().over(w))
      .select(ks ++ Seq(col("__x"), col("__rn")): _*)
    val left = pos
      .select(ks ++ Seq(col("__x").as("__x0"), col("__rn"),
        explode(sequence(lit(1), lit(maxLag))).as("lag")): _*)
      .withColumn("__tr", col("__rn") + col("lag"))
      .drop("__rn")
    val right = pos.select(ks ++ Seq(col("__x").as("__x1"), col("__rn").as("__tr")): _*)
    left.join(right, keyCols :+ "__tr")
      .groupBy(ks :+ col("lag"): _*)
      .agg(
        count(lit(1)).as("n_pairs"),
        snap9(avg(col("__x0"))).as("__mx"), snap9(avg(col("__x1"))).as("__my"),
        snap9(avg(col("__x0") * col("__x0"))).as("__mxx"),
        snap9(avg(col("__x1") * col("__x1"))).as("__myy"),
        snap9(avg(col("__x0") * col("__x1"))).as("__mxy"))
      .withColumn("__cov", snap9(col("__mxy") - col("__mx") * col("__my")))
      .withColumn("__vx", snap9(col("__mxx") - col("__mx") * col("__mx")))
      .withColumn("__vy", snap9(col("__myy") - col("__my") * col("__my")))
      .withColumn("acf", when(col("__vx") > 0 && col("__vy") > 0,
        snap9(col("__cov") / sqrt(col("__vx") * col("__vy")))))
      .select(ks ++ Seq(col("lag"), col("n_pairs"), col("acf")): _*)
  }

  /** Partial autocorrelation per key at lags 1..maxLag (Durbin–
    * Levinson over the [[autocorrelation]] frame — PACF is THE
    * AR-order picker: ACF of an AR(p) process tails off forever,
    * PACF cuts off sharp at lag p, so this is what actually
    * answers "how many lags does the forecaster need"): φ_11 = ρ₁,
    * then for k ≥ 2 the standard recursion
    * φ_kk = (ρ_k − Σ φ_{k−1,j}·ρ_{k−j}) / (1 − Σ φ_{k−1,j}·ρ_j),
    * φ_kj = φ_{k−1,j} − φ_kk·φ_{k−1,k−j}, every assignment snapped
    * at 1e-9 in a fixed evaluation order so the recursion replays
    * cross-engine.
    *
    * Scale shape: the data pass IS [[autocorrelation]] (its one
    * window + bounded lag join); the recursion runs as an O(L²)
    * in-partition scan over the tiny |keys·maxLag| ACF frame (the
    * CUSUM discipline — sequential fixed points that have no
    * lawful merge run imperatively over pre-collapsed frames,
    * never over raw rows). Keys with any NULL ρ in 1..maxLag (a
    * degenerate variance) emit NULL pacf from that lag on.
    */
  def partialAutocorrelation(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      maxLag: Int
  ): DataFrame = {
    val acf = autocorrelation(df, keyCols, orderCols, valueCol, maxLag)
    val sorted = acf
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols.map(col) :+ col("lag")): _*)
    val kIdx = keyCols.map(sorted.schema.fieldIndex)
    val lagIdx = sorted.schema.fieldIndex("lag")
    val acfIdx = sorted.schema.fieldIndex("acf")
    val outSchema = org.apache.spark.sql.types.StructType(sorted.schema.fields :+
      org.apache.spark.sql.types.StructField("pacf", org.apache.spark.sql.types.DoubleType))
    def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
    sorted.mapPartitions { rows =>
      var curKey: Seq[Any] = null
      var rho: Array[Double] = null // 1-indexed, NaN = missing
      var phi: Array[Double] = null // φ_{k-1, j}
      var k = 0
      var nextLag = 1
      var dead = false
      rows.map { row =>
        val key = kIdx.map(row.get)
        if (key != curKey) {
          curKey = key
          rho = Array.fill(maxLag + 1)(Double.NaN)
          phi = Array.fill(maxLag + 1)(Double.NaN)
          k = 0; nextLag = 1; dead = false
        }
        val lag = row.getInt(lagIdx)
        // a gap in the lag sequence (an all-degenerate lag dropped
        // from the ACF frame) kills the recursion for this key
        if (lag != nextLag) dead = true
        nextLag = lag + 1
        val rhoK = if (row.isNullAt(acfIdx)) Double.NaN else row.getDouble(acfIdx)
        rho(lag) = rhoK
        k = lag
        val pacf: Any =
          if (dead || rhoK.isNaN) { dead = true; null }
          else if (k == 1) { phi(1) = rhoK; rhoK }
          else {
            var num = rho(k)
            var den = 1.0
            var j = 1
            while (j < k) {
              num -= phi(j) * rho(k - j)
              den -= phi(j) * rho(j)
              j += 1
            }
            if (den == 0.0) { dead = true; null }
            else {
              val phiKK = snap9(num / den)
              val newPhi = Array.fill(maxLag + 1)(Double.NaN)
              var j2 = 1
              while (j2 < k) {
                newPhi(j2) = snap9(phi(j2) - phiKK * phi(k - j2))
                j2 += 1
              }
              newPhi(k) = phiKK
              phi = newPhi
              phiKK
            }
          }
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ pacf)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Time-bucketed OHLC bars per key (open/high/low/close + count/
    * sum/mean — the canonical downsampling of an irregular metric
    * stream into fixed intervals, for dashboards and downstream
    * models that want aligned series). `orderCols` break open/close
    * ties deterministically (pass the event id alongside ts).
    *
    * Scale shape: ONE map-side-combinable groupBy(key, bucket) —
    * open/close ride `min_by`/`max_by` over the order struct inside
    * the same aggregation (no window sort, no second pass), bucket
    * ids are exact integer µs division. Output is |keys·buckets|
    * rows; the mean snaps to the 1e-9 grid, extrema/sums are exact
    * copies/sums of input doubles.
    */
  def ohlcBars(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      orderCols: Seq[String],
      valueCol: String,
      bucketSeconds: Long
  ): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    require(orderCols.nonEmpty, "need at least one ordering column")
    val snap9 = (c: org.apache.spark.sql.Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val ks = keyCols.map(col)
    val x = col(valueCol).cast("double")
    val ord = struct(orderCols.map(col): _*)
    df.filter(col(tsCol).isNotNull && x.isNotNull)
      .withColumn("__b",
        expr(s"(unix_micros($tsCol) div 1000000) div $bucketSeconds"))
      .groupBy(ks :+ col("__b"): _*)
      .agg(
        count(lit(1)).as("n"),
        min_by(x, ord).as("open"),
        max(x).as("high"),
        min(x).as("low"),
        max_by(x, ord).as("close"),
        sum(x).as("__s"))
      .withColumn("bucket_start",
        (col("__b") * lit(bucketSeconds)).cast("timestamp"))
      .withColumn("mean", snap9(col("__s") / col("n")))
      .select(ks ++ Seq(col("bucket_start"), col("n"), col("open"), col("high"),
        col("low"), col("close"), snap9(col("__s")).as("sum"), col("mean")): _*)
  }

  /** STREAMING OHLC bars — [[ohlcBars]] as an event-time windowed
    * aggregation (`min_by`/`max_by`/extrema/sum are all lawful
    * streaming aggregates, so per-(window, key) state is the seven
    * bar scalars regardless of event count; append mode emits each
    * bar once its watermark passes). Works identically on a batch
    * frame — the batch run IS the oracle twin.
    */
  def ohlcBarsWindowed(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      orderCols: Seq[String],
      valueCol: String,
      windowLen: String,
      watermark: String = "2 hours"
  ): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    val snap9 = (c: org.apache.spark.sql.Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val ks = keyCols.map(col)
    val x = col(valueCol).cast("double")
    val ord = struct(orderCols.map(col): _*)
    val src = if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    src.filter(col(tsCol).isNotNull && x.isNotNull)
      .groupBy(window(col(tsCol), windowLen).as("w") +: ks: _*)
      .agg(
        count(lit(1)).as("n"),
        min_by(x, ord).as("open"),
        max(x).as("high"),
        min(x).as("low"),
        max_by(x, ord).as("close"),
        sum(x).as("__s"))
      .select(col("w.start").as("bucket_start") +: ks ++: Seq(col("n"),
        col("open"), col("high"), col("low"), col("close"),
        snap9(col("__s")).as("sum"), snap9(col("__s") / col("n")).as("mean")): _*)
  }

  /** Period-over-period deltas per key (WoW/MoM growth — the
    * reporting layer over any keyed metric): ONE map-side-
    * combinable groupBy(key, calendar period) collapses the log,
    * then a lag window over the tiny |keys·periods| frame yields
    * the previous OBSERVED period's value, the absolute delta and
    * the snapped percent change. `prev_period` rides along so a
    * consumer can tell calendar-adjacent comparisons from
    * gap-jumping ones. Degenerate previous (absent or 0) → NULL
    * pct.
    *
    * @param period "day" | "week" | "month" (date_trunc units —
    *               week is ISO Monday)
    */
  def periodOverPeriod(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      period: String = "week"
  ): DataFrame = {
    require(Seq("day", "week", "month").contains(period),
      s"period must be day/week/month, got $period")
    val snap9 = (c: org.apache.spark.sql.Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val ks = keyCols.map(col)
    val agg = df.filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(ks :+ to_date(date_trunc(period, col(tsCol))).as("period"): _*)
      .agg(count(lit(1)).as("n"), snap9(sum(col(valueCol).cast("double"))).as("total"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(ks: _*).orderBy(col("period"))
    agg
      .withColumn("prev_period", lag(col("period"), 1).over(w))
      .withColumn("prev_total", lag(col("total"), 1).over(w))
      .withColumn("delta", when(col("prev_total").isNotNull,
        snap9(col("total") - col("prev_total"))))
      .withColumn("pct_change", when(col("prev_total").isNotNull && col("prev_total") =!= 0.0,
        snap9((col("total") - col("prev_total")) / abs(col("prev_total")))))
  }
}
