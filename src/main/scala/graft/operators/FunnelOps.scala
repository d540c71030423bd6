package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event log: for a step sequence
  * `A → B → C`, each user's conversion times are the earliest
  * strictly-increasing chain `t_A = min ts(A)`,
  * `t_B = min { ts(B) > t_A }`, `t_C = min { ts(C) > t_B }` — the
  * product-analytics primitive behind conversion/retention reporting,
  * and a natural companion to sessionization (M3/M11).
  *
  * ONE shuffle: rows not typed as any funnel step drop BEFORE the
  * `groupBy(user)`, the shuffle carries only step-typed events, and
  * the per-user state is one timestamp list per step (bounded by the
  * user's step-event counts — funnel steps are the rare events by
  * construction). The chain resolution is pure higher-order column
  * arithmetic (`array_min(filter(…))` with the previous step's time
  * captured in the lambda) — codegen-friendly, no UDF, no second
  * pass, no join-back.
  *
  * Null chaining gives the funnel semantics for free: a user who
  * never reached step i has `t_i` null, the lambda `x > null`
  * evaluates null, `filter` drops it, `array_min(empty)` is null —
  * so all later steps stay null and `reached` is monotone.
  *
  * @param steps the ordered step types (≥ 1); a user appears in the
  *              output iff they have at least one step-typed event
  * @return one row per user: (userCol, t_0 … t_{k−1}, reached) with
  *         `t_i` the step-i conversion TIMESTAMP and `reached` the
  *         number of completed steps
  */
object FunnelOps {

  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      maxSpanSeconds: Option[Long] = None
  ): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct.size == steps.size, s"steps must be distinct, got $steps")
    require(maxSpanSeconds.forall(_ > 0), s"maxSpanSeconds must be positive: $maxSpanSeconds")
    // per-user step-timestamp lists are UNBOUNDED state (a user's
    // event count), so they must not ride the ObjectHashAggregate
    // hash path the session keeps hot for bounded aggregates
    // (GraftSession fallbackThreshold note): a task would hold every
    // user's full lists in its hash map at once. Window-function
    // collect_list over an unbounded frame computes the identical
    // arrays but WindowExec buffers ONE user at a time in a
    // spillable array — memory safety is structural, shuffle volume
    // unchanged (collect partials don't combine anyway).
    // The one-row-per-user reduction is first() — a SortAggregate
    // streaming the window's already-sorted groups (no new sort or
    // exchange, one prebuilt array list held at a time), NOT
    // row_number()=1, whose filter hides the key uniqueness from
    // the optimizer (see DedupOps.removeRepeatedNgrams) and costs a
    // second window pass.
    val wUser = Window.partitionBy(col(userCol))
    val aggd = events
      .filter(col(typeCol).isin(steps: _*))
      .select(
        col(userCol) +:
          steps.zipWithIndex.map { case (s, i) =>
            collect_list(when(col(typeCol) === s, col(tsCol))).over(wUser).as(s"__s$i")
          }: _*)
      .groupBy(col(userCol))
      .agg(first(col("__s0")).as("__s0"),
        steps.indices.tail.map(i => first(col(s"__s$i")).as(s"__s$i")): _*)
    // optional conversion deadline: step i counts only within
    // maxSpan of t_0 — the "converted within 7 days" form every
    // funnel report actually publishes. The bound rides inside the
    // same lambda (null t_0 keeps the null-chaining semantics).
    val times = steps.indices.foldLeft(Vector.empty[Column]) { (acc, i) =>
      val t =
        if (i == 0) array_min(col("__s0"))
        else {
          val lower = acc.last
          maxSpanSeconds match {
            case None => array_min(filter(col(s"__s$i"), x => x > lower))
            case Some(span) =>
              val deadline = acc.head + expr(s"INTERVAL $span SECONDS")
              array_min(filter(col(s"__s$i"), x => x > lower && x <= deadline))
          }
        }
      acc :+ t
    }
    val reached = times.map(t => when(t.isNotNull, 1).otherwise(0)).reduce(_ + _)
    aggd.select(
      col(userCol) +:
        times.zipWithIndex.map { case (t, i) => t.as(s"t_$i") } :+
        reached.as("reached"): _*)
  }

  /** Cohort retention matrix: users are cohorted by the period of
    * their FIRST event, and each cohort's later activity is counted
    * per period offset — the classic retention triangle ("of the
    * users acquired in week W, how many were active in week W+k").
    *
    * ONE wide shuffle: `groupBy(user)` collects the first-event
    * period and the DISTINCT activity periods in a single pass
    * (per-user state is one timestamp + one bounded period set — at
    * most the number of periods in the data's time span, never the
    * user's raw event count). The explode + `groupBy(cohort,
    * offset)` that follows runs on the users×periods frame, already
    * orders of magnitude smaller than the event log, and cohort
    * sizes reuse the same frame (offset 0 always exists — the
    * first-event period is itself an activity period).
    *
    * Periods are `date_trunc(period)` boundaries; `offset` counts
    * whole periods between cohort and activity (exact integer from
    * the day difference — `week` divides by 7, `month` uses
    * calendar month arithmetic).
    *
    * @param period `"week"` (ISO Monday truncation) or `"month"`
    * @return (cohort, offset, n_active, cohort_size, retention) —
    *         retention on the 1e-6 grid, one row per observed
    *         (cohort, offset)
    */
  def retention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      period: String = "week"
  ): DataFrame = {
    require(Set("week", "month").contains(period), s"period must be week|month, got $period")
    val perUser = events
      .select(col(userCol).as("__u"), date_trunc(period, col(tsCol)).as("__p"))
      .groupBy(col("__u"))
      .agg(min(col("__p")).as("cohort"), collect_set(col("__p")).as("__ps"))
    val offset =
      if (period == "week") floor(datediff(col("__p"), col("cohort")) / 7)
      else months_between(col("__p"), col("cohort")).cast("long")
    val active = perUser
      .select(col("__u"), col("cohort"), explode(col("__ps")).as("__p"))
      .select(col("cohort"), offset.as("offset"))
      .groupBy(col("cohort"), col("offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = active.filter(col("offset") === 0)
      .select(col("cohort"), col("n_active").as("cohort_size"))
    active.join(sizes, Seq("cohort"))
      .select(col("cohort"), col("offset"), col("n_active"), col("cohort_size"),
        (floor(col("n_active") / col("cohort_size") * 1e6 + lit(0.5)) / 1e6).as("retention"))
  }

  /** RFM customer segmentation: recency (days since last purchase at
    * `asOfDate`), frequency (purchase count), monetary (revenue sum),
    * each scored 1–5 against the population's exact quintile
    * thresholds, plus a conventional segment label from the (r, f)
    * cell (champion / loyal / new / at_risk / hibernating / regular).
    *
    * Scale shape: ONE `groupBy(customer)` with map-side partial
    * aggregation collapses the order log to the customer frame; the
    * quintile thresholds are a 1-row exact-`percentile` aggregate
    * broadcast back over it — no global-sort `ntile` window (a
    * single-partition sort of every customer at 100 TB). Threshold
    * scoring means ties share a score (equal-VALUE quintiles, not
    * equal-population), which is the stable choice under re-runs.
    *
    * Determinism: recency and frequency are exact integers; monetary
    * sums per-row `round(amount·100)` cents as longs so the aggregate
    * is exact integer arithmetic regardless of reduction order, and
    * `percentile` interpolates over integer frames — every score is a
    * deterministic function of the data.
    *
    * @param asOfDate ISO date literal the recency axis counts back from
    * @return (custCol, recency_days, frequency, monetary,
    *         r_score, f_score, m_score, segment)
    */
  def rfm(
      orders: DataFrame,
      custCol: String,
      dateCol: String,
      amountCol: String,
      asOfDate: String
  ): DataFrame = {
    val base = orders
      .filter(col(custCol).isNotNull && col(dateCol).isNotNull && col(amountCol).isNotNull)
      .groupBy(col(custCol))
      .agg(
        max(col(dateCol).cast("date")).as("__last"),
        count(lit(1)).as("frequency"),
        sum(round(col(amountCol) * 100).cast("long")).as("__cents"))
      .select(col(custCol),
        datediff(lit(asOfDate).cast("date"), col("__last")).as("recency_days"),
        col("frequency"), col("__cents"))
    val qs = Seq(0.2, 0.4, 0.6, 0.8)
    val thrAggs =
      qs.zipWithIndex.map { case (q, i) => percentile(col("recency_days"), lit(q)).as(s"__r$i") } ++
      qs.zipWithIndex.map { case (q, i) => percentile(col("frequency"), lit(q)).as(s"__f$i") } ++
      qs.zipWithIndex.map { case (q, i) => percentile(col("__cents"), lit(q)).as(s"__m$i") }
    val thr = base.agg(thrAggs.head, thrAggs.tail: _*)
    def above(c: Column, pfx: String): Column =
      qs.indices.map(i => when(c > col(s"$pfx$i"), 1).otherwise(0)).reduce(_ + _)
    val scored = base.crossJoin(broadcast(thr))
      .withColumn("r_score", lit(5) - above(col("recency_days"), "__r"))
      .withColumn("f_score", lit(1) + above(col("frequency"), "__f"))
      .withColumn("m_score", lit(1) + above(col("__cents"), "__m"))
    scored.select(col(custCol), col("recency_days"), col("frequency"),
      (col("__cents") / 100.0).as("monetary"),
      col("r_score"), col("f_score"), col("m_score"),
      when(col("r_score") >= 4 && col("f_score") >= 4, "champion")
        .when(col("f_score") >= 4, "loyal")
        .when(col("r_score") >= 4 && col("f_score") <= 2, "new")
        .when(col("r_score") <= 2 && col("f_score") >= 3, "at_risk")
        .when(col("r_score") <= 2, "hibernating")
        .otherwise("regular").as("segment"))
  }

  /** Kaplan–Meier product-limit survival curve per group (Kaplan &
    * Meier 1958) — the right-censoring-aware lifetime estimate
    * behind churn/retention curves ("what fraction of users survive
    * past day t", where still-active users must NOT count as
    * churned-at-last-sighting; [[retention]] reports activity per
    * period, this estimates the survival function itself).
    *
    * Input: ONE row per subject — `(groupCols*, durationCol,
    * eventCol)` with duration an integral time-to-outcome (days
    * observed) and event 1 = outcome observed (churned/died) /
    * 0 = censored (still active at cutoff).
    *
    * Scale shape: one map-side-combinable `groupBy(group, t)`
    * collapses subjects to the DISTINCT-duration frame (the
    * KS/outliers discipline: aggregator memory is distinct event
    * times — day-granularity durations bound it at the observation
    * span, NEVER the subject count); at-risk counts are window sums
    * over that bounded frame, and the survival product folds the
    * per-t factors `(n_t − d_t)/n_t` — each an exact-integer ratio
    * snapped at 1e-9 — per-group via one `collect_list` (bounded by
    * the same contract) + a left-to-right `aggregate` fold, snapped
    * per step so a recursive replay reproduces every point
    * bit-for-bit.
    *
    * @return one row per (group, distinct duration): (groupCols*, t,
    *         at_risk, d, c, survival) — `d` events at t, `c`
    *         censored at t, `survival` = S(t)
    */
  def kaplanMeier(
      df: DataFrame,
      groupCols: Seq[String],
      durationCol: String,
      eventCol: String
  ): DataFrame = {
    val reserved = Set("t", "at_risk", "d", "c", "survival")
    require(groupCols.forall(g => !reserved.contains(g)),
      s"group column collides with an output column (reserved: $reserved)")
    val gs = groupCols.map(col)
    val s9 = (c: Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val perT = df
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .groupBy(gs :+ col(durationCol).cast("long").as("t"): _*)
      .agg(
        sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("d"),
        sum(when(col(eventCol) === 1, 0L).otherwise(1L)).as("c"))
    val wOrd = Window.partitionBy(gs: _*).orderBy(col("t"))
    val before = coalesce(
      sum(col("d") + col("c")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val total = sum(col("d") + col("c")).over(Window.partitionBy(gs: _*))
    val steps = perT
      .withColumn("at_risk", total - before)
      .withColumn("factor",
        s9((col("at_risk") - col("d")).cast("double") / col("at_risk")))
    val collected = steps
      .groupBy(gs: _*)
      .agg(sort_array(collect_list(struct(
        col("t"), col("at_risk"), col("d"), col("c"), col("factor")))).as("__steps"))
    val survArr = aggregate(
      transform(col("__steps"), x => x.getField("factor")),
      struct(lit(1.0).as("p"), array().cast("array<double>").as("out")),
      (acc, f) => struct(
        s9(acc.getField("p") * f).as("p"),
        concat(acc.getField("out"), array(s9(acc.getField("p") * f))).as("out")),
      acc => acc.getField("out"))
    collected
      .withColumn("__surv", survArr)
      .select(gs :+ col("__surv") :+ posexplode(col("__steps")): _*)
      .withColumn("survival", expr("element_at(__surv, pos + 1)"))
      .select(gs ++ Seq(col("col.t").as("t"), col("col.at_risk").as("at_risk"),
        col("col.d").as("d"), col("col.c").as("c"), col("survival")): _*)
  }

  /** Multi-touch conversion attribution per channel — first-touch,
    * last-touch and linear credit in one frame (the marketing-
    * analytics complement of [[funnel]]: the funnel prescribes a
    * step order, attribution asks which CHANNEL preceded the
    * conversions that actually happened). Each conversion event
    * credits the touch events of the same key inside
    * `[conv_ts − lookbackSeconds, conv_ts]`: 1 to the earliest
    * (first-touch), 1 to the latest (last-touch), and 1/n to each
    * of its n touches (linear). Conversions with NO in-window touch
    * drop (an organic conversion attributes to nothing); the
    * conversion event itself is not a touch.
    *
    * Scale shape: both sides filter to their event types BEFORE the
    * ONE hash equi-join on the key (the range bound rides as the
    * join's residual predicate — never a BNLJ pair scan, since the
    * key equality is the hash side); per-conversion ordering is a
    * window over conversion-sized partitions bounded by
    * touches-in-lookback; the final groupBy(channel) collapses to
    * |channels| rows with map-side partials. first/last/touch
    * counts stay exact integers; linear credit sums 1e-9-snapped
    * per-touch terms and snaps the sum (the PSI term discipline).
    * Ties on touch timestamp break by the touch event id, so
    * first/last are deterministic.
    */
  /** Time-to-convert statistics per channel — how long after the
    * FIRST in-lookback touch each conversion landed (the latency
    * companion to [[attribution]]'s credit split: attribution says
    * which channel, this says how fast). Per first-touch channel:
    * conversion counts and exact-integer-second latency mean/min/
    * max plus the exact type-7 median over the distinct-latency
    * frame (the N16 discipline — aggregator memory is distinct
    * latencies, never conversions).
    *
    * Scale shape: the same ONE user-keyed hash join as attribution
    * + a per-conversion min_by for the first touch (no window
    * sort), then ONE groupBy(channel) + the distinct-value median
    * machinery. Latencies stay exact integer seconds until the
    * snapped mean.
    */
  def timeToConvert(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      eventIdCol: String,
      typeCol: String,
      convType: String,
      touchTypes: Seq[String],
      lookbackSeconds: Long
  ): DataFrame = {
    require(lookbackSeconds > 0, s"lookbackSeconds must be positive, got $lookbackSeconds")
    require(touchTypes.nonEmpty, "need at least one touch type")
    val s9 = (c: Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val base = events.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
    val convs = base.filter(col(typeCol) === convType)
      .select(col(keyCol).as("__k"), col(tsCol).as("__cts"), col(eventIdCol).as("__cid"))
    val touches = base.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(keyCol).as("__k"), col(tsCol).as("__tts"),
        col(eventIdCol).as("__tid"), col(typeCol).as("channel"))
    val firsts = convs.join(touches, Seq("__k"))
      .filter(col("__tts") <= col("__cts") &&
        col("__tts") >= col("__cts") - expr(s"INTERVAL $lookbackSeconds SECONDS"))
      .groupBy(col("__cid"))
      .agg(
        min_by(col("channel"), struct(col("__tts"), col("__tid"))).as("channel"),
        (max(expr("unix_micros(__cts)")) -
          min_by(expr("unix_micros(__tts)"), struct(col("__tts"), col("__tid"))))
          .as("__lat_us"))
      .withColumn("latency_s", expr("__lat_us div 1000000"))
    val agg = firsts.groupBy(col("channel"))
      .agg(count(lit(1)).as("convs"),
        s9(avg(col("latency_s"))).as("mean_s"),
        min(col("latency_s")).as("min_s"),
        max(col("latency_s")).as("max_s"))
    val med = StatsOps.groupQuantileExact(firsts, Seq("channel"), "latency_s", 0.5)
      .select(col("channel"), col("q_value").as("median_s"))
    agg.join(med, Seq("channel"), "left")
  }

  def attribution(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      eventIdCol: String,
      typeCol: String,
      convType: String,
      touchTypes: Seq[String],
      lookbackSeconds: Long
  ): DataFrame = {
    require(lookbackSeconds > 0, s"lookbackSeconds must be positive, got $lookbackSeconds")
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(convType), "conversion type cannot also be a touch type")
    val s9 = (c: Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val base = events.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
    val convs = base.filter(col(typeCol) === convType)
      .select(col(keyCol).as("__k"), col(tsCol).as("__cts"), col(eventIdCol).as("__cid"))
    val touches = base.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(keyCol).as("__k"), col(tsCol).as("__tts"),
        col(eventIdCol).as("__tid"), col(typeCol).as("channel"))
    val joined = convs.join(touches, Seq("__k"))
      .filter(col("__tts") <= col("__cts") &&
        col("__tts") >= col("__cts") - expr(s"INTERVAL $lookbackSeconds SECONDS"))
    val w = Window.partitionBy(col("__cid"))
    val wAsc = w.orderBy(col("__tts").asc, col("__tid").asc)
    val wDesc = w.orderBy(col("__tts").desc, col("__tid").desc)
    joined
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__first", row_number().over(wAsc))
      .withColumn("__last", row_number().over(wDesc))
      .groupBy(col("channel"))
      .agg(
        countDistinct(col("__cid")).as("convs_touched"),
        count(lit(1)).as("touches"),
        sum(when(col("__first") === 1, 1L).otherwise(0L)).as("first_touch"),
        sum(when(col("__last") === 1, 1L).otherwise(0L)).as("last_touch"),
        s9(sum(s9(lit(1.0) / col("__n").cast("double")))).as("linear_credit"))
  }
}
