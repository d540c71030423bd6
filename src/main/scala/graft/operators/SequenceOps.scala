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
}
