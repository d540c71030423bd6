package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key interval coalescing (gaps-and-islands).
  *
  * The batch complement of the streaming session window and of
  * [[SequenceOps.stateRuns]]: where those merge POINT events by
  * time gap / equal state, this merges explicit `[start, end]`
  * INTERVALS by overlap — validity windows, maintenance windows,
  * span annotations, shipment coverage. Reference scope: interval/
  * span handling in biosets is per-row metadata
  * (`biosets/features/features.py` value types); a distributed
  * coalesce is the scale-path operation a 100 TB span table needs
  * (e.g. "total covered time per entity" without double-counting
  * overlaps).
  */
object IntervalOps {

  /** Merge overlapping or touching intervals per key.
    *
    * Two intervals of the same key merge iff the later one's start
    * is <= the running maximum end of all earlier intervals
    * (classic gaps-and-islands: order by (start, end), island
    * breaks where `start > max(end) over preceding`). Touching
    * intervals (`start == previous end`) MERGE — a half-open
    * reading `[s, e)` would instead pass `closedEnds = false`.
    *
    * Scale shape: ONE hash exchange on `keyCol` (the two window
    * functions and the final groupBy all share that partitioning —
    * Catalyst plans a single Exchange), per-key in-partition sort,
    * no driver state. Skewed keys sort within their partition; the
    * island scan is O(n log n) per key, never quadratic.
    *
    * Output: one row per merged island —
    * `key, merged_start, merged_end, n_intervals, covered`
    * where `covered = merged_end - merged_start` in the column's
    * native numeric domain (pass epoch seconds/days for time).
    *
    * Nulls: rows with a null key, start, or end are dropped (an
    * interval without both endpoints has no coalescing semantics);
    * inverted intervals (`end < start`) fail loudly rather than
    * silently producing negative coverage.
    *
    * Zero-length intervals under `closedEnds = false`: a point
    * interval `[s, s]` always breaks against its own duplicates
    * (`s >= pmax` holds even when `pmax == s`), so k identical
    * point intervals emit k separate `covered = 0` islands at the
    * same instant — the literal half-open reading (`[s, s)` is
    * empty, and empty sets don't coalesce). Under the default
    * closed reading they merge into one island with
    * `n_intervals = k`. Callers who want half-open semantics but
    * coalesced instants should dedupe exact-duplicate rows first.
    */
  def mergeIntervals(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String,
      closedEnds: Boolean = true
  ): DataFrame = {
    val reserved = Seq("__pmax", "__nf", "__island", "merged_start", "merged_end",
      "n_intervals", "covered")
    require(!df.columns.exists(reserved.contains),
      s"input columns collide with reserved/output names ${reserved.mkString(", ")}")
    val rows = df
      .filter(col(keyCol).isNotNull && col(startCol).isNotNull && col(endCol).isNotNull)
      .select(col(keyCol), col(startCol).as("__s"),
        // inverted intervals are data corruption, not a mergeable
        // shape — fail in the scan stage, row-addressed
        when(col(endCol) < col(startCol),
          raise_error(concat(lit(s"mergeIntervals: $endCol < $startCol at $keyCol="),
            col(keyCol).cast("string"))))
          .otherwise(col(endCol)).as("__e"))
    val ordered = Window.partitionBy(col(keyCol)).orderBy(col("__s"), col("__e"))
    val breakIf: (Column, Column) => Column =
      if (closedEnds) (s, pmax) => s > pmax else (s, pmax) => s >= pmax
    rows
      // running max end over STRICTLY earlier rows: null on the
      // island's first row, so the break flag is well-defined there
      .withColumn("__pmax",
        max(col("__e")).over(ordered.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__nf",
        when(col("__pmax").isNull || breakIf(col("__s"), col("__pmax")), 1L).otherwise(0L))
      .withColumn("__island",
        sum(col("__nf")).over(ordered.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__island"))
      .agg(
        min(col("__s")).as("merged_start"),
        max(col("__e")).as("merged_end"),
        count(lit(1)).as("n_intervals"))
      .withColumn("covered", col("merged_end") - col("merged_start"))
      .drop("__island")
  }

  /** Uncovered gaps between a key's merged islands — the inverse
    * read-out of [[mergeIntervals]] ("where is this entity NOT
    * covered"): one row per gap between consecutive islands, with
    * the gap's span in the same numeric domain. Keys with a single
    * island emit nothing (no interior gap; the open-ended before/
    * after spans have no defined bounds). Same single-exchange
    * shape — the lead window rides the island frame's key
    * partitioning.
    *
    * @return (key, gap_start, gap_end, gap) with
    *         `gap_start = island's merged_end`,
    *         `gap_end = next island's merged_start`
    */
  def gaps(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String
  ): DataFrame = {
    val islands = mergeIntervals(df, keyCol, startCol, endCol)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("merged_start"))
    islands
      .withColumn("__next", lead(col("merged_start"), 1).over(w))
      .filter(col("__next").isNotNull)
      .select(col(keyCol), col("merged_end").as("gap_start"),
        col("__next").as("gap_end"),
        (col("__next") - col("merged_end")).as("gap"))
  }

  /** Per-key coverage summary over the merged islands: how much of
    * the domain the key's intervals cover once overlaps collapse.
    * `n_islands`, `n_intervals`, `covered_total` (sum of island
    * lengths — overlap-free by construction), and the key's overall
    * span `[span_start, span_end]`.
    */
  def coverageStats(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String
  ): DataFrame =
    mergeIntervals(df, keyCol, startCol, endCol)
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_islands"),
        sum(col("n_intervals")).as("n_intervals"),
        sum(col("covered")).as("covered_total"),
        min(col("merged_start")).as("span_start"),
        max(col("merged_end")).as("span_end"))
}
