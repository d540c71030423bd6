package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the Deequ-style assertion
  * layer a production pipeline gates on before training or
  * publishing (reference scope note: biosets validates schemas at
  * load time; at 100 TB the CONTENT constraints need distributed
  * verification with violation counts, not a driver-side scan).
  *
  * Scale design: every row-level check (not-null, range, regex,
  * accepted set) compiles to a conditional counter inside ONE
  * map-side-combinable aggregation over a single data pass —
  * adding checks adds columns to the agg, never passes. Uniqueness
  * is the one check that genuinely needs its own shuffle (a
  * groupBy on the checked key); each Unique check declares that
  * cost explicitly. The report frame is |checks| rows.
  */
object QualityOps {

  sealed trait Check { def name: String }
  /** `col` must not be NULL. */
  final case class NotNull(column: String) extends Check {
    def name = s"not_null($column)"
  }
  /** `col` must lie in [lo, hi] (NULLs don't violate — compose
    * with [[NotNull]] to forbid them). */
  final case class InRange(column: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range($column,$lo,$hi)"
  }
  /** `col` must fully match `regex` (RE2-portable patterns
    * recommended — the oracle replays them in another engine). */
  final case class Matches(column: String, regex: String) extends Check {
    def name = s"matches($column)"
  }
  /** `col` must be one of `allowed` (NULLs don't violate). */
  final case class InSet(column: String, allowed: Seq[String]) extends Check {
    def name = s"in_set($column)"
  }
  /** The column tuple must be unique across the frame. Violations
    * = rows beyond the first per duplicated tuple (NULL-keyed rows
    * group together, SQL-DISTINCT-style). */
  final case class Unique(columns: Seq[String]) extends Check {
    def name = s"unique(${columns.mkString(",")})"
  }

  private def violation(c: Check): Column = c match {
    case NotNull(col0) => col(col0).isNull
    case InRange(col0, lo, hi) =>
      col(col0).isNotNull && (col(col0).cast("double") < lo || col(col0).cast("double") > hi)
    case Matches(col0, re) =>
      col(col0).isNotNull && !col(col0).rlike("^(" + re + ")$")
    case InSet(col0, allowed) =>
      col(col0).isNotNull && !col(col0).isin(allowed: _*)
    case _: Unique => throw new IllegalArgumentException("unique handled separately")
  }

  /** Run `checks` and return one report row per check:
    * (check, n_rows, violations, violation_rate, passed) — passed
    * iff violation_rate ≤ `maxViolationRate` (default exact-zero
    * tolerance). violation_rate snaps to the 1e-9 grid.
    */
  def check(
      df: DataFrame,
      checks: Seq[Check],
      maxViolationRate: Double = 0.0
  ): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    require(maxViolationRate >= 0, s"maxViolationRate must be >= 0, got $maxViolationRate")
    val snap9 = (c: Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val spark = df.sparkSession
    import spark.implicits._
    val rowChecks = checks.filter(!_.isInstanceOf[Unique])
    val uniqueChecks = checks.collect { case u: Unique => u }
    val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (rowChecks.nonEmpty) {
      // one pass, one conditional counter per check
      val agg = df.agg(
        count(lit(1)).as("__n"),
        rowChecks.zipWithIndex.map { case (c, i) =>
          sum(when(violation(c), 1L).otherwise(0L)).as(s"__v_$i") }: _*)
      frames += rowChecks.zipWithIndex.map { case (c, i) =>
        // empty-frame aggregation yields NULL sums next to count 0 —
        // a zero-row dataset has zero violations, not unknown ones
        agg.select(lit(c.name).as("check"), col("__n").as("n_rows"),
          coalesce(col(s"__v_$i"), lit(0L)).as("violations")) }.reduce(_ unionByName _)
    }
    uniqueChecks.foreach { u =>
      // the one check that needs its own shuffle: rows beyond the
      // first per duplicated tuple
      val g = df.groupBy(u.columns.map(col): _*).agg(count(lit(1)).as("__c"))
      frames += g.agg(
        sum(col("__c")).as("n_rows"),
        sum(col("__c") - 1).as("violations"))
        .select(lit(u.name).as("check"),
          coalesce(col("n_rows"), lit(0L)).as("n_rows"),
          coalesce(col("violations"), lit(0L)).as("violations"))
    }
    frames.reduce(_ unionByName _)
      .withColumn("violation_rate", when(col("n_rows") > 0,
        snap9(col("violations").cast("double") / col("n_rows"))).otherwise(lit(0.0)))
      .withColumn("passed",
        (col("violation_rate") <= lit(maxViolationRate)).cast("int"))
  }

  /** STREAMING quality monitor — row-level checks as per-event-time-
    * window violation counters (the continuous twin of [[check]]:
    * the batch report gates a finished dataset, this watches an
    * ingest stream and emits per-window violation rates for
    * alerting). Every check is a conditional counter inside ONE
    * windowed streaming aggregation — per-(window) state is
    * 1+|checks| longs regardless of event volume, and the emitted
    * counters stay SUM-mergeable downstream. [[Unique]] needs
    * cross-row state and is rejected here (dedup-family operators
    * cover streaming uniqueness). Works identically on a batch
    * frame — the batch run IS the oracle twin.
    *
    * @return (window_start, check, n_rows, violations,
    *         violation_rate) — long form, one row per (window,
    *         check)
    */
  def checkWindowed(
      events: DataFrame,
      tsCol: String,
      checks: Seq[Check],
      windowLen: String,
      watermark: String = "2 hours"
  ): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    require(!checks.exists(_.isInstanceOf[Unique]),
      "Unique needs cross-row state — not available in the windowed monitor")
    val snap9 = (c: Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val src = if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    val agg = src
      .groupBy(window(col(tsCol), windowLen).as("w"))
      .agg(
        count(lit(1)).as("__n"),
        checks.zipWithIndex.map { case (c, i) =>
          sum(when(violation(c), 1L).otherwise(0L)).as(s"__v_$i") }: _*)
    // long form via ONE stateless stack over the single streaming
    // aggregation (a per-check union would plan N copies of the
    // state store)
    val stackExpr = s"stack(${checks.size}, " + checks.zipWithIndex.map {
      case (c, i) => s"'${c.name.replace("'", "''")}', __v_$i"
    }.mkString(", ") + ") as (check, violations)"
    agg.select(col("w.start").as("window_start"), col("__n").as("n_rows"),
        expr(stackExpr))
      .withColumn("violation_rate", when(col("n_rows") > 0,
        snap9(col("violations").cast("double") / col("n_rows"))).otherwise(lit(0.0)))
      .select(col("window_start"), col("check"), col("n_rows"),
        col("violations"), col("violation_rate"))
  }
}
