package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches — the fixed-state answer to
  * "how many distinct X" at 100 TB, where exact `count(distinct)`
  * shuffles every distinct value and a sketch shuffles at most
  * `m = 2^p` register rows per group (Flajolet et al. 2007,
  * HyperLogLog — public algorithm).
  *
  * Design for oracle-exactness: the hash is `md5` (identical
  * function in every engine), the register index is the first
  * `p/4` hex chars, the rank is the hex-digit leading-zero count
  * of the next 13 chars (52 bits), and the harmonic sum
  * `Σ 2^{-M_j}` is computed as the EXACT integer `Σ 2^{53-M_j}`
  * in decimal arithmetic before the one double division — so the
  * estimate is a deterministic function of the input SET, bit-for-
  * bit reproducible across engines and partitionings (a float
  * harmonic sum would be summation-order-dependent). Everything is
  * built-in column arithmetic — codegen'd, no UDF.
  *
  * Scale shape: ONE map-side-combinable `groupBy(group, idx).max`
  * (partial max collapses each partition to ≤ m rows per group
  * before the shuffle), then a group-sized final aggregate.
  * Registers are mergeable by `max` — union two register frames and
  * re-`max` to combine sketches across days/shards without touching
  * raw data.
  */
object SketchOps {

  private val HexDigits = "0123456789abcdef"
  private val TwoPow53 = 9007199254740992d // 2^53, exact in double

  /** value of one hex char (both engines: instr(haystack, c) - 1) */
  private def hexVal(c: Column): Column = instr(lit(HexDigits), c) - 1

  /** HLL register frame: one row per (group, register) hit, with the
    * max rank. `p` must be a multiple of 4 (hex alignment) in 4..16.
    */
  /** (register index, rank) column pair for one value column —
    * shared by the batch and windowed-streaming register builders.
    */
  private def idxAndRank(valueCol: String, p: Int): (Column, Column) = {
    require(p >= 4 && p <= 16 && p % 4 == 0, s"p must be in {4,8,12,16}, got $p")
    val nIdxChars = p / 4
    val h = md5(col(valueCol).cast("string"))
    // register index from the first p bits (p/4 hex chars)
    val idx = (1 to nIdxChars)
      .map(i => hexVal(substring(h, i, 1)))
      .reduce((a, b) => a * 16 + b)
    // rank = leading-zero count of the next 52 bits, + 1
    val rest = substring(h, nIdxChars + 1, 13)
    val z = length(regexp_extract(rest, "^(0*)", 1)) // leading zero hex chars
    val firstDigit = hexVal(substring(rest, z + 1, lit(1)))
    val lz4 = when(firstDigit >= 8, 0)
      .when(firstDigit >= 4, 1)
      .when(firstDigit >= 2, 2)
      .otherwise(3) // digit 1 (0 impossible: it's the first NON-zero)
    val rank = when(z === 13, lit(53)).otherwise(z * 4 + lz4 + 1)
    (idx, rank)
  }

  def hllRegisters(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      p: Int = 12
  ): DataFrame = {
    val (idx, rank) = idxAndRank(valueCol, p)
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ idx.as("reg_idx") :+ rank.as("rank"): _*)
      .groupBy(groupCols.map(col) :+ col("reg_idx"): _*)
      .agg(max(col("rank")).as("max_rank"))
  }

  /** STREAMING register builder: per-(event-time window, group)
    * register maxes as a single streaming aggregation — the only
    * agg shape append mode allows, and exactly the state HLL wants:
    * per (window, group) the state is ≤ m register rows no matter
    * how many events the window sees, and `max` is idempotent so
    * late in-watermark arrivals fold in for free. The harmonic-sum
    * estimate is a batch post-pass over the emitted registers
    * ([[hllEstimateFromRegisters]]) — sketches leave the stream
    * mergeable, so downstream can also re-`max` across days or
    * shards before estimating. Works identically on a batch frame
    * (the oracle twin).
    */
  def hllRegistersWindowed(
      events: DataFrame,
      tsCol: String,
      groupCols: Seq[String],
      valueCol: String,
      windowLen: String,
      watermark: String = "2 hours",
      p: Int = 12
  ): DataFrame = {
    val (idx, rank) = idxAndRank(valueCol, p)
    val src = if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    src.filter(col(valueCol).isNotNull)
      .groupBy(window(col(tsCol), windowLen).as("w") +:
        groupCols.map(col) :+ idx.as("reg_idx"): _*)
      .agg(max(rank).as("max_rank"))
      .select(col("w.start").as("window_start") +:
        groupCols.map(col) :+ col("reg_idx") :+ col("max_rank"): _*)
  }

  /** STREAMING count-min sketch: per-(event-time window, group)
    * cell sums as one streaming aggregation — the frequency twin of
    * [[hllRegistersWindowed]]. Per (window, group) the state is
    * ≤ d·w counter rows no matter how many events land; cell counts
    * accumulate in state until the watermark closes the window, and
    * the emitted cells stay SUM-mergeable downstream (union windows
    * across days/shards, re-sum, then estimate with
    * [[cmsEstimate]]-style min-over-rows). Works identically on a
    * batch frame (the oracle twin).
    *
    * @return (window_start, groupCols*, row_j, bucket, cnt)
    */
  def cmsSketchWindowed(
      events: DataFrame,
      tsCol: String,
      groupCols: Seq[String],
      valueCol: String,
      windowLen: String,
      watermark: String = "2 hours",
      d: Int = 4,
      w: Int = 2048
  ): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    src.filter(col(valueCol).isNotNull)
      .select(col(tsCol) +: groupCols.map(col) :+
        explode(array(cmsPairs(valueCol, d, w): _*)).as("rb"): _*)
      .groupBy(window(col(tsCol), windowLen).as("w") +:
        groupCols.map(col) :+ col("rb.row_j").as("row_j") :+ col("rb.bucket").as("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start") +:
        groupCols.map(col) :+ col("row_j") :+ col("bucket") :+ col("cnt"): _*)
  }

  /** Per-group HLL cardinality estimate with the standard
    * small-range (linear-counting) correction. Output:
    * groupCols + (hll_est, registers_hit), estimate on the 1e-6
    * grid.
    */
  def hllCardinality(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      p: Int = 12
  ): DataFrame =
    hllEstimateFromRegisters(hllRegisters(df, groupCols, valueCol, p), groupCols, p)

  /** (row_j, bucket) struct columns for one value — the d hash rows
    * of a count-min sketch. Bucket j is the first 16 bits of
    * `md5("j:" || value)` mod `w` — identical arithmetic in every
    * engine, same oracle-exactness design as the HLL registers.
    */
  private def cmsPairs(valueCol: String, d: Int, w: Int): Seq[Column] = {
    require(d >= 1 && d <= 16, s"need 1 <= d <= 16 hash rows, got $d")
    require(w >= 2 && w <= 65536, s"need 2 <= w <= 65536 buckets, got $w")
    (0 until d).map { j =>
      val h = md5(concat(lit(s"$j:"), col(valueCol).cast("string")))
      val v = (1 to 4).map(i => hexVal(substring(h, i, 1))).reduce((a, b) => a * 16 + b)
      struct(lit(j).as("row_j"), (v % w).as("bucket"))
    }
  }

  /** Count-min sketch build (Cormode–Muthukrishnan 2005): per group,
    * a d×w grid of non-negative counters; item frequency estimates
    * read `min_j grid[j][h_j(x)]` — always an OVER-estimate, with the
    * classic ε=e/w, δ=e^{−d} error bound. The frequency-sketch
    * complement of [[hllRegisters]] (cardinality) and the
    * SpaceSaving top-k aggregate (heavy hitters): CMS answers point
    * frequency for ANY item after one pass, in fixed space.
    *
    * Shape: ONE map-side-combinable `groupBy(group, row_j, bucket)`
    * — each input partition collapses to ≤ d·w rows per group before
    * the shuffle, and the sketch frame is ≤ groups·d·w rows total
    * regardless of item cardinality. Sketches MERGE by summing
    * matching cells (union two frames + re-sum), so per-day/shard
    * sketches roll up without touching raw data. All integer
    * arithmetic — deterministic, hash-oracle-able.
    *
    * @return (groupCols*, row_j, bucket, cnt)
    */
  def cmsSketch(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      d: Int = 4,
      w: Int = 2048
  ): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+
        explode(array(cmsPairs(valueCol, d, w): _*)).as("rb"): _*)
      .select(groupCols.map(col) :+ col("rb.row_j").as("row_j") :+
        col("rb.bucket").as("bucket"): _*)
      .groupBy(groupCols.map(col) :+ col("row_j") :+ col("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Point-frequency estimates for `probeCol` items against a
    * [[cmsSketch]] frame: explode each probe into its d cells, LEFT
    * join the sketch (absent cell = exact 0), take the row-wise min.
    * The probe side is typically tiny → the join broadcasts; the
    * sketch frame is ≤ groups·d·w rows by construction.
    *
    * @return probe frame columns + `cms_est` (≥ the true count,
    *         with P[est > true + ε·N] ≤ δ)
    */
  def cmsEstimate(
      sketch: DataFrame,
      groupCols: Seq[String],
      probes: DataFrame,
      probeCol: String,
      d: Int = 4,
      w: Int = 2048
  ): DataFrame = {
    val exploded = probes
      .select(probes.columns.map(col) :+
        explode(array(cmsPairs(probeCol, d, w): _*)).as("rb"): _*)
      .select(probes.columns.map(col) :+ col("rb.row_j").as("row_j") :+
        col("rb.bucket").as("bucket"): _*)
    exploded
      .join(sketch, groupCols ++ Seq("row_j", "bucket"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** Collapse a register frame (groupCols + reg_idx + max_rank —
    * from [[hllRegisters]], [[hllRegistersWindowed]], or a `max`-
    * merge of several of them) into the per-group estimate.
    * Output: groupCols + (hll_est, registers_hit), 1e-6 grid.
    */
  def hllEstimateFromRegisters(
      regs: DataFrame,
      groupCols: Seq[String],
      p: Int = 12
  ): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val m = 1 << p
    val alpha = p match { // Flajolet 2007 bias constants
      case 4 => 0.673
      case 8 => 0.7182725932495458 // 0.7213/(1+1.079/256)
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    // EXACT harmonic numerator: Σ 2^(53 - M_j) over hit registers,
    // in decimal so partial-agg order can't change the rounding;
    // unhit registers contribute 2^53 each (M = 0).
    val agg = regs
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("registers_hit"),
        sum(pow(lit(2.0), lit(53) - col("max_rank")).cast("decimal(38,0)")).as("__s"))
    val zeros = (lit(m).cast("decimal(38,0)") - col("registers_hit").cast("decimal(38,0)"))
    val sFull = (col("__s") + zeros * lit(TwoPow53).cast("decimal(38,0)")).cast("double")
    val raw = lit(alpha * m.toDouble * m.toDouble * TwoPow53) / sFull
    val v = lit(m) - col("registers_hit") // empty registers
    val est = when(raw <= lit(2.5 * m) && v > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double")))
      .otherwise(raw)
    agg.select(
      groupCols.map(col) :+
        (floor(est * 1e6 + lit(0.5)) / 1e6).as("hll_est") :+
        col("registers_hit"): _*)
  }

  /** 52-bit integer hash of a value: the first 13 hex chars of its
    * md5, folded digit-by-digit — the same arithmetic any engine
    * replays, and small enough to be exact in a double.
    *
    * The md5 binds to a lambda variable through a 1-element
    * transform: Catalyst expression trees DUPLICATE a subexpression
    * per reference, so inlining `md5(...)` into the 13-digit fold
    * ran the digest 13× per row (the DSIR-kernel lesson, r11).
    */
  private def h52(valueCol: String): Column =
    element_at(
      transform(array(md5(col(valueCol).cast("string"))),
        h => (1 to 13)
          .map(i => hexVal(substring(h, i, 1)).cast("long"))
          .reduce((a, b) => a * 16 + b)),
      1)

  /** KMV (k-minimum-values, Bar-Yossef 2002) bottom-k distinct
    * sketch — the third leg of the sketch family: C19 HLL answers
    * "how many distinct", C17/C18 answer "which are frequent", KMV
    * answers both a distinct ESTIMATE and, because the kept hashes
    * are a uniform SAMPLE of the distinct values, '''set-overlap
    * estimates between groups''' (HLL registers can't intersect;
    * bottom-k sets can — [[kmvJaccard]]).
    *
    * Shuffle shape: one map-side-combinable `groupBy(group, h)`
    * dedup, then the bounded-buffer [[graft.functions.TopKAggregate]]
    * keeps the k SMALLEST hashes per group (score = −h), so the
    * second exchange carries ≤ k entries per map task per group —
    * never the distinct-value frame itself. All arithmetic is
    * integer; the sketch is deterministic for any engine.
    *
    * @return (groupCols*, h, rn) — the ≤ k smallest distinct
    *         52-bit hashes per group, rn = 1-based ascending rank
    */
  def kmvSketch(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int = 256
  ): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val gs = groupCols.map(col)
    val distinctH = df
      .filter(col(valueCol).isNotNull)
      .select(gs :+ h52(valueCol).as("__h"): _*)
      .distinct()
    distinctH
      .groupBy(gs: _*)
      .agg(graft.functions.TopKAggregate
        .topK(-col("__h").cast("double"), col("__h"), k).as("__tk"))
      .select(gs :+ posexplode(col("__tk")): _*)
      .select(gs :+ col("col.id").as("h") :+ (col("pos") + 1).cast("int").as("rn"): _*)
  }

  /** Distinct-count estimate from a [[kmvSketch]] frame: exact when
    * the group kept fewer than k hashes (the sketch IS the distinct
    * set), else the classic `(k−1) / u_k` with `u_k` the k-th
    * smallest hash as a fraction of 2^52. 1e-6 grid.
    */
  def kmvEstimate(sketch: DataFrame, groupCols: Seq[String], k: Int = 256): DataFrame = {
    val agg = sketch.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("__hk"))
    val uk = col("__hk").cast("double") / lit(TwoPow53 / 2.0) // 2^52
    val est = when(col("n_kept") < k, col("n_kept").cast("double"))
      .otherwise(lit((k - 1).toDouble) / uk)
    agg.select(
      groupCols.map(col) :+
        (floor(est * 1e6 + lit(0.5)) / 1e6).as("kmv_est") :+
        col("n_kept"): _*)
  }

  /** Pairwise Jaccard estimates between every two groups of a
    * [[kmvSketch]] frame: merge the two bottom-k sets, keep the k
    * smallest of the union (a valid KMV sketch of A∪B), and count
    * how many of those k appear in BOTH sides —
    * `J ≈ |K(A∪B) ∩ K(A) ∩ K(B)| / |K(A∪B)|`. Runs entirely on the
    * collected per-group arrays (≤ k each, groups are a bounded
    * dimension by contract) with codegen'd array intrinsics — the
    * raw value frames never meet.
    *
    * @param groupCol single grouping column (pairs are emitted with
    *                 `g_a < g_b` on its values)
    * @return (g_a, g_b, jaccard_est, union_kept) on the 1e-6 grid
    */
  def kmvJaccard(sketch: DataFrame, groupCol: String, k: Int = 256): DataFrame = {
    val perGroup = sketch.groupBy(col(groupCol))
      .agg(sort_array(collect_list(col("h"))).as("hs"))
    val a = perGroup.select(col(groupCol).as("g_a"), col("hs").as("__ha"))
    val b = perGroup.select(col(groupCol).as("g_b"), col("hs").as("__hb"))
    val merged = slice(array_sort(array_union(col("__ha"), col("__hb"))), 1, k)
    val inter = size(array_intersect(array_intersect(merged, col("__ha")), col("__hb")))
    a.join(b, col("g_a") < col("g_b"))
      .withColumn("__m", merged)
      .select(col("g_a"), col("g_b"),
        (floor(inter.cast("double") / size(col("__m")).cast("double") * 1e6 + lit(0.5)) / 1e6)
          .as("jaccard_est"),
        size(col("__m")).as("union_kept"))
  }

  /** STREAMING quantile-bin sketch: per-(event-time window, group)
    * counts on a FIXED [lo, hi) equal-width grid (the
    * [[graft.operators.StatsOps.histogram]] clamp-to-edge binning —
    * streaming cannot take the two-pass per-group min/max of
    * `approxQuantilesBinned`, so the boundaries are a declared
    * contract like PSI's). The quantile member of the windowed-sketch
    * trio ([[hllRegistersWindowed]] = distinct,
    * [[cmsSketchWindowed]] = frequency): one streaming aggregation,
    * ≤ `bins` counter rows per (window, group) no matter how many
    * events land, cells SUM-mergeable downstream (union across
    * days/shards, re-sum, then read the CDF with
    * [[quantilesFromBins]]). Works identically on a batch frame (the
    * oracle twin).
    *
    * @return (window_start, groupCols*, bin, cnt)
    */
  def quantileBinsWindowed(
      events: DataFrame,
      tsCol: String,
      groupCols: Seq[String],
      valueCol: String,
      windowLen: String,
      lo: Double,
      hi: Double,
      bins: Int,
      watermark: String = "2 hours"
  ): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val width = (hi - lo) / bins
    val src = if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    src.filter(col(valueCol).isNotNull)
      .select(col(tsCol) +: groupCols.map(col) :+
        least(greatest(floor((col(valueCol) - lit(lo)) / lit(width)), lit(0)),
          lit(bins - 1)).cast("long").as("bin"): _*)
      .groupBy(window(col(tsCol), windowLen).as("w") +:
        groupCols.map(col) :+ col("bin"): _*)
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start") +:
        groupCols.map(col) :+ col("bin") :+ col("cnt"): _*)
  }

  /** Quantile estimates from a [[quantileBinsWindowed]]-shaped cell
    * frame (keys = whatever identifies one sketch — window_start +
    * groups, or just groups for a batch build): per key, the CDF
    * crossing bin of ⌈p·n⌉ with linear interpolation inside it —
    * the same read as `approxQuantilesBinned`, against the declared
    * [lo, hi, bins] grid. Window arithmetic runs over the ≤
    * `bins`-row cell frame, never the data; counts/ranks exact
    * integers, the interpolation on the 1e-9 grid. Estimates are
    * within one bin width for in-range data; mass clamped into the
    * edge bins reads back as edge-bin positions (the declared-grid
    * trade).
    *
    * @return one row per (key, prob): (keyCols*, p, n, quantile)
    */
  def quantilesFromBins(
      cells: DataFrame,
      keyCols: Seq[String],
      lo: Double,
      hi: Double,
      bins: Int,
      probs: Seq[Double]
  ): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      s"probs must be in (0, 1], got $probs")
    val ks = keyCols.map(col)
    val ordered = Window.partitionBy(ks: _*).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(ks: _*)
    val width = (hi - lo) / bins
    val cdf = cells
      .withColumn("cum", sum(col("cnt")).over(ordered))
      .withColumn("n", sum(col("cnt")).over(whole))
    val rank = greatest(ceil(col("p") * col("n")), lit(1L)).cast("long")
    val frac = (rank - (col("cum") - col("cnt"))).cast("double") / col("cnt")
    cdf
      .withColumn("p", explode(array(probs.map(p => lit(p)): _*)))
      .filter(col("cum") >= rank && (col("cum") - col("cnt")) < rank)
      .select(ks ++ Seq(col("p"), col("n"),
        (floor((lit(lo) + lit(width) * (col("bin").cast("double") + frac)) * lit(1e9) +
          lit(0.5)) / lit(1e9)).as("quantile")): _*)
  }

  /** Rolling distinct-entity estimates per day via merged HLL
    * registers — the SKETCH path for DAU/WAU/MAU (the exact twin is
    * [[graft.operators.SequenceOps.activeUsers]]): the raw log
    * collapses ONCE to daily registers (≤ days·2^p rows — at 100 TB
    * this is the difference between shuffling every user-day and
    * shuffling 4096 rows per day), and each trailing window's
    * registers are the register-wise MAX over its days — HLL's
    * merge is exactly the union the rolling window needs, with
    * NO second pass over the data. Same estimate machinery as C19,
    * so the result is a deterministic function of the input set and
    * fully oracle-able; error is the standard 1.04/√m.
    *
    * Shape: one groupBy(day, register) over the log, then a fixed
    * max(windows) fan-out of the tiny register frame + one
    * groupBy(day, register) per window + the per-day estimate.
    * Report days clamp to observed days (broadcast semi-join on the
    * distinct-day frame), mirroring the exact operator.
    */
  def hllRollingDistinct(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      windows: Seq[Int] = Seq(1, 7, 28),
      p: Int = 12
  ): DataFrame = {
    require(windows.nonEmpty && windows.forall(_ >= 1), s"windows must be >= 1, got $windows")
    val ws = windows.distinct.sorted
    val maxW = ws.last
    val daily = hllRegisters(
      df.filter(col(tsCol).isNotNull)
        .withColumn("__day", to_date(col(tsCol))),
      Seq("__day"), valueCol, p)
    val obs = daily.select(col("__day").as("day")).distinct()
    val fan = daily
      .select(col("reg_idx"), col("max_rank"), col("__day"),
        explode(sequence(lit(0), lit(maxW - 1))).as("__o"))
      .select(date_add(col("__day"), col("__o")).as("day"),
        col("reg_idx"), col("max_rank"), col("__o"))
      .join(broadcast(obs), Seq("day"), "left_semi")
    ws.map { w =>
      val regs = fan.filter(col("__o") < w)
        .groupBy(col("day"), col("reg_idx"))
        .agg(max(col("max_rank")).as("max_rank"))
      hllEstimateFromRegisters(regs, Seq("day"), p)
        .select(col("day"), col("hll_est").as(s"active_$w"))
    }.reduce((a, b) => a.join(b, Seq("day")))
  }

  // ---- Mergeable hash-sample quantile sketch ------------------------------

  /** Mergeable QUANTILE sketch with NO declared range — the
    * heavy-tailed/unknown-range complement to the fixed-grid binned
    * CDF ([[graft.operators.StatsOps.approxQuantilesBinned]] needs a
    * min/max pass; [[quantileBinsWindowed]] needs declared [lo, hi)).
    * Where a t-digest/KLL keeps adaptive centroids/compactors whose
    * construction is ORDER-DEPENDENT (the sketch depends on the
    * partitioning, so no cross-engine oracle can replay it), this
    * keeps the k rows with the smallest md5-derived 52-bit rank — a
    * uniform row sample whose selection is a pure function of the
    * data (the C19/KMV md5 trick applied to rank-error sketching):
    * deterministic, partition-invariant, and a SEMILATTICE (bottom-k
    * of a union = bottom-k of bottom-k's), so shard sketches merge
    * exactly and the merged sketch is bit-identical to the global
    * build. Rank error is the uniform-sampling bound
    * O(sqrt(p(1-p)/k)) — k=4096 gives ~0.8% worst-case rank error,
    * 64 KB per group.
    *
    * Scale shape: ONE map-side-combinable groupBy — the
    * [[graft.functions.QuantileSampleAggregate]] buffer caps every
    * partial at k entries, so the exchange carries ≤ groups·k rows
    * per map task and nothing is globally sorted. No window, no
    * driver data.
    *
    * @param idCol row-unique column (ids, not values — duplicates of
    *              a value must each be sampleable); rank =
    *              fold(md5(cast(id as string)))[52 bits]
    * @return (groupCols*, qs: array<struct<r,v>> sorted by (r,v),
    *         n: exact row count)
    */
  def quantileSampleSketch(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      valueCol: String,
      k: Int = 1024
  ): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val gs = groupCols.map(col)
    df.filter(col(valueCol).isNotNull)
      .select(gs :+ h52(idCol).as("__r") :+ col(valueCol).cast("double").as("__v"): _*)
      .groupBy(gs: _*)
      .agg(
        graft.functions.QuantileSampleAggregate
          .bottomKSample(col("__r"), col("__v"), k).as("qs"),
        count(lit(1)).as("n"))
  }

  /** Merge shard sketches ([[quantileSampleSketch]] frames keyed by
    * group + any shard column upstream) back to one sketch per
    * group: explode the sample entries and re-run the same bounded
    * bottom-k aggregate the build uses (k-entry buffer, ties by
    * value), summing the exact counts once per shard row. Because
    * bottom-k is a semilattice the result is IDENTICAL to a global
    * single-pass build — pinned by the oracle, which computes the
    * global bottom-k directly.
    *
    * Deliberately NOT `collect_list` + flatten + sort + slice: that
    * holds every shard's full array in the aggregation buffer —
    * unbounded per-group state on the ObjectHashAggregate hash path
    * the session keeps hot for bounded aggregates (GraftSession
    * fallbackThreshold note). The bounded aggregate caps every
    * partial at k entries, so per-group memory is k·16 B no matter
    * how many shards merge.
    */
  def quantileSampleMerge(
      sketches: DataFrame,
      groupCols: Seq[String],
      k: Int = 1024
  ): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val gs = groupCols.map(col)
    sketches
      .select(gs :+ col("n") :+ posexplode_outer(col("qs")).as(Seq("__p", "__e")): _*)
      .groupBy(gs: _*)
      .agg(
        graft.functions.QuantileSampleAggregate
          .bottomKSample(col("__e.r"), col("__e.v"), k).as("qs"),
        // each shard row's exact count rides its first exploded
        // entry (or its single outer-null row when qs is empty)
        sum(when(col("__p").isNull || col("__p") === 0, col("n")).otherwise(0L)).as("n"))
  }

  /** Read quantile estimates off a [[quantileSampleSketch]] /
    * [[quantileSampleMerge]] frame: type-7 interpolation over the
    * sample values (sorted by value), one output row per (group,
    * prob), estimates snapped to the 1e-6 grid. Runs entirely on
    * the ≤ k-element arrays with codegen'd array intrinsics.
    *
    * @return (groupCols*, p, q, n_sample, n)
    */
  def quantileSampleQuantiles(
      sketch: DataFrame,
      groupCols: Seq[String],
      probs: Seq[Double]
  ): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probs must be in [0,1], got $probs")
    val gs = groupCols.map(col)
    val vs = array_sort(transform(col("qs"), x => x.getField("v")))
    sketch
      .select(gs :+ vs.as("__vs") :+ col("n"): _*)
      .withColumn("p", explode(typedlit(probs)))
      .withColumn("__vsz", size(col("__vs")))
      .select(
        gs :+ col("p") :+
          (floor({
            val vv = col("__vs"); val mm = col("__vsz")
            val hh = (mm - 1).cast("double") * col("p")
            val ll = floor(hh)
            val f = hh - ll
            val a = element_at(vv, ll.cast("int") + 1)
            val b = element_at(vv, least(ll.cast("int") + 2, mm))
            a + f * (b - a)
          } * 1e6 + lit(0.5)) / 1e6).as("q") :+
          col("__vsz").as("n_sample") :+ col("n"): _*)
  }

  /** STREAMING twin: per-(event-time window, group) hash-sample
    * quantile sketch — one streaming aggregation whose state is the
    * bounded k-entry buffer, ≤ k sample rows per (window, group)
    * regardless of event volume, mergeable downstream with
    * [[quantileSampleMerge]] (re-keyed by window) and read with
    * [[quantileSampleQuantiles]]. Unlike [[quantileBinsWindowed]]
    * this needs NO declared [lo, hi): the sample adapts to whatever
    * range the window's data has. Works identically on a batch
    * frame (the oracle twin).
    *
    * @return (window_start, groupCols*, qs, n)
    */
  def quantileSampleWindowed(
      events: DataFrame,
      tsCol: String,
      groupCols: Seq[String],
      idCol: String,
      valueCol: String,
      k: Int = 1024,
      windowLen: String = "1 day",
      watermark: String = "1 hour"
  ): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val src = if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    val gs = groupCols.map(col)
    src
      .filter(col(valueCol).isNotNull)
      .groupBy(window(col(tsCol), windowLen) +: gs: _*)
      .agg(
        graft.functions.QuantileSampleAggregate
          .bottomKSample(h52(idCol), col(valueCol).cast("double"), k).as("qs"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("window_start") +: gs :+ col("qs") :+ col("n"): _*)
  }

  /** Two-sample KS statistic straight FROM the sketches — drift
    * detection when the raw rows are gone or remote: ship per-shard
    * [[quantileSampleSketch]] frames (k·16 bytes per group), join
    * them, and read D = max |CDF_a − CDF_b| over the union of the
    * two samples. The sketch-native twin of
    * [[graft.operators.DriftOps.ksStatistic]]: exact over the
    * samples, a √(1/k)-resolution estimate of the population D.
    * All codegen'd array intrinsics on ≤ k-element arrays (O(k²)
    * per group, k ≤ a few thousand) — the raw value frames never
    * meet.
    *
    * @return (groupCols*, n_a, n_b, d_stat) — d on the 1e-9 grid
    */
  def quantileSampleKs(
      a: DataFrame,
      b: DataFrame,
      groupCols: Seq[String]
  ): DataFrame = {
    val gs = groupCols.map(col)
    val va = array_sort(transform(col("__qa"), x => x.getField("v")))
    val vb = array_sort(transform(col("__qb"), x => x.getField("v")))
    val joined = a.select(gs :+ col("qs").as("__qa") :+ col("n").as("n_a"): _*)
      .join(b.select(gs :+ col("qs").as("__qb") :+ col("n").as("n_b"): _*), groupCols)
      .withColumn("__va", va)
      .withColumn("__vb", vb)
    val pts = array_distinct(array_sort(concat(col("__va"), col("__vb"))))
    val d = array_max(transform(pts, p =>
      abs(size(filter(col("__va"), x => x <= p)).cast("double") / size(col("__va")).cast("double") -
        size(filter(col("__vb"), x => x <= p)).cast("double") / size(col("__vb")).cast("double"))))
    joined.select(gs :+ col("n_a") :+ col("n_b") :+
      (floor(d * lit(1e9) + lit(0.5)) / lit(1e9)).as("d_stat"): _*)
  }

}
