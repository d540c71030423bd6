package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-mixing operators for assembling training corpora: per-source
  * quotas, score-percentile gates, and fixed-budget sequence
  * packing. These sit downstream of the curation ops (quality,
  * dedup) and upstream of shard export — the "recipe" stage of an
  * LLM data pipeline.
  */
object MixOps {

  /** Cap rows per group — the data-mixing quota rule ("at most N
    * docs per domain/source"). Deterministic: rows rank by
    * `orderCols` inside each group and ranks above `quota` drop.
    * One hash shuffle on the group key; the rank is a window over
    * already-grouped partitions, not a global sort.
    */
  def perGroupQuota(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[String],
      quota: Int
  ): DataFrame = {
    require(quota > 0, "quota must be positive")
    val w = Window.partitionBy(groupCol).orderBy(orderCols.map(col): _*)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= quota)
      .drop("__rk")
  }

  /** Keep rows whose `scoreCol` is at or above the `q`-quantile of
    * the corpus — percentile-gated quality filtering ("top 20% by
    * quality score").
    *
    * The threshold comes from ONE aggregate (exact
    * linear-interpolation `percentile` by default — the same
    * definition as ANSI `quantile_cont`, which is what makes the
    * gate oracle-checkable; `exact=false` switches to
    * `approx_percentile` for corpora where the exact aggregate's
    * driver buffer matters) and broadcasts back as a 1-row cross
    * join — the fact side is scanned once and never shuffles.
    */
  def filterByQuantile(
      df: DataFrame,
      scoreCol: String,
      q: Double,
      exact: Boolean = true
  ): DataFrame = {
    require(q > 0.0 && q < 1.0, s"q must be in (0,1), got $q")
    // Column builders, not expr() string interpolation — a column
    // named "quality score" or "a.b" must resolve as a column
    val thr =
      if (exact) df.agg(percentile(col(scoreCol), lit(q)).as("__thr"))
      else df.agg(approx_percentile(col(scoreCol), lit(q), lit(10000)).cast("double").as("__thr"))
    df.crossJoin(broadcast(thr))
      .filter(col(scoreCol) >= col("__thr"))
      .drop("__thr")
  }

  /** Split long documents into overlapping token windows — the
    * chunking step upstream of [[packSequences]] ("cut docs to
    * ≤ maxTokens, then pack the pieces"). Chunk i covers tokens
    * [i·stride, i·stride + maxTokens) with stride = maxTokens −
    * overlap; a doc of n tokens yields 1 + ⌈max(n − maxTokens, 0) /
    * stride⌉ chunks, so every token is covered and consecutive
    * chunks share `overlap` tokens of context. Uses the same
    * tokenizer as the quality/dedup family; chunk text is the
    * space-joined token window (normalized whitespace — chunking is
    * a pre-training transform, not a reversible split).
    *
    * Pure scan-stage array expressions + one generator explode —
    * zero shuffle, and every formula is integer arithmetic replayable
    * in SQL (what makes it oracle-checkable).
    */
  def chunkDocs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxTokens: Int,
      overlap: Int = 0
  ): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens, "overlap must be in [0, maxTokens)")
    val stride = maxTokens - overlap
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    val n = size(toks)
    val k = floor((greatest(n - maxTokens, lit(0)) + lit(stride - 1)).cast("double") / stride).cast("int")
    val chunks = transform(sequence(lit(0), k), i => struct(
      i.cast("long").as("chunk_id"),
      concat_ws(" ", slice(toks, i * stride + 1, lit(maxTokens))).as("chunk_text")))
    df.select(col(idCol), inline(chunks))
  }

  /** Temperature-based source re-balancing — the mixture-weights
    * step of corpus assembly ("sample sources ∝ nᵅ", the multilingual
    * / multi-corpus sampling rule of mBERT/XLM-R/Gopher). Source s
    * with n_s docs gets target share p_s = n_sᵅ / Σ n_tᵅ; every doc
    * of s then survives an independent deterministic coin with rate
    * min(1, targetFraction·N·p_s / n_s). α = 1 reduces to uniform
    * targetFraction sampling; α < 1 up-weights small sources
    * (rates can saturate at 1 — the realized total then undershoots
    * targetFraction·N, the standard behavior of capped temperature
    * sampling).
    *
    * Scale shape: per-source counts are ONE partial-agg shuffle of a
    * #sources-row frame; rates derive on the driver from that tiny
    * frame in a fixed source-sorted summation order (run-to-run
    * deterministic to the last ulp) and broadcast back — the doc
    * side is scanned once and never shuffles. The coin is a pure arithmetic hash of the id —
    * two multiplicative rounds mod the prime P = 999983 with the
    * seed as an ADDITIVE term between them (u = (((id·A mod P) +
    * seed)·B mod P)/P), so no seed value can degenerate the
    * multipliers and every seed yields a full-period permutation of
    * residues. Reproducible row-for-row on any cluster layout AND
    * replayable in ANSI SQL — which is what makes it
    * oracle-checkable. Rates round to 1e-6 on both sides; u has
    * denominator P coprime to 10⁶, so u == rate is impossible and
    * the strict-< boundary is unambiguous.
    */
  def temperatureSample(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      alpha: Double,
      targetFraction: Double,
      seed: Long = 0L
  ): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    require(targetFraction > 0 && targetFraction <= 1.0, s"targetFraction must be in (0,1], got $targetFraction")
    // per-source counts: one partial-agg shuffle of a #sources-row
    // frame, then the rate derivation runs on the DRIVER in a fixed
    // (source-sorted) summation order — Σn is exact integer math and
    // Σw folds in one deterministic order, so no window-row-order
    // ulp wobble can flip a rate at the 1e-6 floor boundary between
    // runs or cluster layouts
    val countRows = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n")).collect()
      .map(r => (r.get(0), r.getLong(1)))
      .sortBy { case (src, _) => if (src == null) "" else src.toString }
    val totalN = countRows.map(_._2).sum
    val sumW = countRows.foldLeft(0.0) { case (acc, (_, n)) => acc + math.pow(n.toDouble, alpha) }
    val rateRows = countRows.map { case (src, n) =>
      val w = math.pow(n.toDouble, alpha)
      // floor-based half-up rounding to 1e-6 — Spark round is
      // HALF_UP via BigDecimal, DuckDB's is half-even; this exact
      // formulation is replayable in any engine
      val rate = math.floor(math.min(1.0,
        targetFraction * totalN.toDouble * (w / sumW) / n.toDouble) * 1e6 + 0.5) / 1e6
      org.apache.spark.sql.Row(src, rate)
    }
    val spark = df.sparkSession
    val rates = spark.createDataFrame(
      java.util.Arrays.asList(rateRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        df.schema(sourceCol).copy(name = "__src"),
        org.apache.spark.sql.types.StructField("__rate", org.apache.spark.sql.types.DoubleType, nullable = false))))
    val u = portableHash(col(idCol), seed).cast("double") / lit(HashP.toDouble)
    df.join(broadcast(rates), col(sourceCol) <=> col("__src"))
      .filter(u < col("__rate"))
      .drop("__src", "__rate")
  }

  /** Per-GROUP percentile gate — [[filterByQuantile]] with a
    * separate threshold per source/language ("top 20% by quality
    * WITHIN each language", so a high-resource language cannot
    * crowd out the rest — the per-group twin of the global gate).
    *
    * Thresholds come from the group's distinct-score frame (groupBy
    * counts + one cumulative window — the exact-quantile memory
    * discipline) and broadcast back; the fact side is scanned once
    * and never shuffles.
    *
    * The exact threshold is the NEAREST-RANK (type-1) quantile —
    * the ⌈q·n⌉-th smallest actual score, an order STATISTIC, not an
    * interpolation. A gate must compare rows against the threshold
    * with `>=`, and an interpolated threshold is a fresh double
    * whose last-ulp placement differs between engines (Spark
    * `percentile` vs ANSI quantile_cont use different FMA shapes):
    * the r12 sf1 sweep caught a 9-row tie-class sitting exactly ON
    * the interpolated value, kept by one engine and cut by the
    * other. A selected data value has no such ambiguity — both
    * engines pick the same element of the same sorted multiset.
    * `exact=false` switches to `approx_percentile` when the
    * distinct-score frame matters at scale. Null-group rows gate
    * against the null group's own threshold (null-safe join),
    * matching the global operator's keep-everything-comparable
    * behavior.
    */
  def filterByQuantilePerGroup(
      df: DataFrame,
      scoreCol: String,
      groupCol: String,
      q: Double,
      exact: Boolean = true
  ): DataFrame = {
    require(q > 0.0 && q < 1.0, s"q must be in (0,1), got $q")
    val thr =
      if (exact) {
        val counts = df
          .filter(col(scoreCol).isNotNull)
          .groupBy(col(groupCol).as("__g"), col(scoreCol).as("__v"))
          .agg(count(lit(1)).as("__c"))
        val grp = Window.partitionBy(col("__g"))
        val cum = grp.orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        counts
          .select(col("__g"), col("__v"),
            sum(col("__c")).over(cum).as("__cum"),
            sum(col("__c")).over(grp).as("__n"))
          // nearest-rank k = ⌈n·q⌉ in EXACT decimal arithmetic: the
          // double product can round just past an integer (n·q =
          // k+1e-16 → selects the (k+1)-th order statistic), and SQL
          // engines parse `0.8` as a decimal literal — so decimal is
          // both the correct math and the oracle-faithful math.
          // BigDecimal(q.toString) recovers the decimal the caller
          // wrote, not the binary double it became.
          .withColumn("__k",
            ceil(col("__n").cast("decimal(20,0)") *
              lit(new java.math.BigDecimal(q.toString))).cast("long"))
          .groupBy(col("__g"))
          .agg(min(when(col("__cum") >= col("__k"), col("__v"))).as("__thr"))
      } else {
        df.groupBy(col(groupCol).as("__g"))
          .agg(approx_percentile(col(scoreCol), lit(q), lit(10000)).cast("double").as("__thr"))
      }
    df.join(broadcast(thr), col(groupCol) <=> col("__g"))
      .filter(col(scoreCol) >= col("__thr"))
      .drop("__g", "__thr")
  }

  /** prime modulus of the portable per-row coin — coprime to 10⁶ so
    * a 1e-6-rounded rate can never exactly equal a hash residue.
    */
  private val HashP = 999983L

  /** Deterministic uniform residue in [0, P): two multiplicative
    * rounds mod the prime with the seed as an ADDITIVE middle term —
    * no seed value can degenerate the fixed multipliers. Pure
    * integer arithmetic (max intermediate ~2·10¹¹), replayable
    * verbatim in ANSI SQL, layout-independent.
    */
  private def portableHash(id: org.apache.spark.sql.Column, seed: Long): org.apache.spark.sql.Column = {
    val P = HashP
    val seedOff = (seed % P + P) % P
    (((id.cast("long") % P + P) % P) * 480879L % P + seedOff) * 104729L % P
  }

  /** Weighted sampling WITHOUT replacement, k per group — the
    * Efraimidis–Spirakis one-pass scheme: each row draws key
    * u^(1/w) (computed as ln(u)/w, the same monotone order) from a
    * deterministic uniform u, and the k largest keys per group are
    * the sample. Inclusion probability is proportional to weight
    * without replacement — the principled "keep the best-weighted k
    * docs per domain, reproducibly" primitive.
    *
    * Scale shape: the bounded [[graft.functions.TopKAggregate]]
    * buffer, NOT a row_number window — map-side partial heaps, the
    * exchange carries groups·k entries, nothing globally sorted.
    * Deterministic coin → same sample on any cluster layout, and
    * the whole operator (coin, key, tie-break) replays in ANSI SQL,
    * which is what makes it oracle-checkable.
    *
    * Rows with weight ≤ 0 or null are excluded (E-S requires
    * positive weights).
    */
  def weightedSamplePerGroup(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weightCol: String,
      k: Int,
      seed: Long = 0L
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // u in (0, 1]: +1 shifts the residue off zero so ln(u) is finite
    val u = (portableHash(col(idCol), seed) + lit(1L)).cast("double") / lit((HashP + 1).toDouble)
    val key = log(u) / col(weightCol)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .groupBy(col(groupCol))
      .agg(graft.functions.TopKAggregate.topK(key, col(idCol).cast("long"), k).as("__tk"))
      .select(col(groupCol), posexplode(col("__tk")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rank"), col("col.id").as(idCol))
  }

  /** Public on purpose: Spark's generated deserializer invokes the
    * accessors from janino-compiled code, which cannot see a
    * Scala-private class — codegen would fail and silently fall
    * back to the interpreted path on every packSequences call.
    */
  case class PackedDoc(doc_id: Long, n_tokens: Long, bin_id: Long)

  /** First-fit-decreasing sequence packing: assign docs to bins of
    * at most `maxTokens` tokens each — the training-batch packing
    * step ("fill 2048-token sequences with documents"). Docs longer
    * than `maxTokens` get a bin of their own (callers chunk first
    * if overflow is unacceptable).
    *
    * Distributed shape: FFD runs independently PER PARTITION after
    * a partition-local descending sort (`sortWithinPartitions` —
    * no global sort, no shuffle beyond the caller's partitioning).
    * Per-partition FFD keeps every bin except possibly the last
    * more than half full, so total bins ≤ totalTokens/(maxTokens/2)
    * + numPartitions — within 2× of optimal at any scale, and each
    * partition only holds its open-bin token counters in memory.
    * Bin ids are globally unique: (partitionId << 33) | localBin.
    *
    * Output: (doc_id, n_tokens, bin_id) — one row per doc.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      maxTokens: Long
  ): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(tokenCol).cast("long").as("n_tokens"))
      .sortWithinPartitions(col("n_tokens").desc, col("doc_id"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        // open bins: remaining capacity per local bin id. FFD scans
        // for the first bin that fits; docs arrive largest-first.
        val remaining = scala.collection.mutable.ArrayBuffer[Long]()
        it.map { case (id, tok) =>
          // zero-token docs still need a bin with ≥1 slack — without
          // the max they'd "fit" a zero-capacity oversize bin and
          // break the oversize-docs-sit-alone invariant
          val need = math.max(tok, 1L)
          var b = 0
          while (b < remaining.length && remaining(b) < need) b += 1
          if (b == remaining.length) remaining.append(math.max(maxTokens - tok, 0L))
          else remaining(b) -= tok
          PackedDoc(id, tok, (pid << 33) | b.toLong)
        }
      }
      .toDF()
  }

  /** Equal-population rank buckets per group (deciles, quartiles —
    * curriculum stages, quality tiers): standard SQL `ntile(n)`
    * over (value, tieBreak), so the assignment is engine-portable
    * whenever the tie-break makes the order total. One window
    * shuffle on the group key — the group axis is the scale axis,
    * same contract as [[filterByQuantilePerGroup]]; for an
    * UNgrouped bucket over 100 TB use the exact-quantile thresholds
    * ([[graft.operators.StatsOps.groupQuantileExact]]) instead of a
    * single global sort.
    */
  def ntileBuckets(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      tieBreakCol: String,
      n: Int,
      bucketCol: String = "bucket"
  ): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol), col(tieBreakCol))
    df.withColumn(bucketCol, ntile(n).over(w))
  }

  /** Length-sorted batch formation with the padding bill — the
    * PADDED-training complement of [[packSequences]] (which
    * concatenates docs into fixed token budgets): sort each group's
    * docs by token count descending, cut every `batchSize` docs,
    * and report what padding-to-batch-max costs. Length-adjacent
    * batching is the standard padding-overhead fix (a shuffled
    * batch pads every doc to the batch max; sorted batches make
    * neighbors similar-length), and the per-batch report is the
    * measurement that justifies it.
    *
    * Scale shape: the GROUP axis is the parallel axis (the
    * [[ntileBuckets]] contract — partition by source/shard, never a
    * global single-partition window): ONE window shuffle on
    * `groupCols` for the within-group row_number, then a
    * map-side-combinable groupBy over (group, batch). Deterministic
    * total order: (n_tokens desc, id) — ties never reshuffle
    * between runs.
    *
    * Output: one row per batch —
    * (groups*, batch_id, n_docs, max_tokens, sum_tokens, padding,
    * pad_frac) where `padding = n_docs·max_tokens − sum_tokens`
    * (the short final batch bills only its actual rows) and
    * `pad_frac = padding / (n_docs·max_tokens)` on the 1e-9 grid.
    */
  def lengthBatches(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      tokenCol: String,
      batchSize: Int
  ): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val gs = groupCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gs: _*)
      .orderBy(col(tokenCol).desc, col(idCol))
    val toks = col(tokenCol).cast("long")
    df.filter(toks.isNotNull && col(idCol).isNotNull)
      .withColumn("__batch", ((row_number().over(w) - 1) / batchSize).cast("long"))
      .groupBy(gs :+ col("__batch").as("batch_id"): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        max(toks).as("max_tokens"),
        sum(toks).as("sum_tokens"))
      .withColumn("padding", col("n_docs") * col("max_tokens") - col("sum_tokens"))
      .withColumn("pad_frac",
        when(col("n_docs") * col("max_tokens") > 0,
          floor(col("padding").cast("double") / (col("n_docs") * col("max_tokens"))
            * 1e9 + 0.5) / 1e9)
          .otherwise(lit(0.0)))
  }

  /** Stride-scheduled source interleaving (Waldspurger's stride
    * scheduling applied to corpus order): every row gets a virtual
    * time `vt = rank_within_source / weight`, and reading rows in
    * `vt` order interleaves the sources proportionally to their
    * weights AT EVERY PREFIX — a weight-2 source appears twice as
    * often as a weight-1 source in any window of the schedule, not
    * just in expectation over an epoch. The deterministic
    * curriculum/mixing order a training pipeline shards by:
    * unlike [[temperatureSample]] (which drops rows to hit a
    * ratio), this keeps every row and ORDERS them.
    *
    * Scale shape: ONE window shuffle partitioned BY SOURCE for the
    * within-source rank (the source axis is the parallel axis);
    * `vt` is a per-row formula — no global sort appears in this
    * plan. Consumers range-partition or sort by (vt, tie) at write
    * time exactly like [[graft.operators.LayoutOps.zorderWrite]]
    * orders by the curve key. vt snaps to the 1e-9 grid; ties
    * across sources resolve by the caller's sort on (vt, source,
    * order col).
    *
    * @param weights per-source relative rates; sources absent from
    *                the map use `defaultWeight`
    */
  def interleaveBySource(
      df: DataFrame,
      sourceCol: String,
      orderCols: Seq[String],
      weights: Map[String, Double],
      defaultWeight: Double = 1.0
  ): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    require(defaultWeight > 0, s"defaultWeight must be positive, got $defaultWeight")
    require(weights.values.forall(_ > 0), s"weights must be positive: $weights")
    val snap9 = (c: org.apache.spark.sql.Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(orderCols.map(col): _*)
    // plan-time literal CASE over the (small, caller-authored)
    // weight map — no join, the fact side never shuffles for it
    val weight = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, v)) =>
      when(col(sourceCol) === s, lit(v)).otherwise(acc)
    }
    df.withColumn("src_rank", row_number().over(w))
      .withColumn("vt", snap9(col("src_rank").cast("double") / weight))
  }

  /** Duplicate-downweighting — SOFT dedup: instead of dropping a
    * duplicate cluster's copies (the D-family operators), keep
    * every row and weight it 1/cluster_size, so the cluster
    * contributes ONE document's worth of probability mass to
    * training (the "weighted dedup" alternative when provenance
    * diversity matters — each copy keeps its own metadata — or when
    * the sampler downstream consumes weights anyway, e.g.
    * [[weightedSamplePerGroup]]).
    *
    * Scale shape: ONE map-side-combinable groupBy(cluster) for the
    * sizes + ONE left join back on the member id (cluster frames
    * hold only the duplicated minority → AQE broadcast at typical
    * dup rates); singletons weight 1.0 without touching the join.
    * Weights are exact-integer reciprocals snapped at 1e-9.
    */
  def dedupWeights(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      clusters: org.apache.spark.sql.DataFrame,
      clusterCol: String,
      memberCol: String,
      weightCol: String = "dedup_weight"
  ): org.apache.spark.sql.DataFrame = {
    val snap9 = (c: org.apache.spark.sql.Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val sizes = clusters
      .groupBy(col(clusterCol).as("__cl"))
      .agg(count(lit(1)).as("__sz"))
    val cl = clusters.select(col(memberCol).as("__id"), col(clusterCol).as("__cl"))
      .join(sizes, "__cl")
    df.join(cl, df(idCol) === col("__id"), "left")
      .withColumn(weightCol,
        when(col("__sz").isNotNull, snap9(lit(1.0) / col("__sz").cast("double")))
          .otherwise(lit(1.0)))
      .drop("__id", "__cl", "__sz")
  }

  // ---- Mixture-weight solving -------------------------------------------

  /** Exact-ratio mixture maximization: the largest total token count
    * T whose per-source takes hit the target proportions EXACTLY
    * without any source exceeding `maxRate` of its available tokens
    * — T* = min_s(maxRate·avail_s / p_s), the closed-form LP this
    * family's planning step needs before sampling (the rates feed
    * [[temperatureSample]]/[[perGroupQuota]], closing the curation
    * loop the E2E pipeline starts).
    *
    * Replayable by construction: weights normalize to exact ratios,
    * the min is a ONE-ROW broadcast scalar, every output snaps to
    * the 1e-6 grid — the oracle recomputes it verbatim. The stats
    * frame is per-source (a bounded dimension by contract); the raw
    * corpus never enters.
    *
    * @param stats one row per source: (sourceCol, availCol tokens
    *              available, weightCol unnormalized target weight > 0)
    * @return (sourceCol, avail, p, cap, take, rate) — take_s = p_s·T*
    */
  def solveMixtureMax(
      stats: DataFrame,
      sourceCol: String,
      availCol: String,
      weightCol: String,
      maxRate: Double = 1.0
  ): DataFrame = {
    require(maxRate > 0.0 && maxRate <= 1.0, s"maxRate must be in (0, 1], got $maxRate")
    val snap6 = (c: org.apache.spark.sql.Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val wAll = Window.partitionBy()
    val base = stats
      .select(col(sourceCol), col(availCol).cast("double").as("avail"),
        col(weightCol).cast("double").as("__w"))
      .withColumn("p", col("__w") / sum(col("__w")).over(wAll))
      .withColumn("cap", col("avail") * lit(maxRate))
      .withColumn("__t", min(when(col("p") > 0, col("cap") / col("p"))).over(wAll))
    base.select(col(sourceCol), col("avail"), snap6(col("p")).as("p"),
      snap6(col("cap")).as("cap"),
      snap6(when(col("p") > 0, col("p") * col("__t")).otherwise(lit(0.0))).as("take"),
      snap6(when(col("avail") > 0, col("p") * col("__t") / col("avail"))
        .otherwise(lit(0.0))).as("rate"))
  }

  /** Budget-constrained mixture solving (waterfilling LP): spend a
    * token `budget` across sources as close to the target
    * proportions as the per-source caps allow — sources whose cap
    * binds take exactly their cap ("saturated"), the remainder
    * redistributes among the others proportionally. The classic
    * data-mixture planning problem (hit the recipe, respect
    * availability, spill the excess by the recipe).
    *
    * Solved in CLOSED FORM, no iteration: order sources by cap/p
    * ascending; the saturated set is a prefix of that order, and a
    * source saturates iff its cap/p is ≤ the water level computed
    * from everything before it — two window prefix sums produce the
    * level t* = (budget − Σ_sat cap) / (1 − Σ_sat p) and
    * take_s = min(cap_s, p_s·t*). All arithmetic on the tiny
    * per-source frame (single-partition windows over a bounded
    * dimension, the [[graft.operators.SketchOps.kmvJaccard]]
    * contract), 1e-6 snapped, exactly replayable in SQL.
    *
    * If `budget` exceeds total capacity every source saturates and
    * the achieved total is Σ cap < budget (under-delivery is
    * visible in the output, never silent).
    *
    * @return (sourceCol, avail, p, cap, take, rate, saturated)
    */
  def solveMixtureBudget(
      stats: DataFrame,
      sourceCol: String,
      availCol: String,
      weightCol: String,
      budget: Double,
      maxRate: Double = 1.0
  ): DataFrame = {
    require(budget > 0.0, s"budget must be positive, got $budget")
    require(maxRate > 0.0 && maxRate <= 1.0, s"maxRate must be in (0, 1], got $maxRate")
    val snap6 = (c: org.apache.spark.sql.Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val wAll = Window.partitionBy()
    val ord = Window.orderBy(col("__ratio"), col(sourceCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = stats
      .select(col(sourceCol), col(availCol).cast("double").as("avail"),
        col(weightCol).cast("double").as("__w"))
      .withColumn("p", col("__w") / sum(col("__w")).over(wAll))
      .withColumn("cap", col("avail") * lit(maxRate))
      .filter(col("p") > 0)
      .withColumn("__ratio", col("cap") / col("p"))
      // water level BEFORE this source: everything earlier in
      // cap/p order saturated
      .withColumn("__preCap", coalesce(sum(col("cap")).over(ord), lit(0.0)))
      .withColumn("__preP", coalesce(sum(col("p")).over(ord), lit(0.0)))
      .withColumn("__sat",
        (col("__ratio") * (lit(1.0) - col("__preP")) <= lit(budget) - col("__preCap"))
          .cast("int"))
    val lvl = base
      .withColumn("__satCap", sum(col("cap") * col("__sat")).over(wAll))
      .withColumn("__satP", sum(col("p") * col("__sat")).over(wAll))
      .withColumn("__t",
        when(col("__satP") < 1.0,
          (lit(budget) - col("__satCap")) / (lit(1.0) - col("__satP"))))
    lvl.select(col(sourceCol), col("avail"), snap6(col("p")).as("p"),
      snap6(col("cap")).as("cap"),
      snap6(when(col("__sat") === 1, col("cap"))
        .otherwise(least(col("cap"), col("p") * col("__t")))).as("take"),
      snap6(when(col("avail") > 0,
        when(col("__sat") === 1, col("cap"))
          .otherwise(least(col("cap"), col("p") * col("__t"))) / col("avail"))
        .otherwise(lit(0.0))).as("rate"),
      col("__sat").as("saturated"))
  }

  /** Execute a SOLVED mixture ([[solveMixtureBudget]] /
    * [[solveMixtureMax]] output) against the corpus: keep each
    * source's rows at its solved `rate` with the portable integer
    * coin — the same layout-independent, seeded, row-for-row
    * SQL-replayable keep rule [[temperatureSample]] uses, so
    * plan → solve → apply is one deterministic path from recipe to
    * sampled corpus. Rates broadcast (a per-source frame); the doc
    * side never shuffles.
    */
  def applyMixture(
      df: DataFrame,
      solved: DataFrame,
      sourceCol: String,
      idCol: String,
      seed: Long = 0L
  ): DataFrame = {
    val rates = solved.select(col(sourceCol).as("__src"), col("rate").as("__rate"))
    val u = portableHash(col(idCol), seed).cast("double") / lit(HashP.toDouble)
    df.join(broadcast(rates), col(sourceCol) <=> col("__src"))
      .filter(u < col("__rate"))
      .drop("__src", "__rate")
  }

  // ---- DSIR importance weights -------------------------------------------

  /** Hashed bag-of-ngrams features (word unigrams + bigrams folded
    * into `buckets` via the portable md5 fold) — the DSIR feature
    * space, computed by the one-pass K-series kernel
    * ([[graft.functions.DsirFeaturesExpression]]): the composed
    * Column formulation materialized gram strings, hex strings, and
    * ran 13 substring/instr evaluations per gram.
    */
  private def dsirFeatures(text: Column, buckets: Int): Column =
    graft.functions.DsirFeaturesExpression.dsirFeatures(text, buckets)

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every
    * raw-corpus document by how target-like its hashed-n-gram
    * profile is — `log p_target(doc) − log p_raw(doc)` under
    * add-alpha-smoothed bag-of-hashed-ngrams models fit on the two
    * corpora. Downstream, resample raw docs with these log-weights
    * (e.g. [[filterByQuantile]] on `dsir_weight`, or Gumbel-top-k)
    * to shift a web-scale corpus toward a quality target set.
    *
    * Scale shape: the two model fits are ONE map-side-combinable
    * feature-count aggregation each, collapsing to `buckets` rows
    * (bounded driver collect, the IVF-centroid rule — buckets ≤
    * 65536 enforced); the per-doc scoring pass is then ZERO-shuffle:
    * the log-ratio table rides into the scan stage as an array
    * literal and each doc folds its own features with `aggregate` —
    * the 100 TB side is read once and never exchanged.
    *
    * Features hash through the portable md5 fold, so the weights
    * replay exactly in ANSI SQL (the q_dsir oracle).
    *
    * @return one row per raw doc: (idCol, n_features, dsir_weight)
    *         with the weight snapped to the 1e-6 grid
    */
  def dsirWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 512,
      alpha: Double = 0.5
  ): DataFrame = {
    require(buckets >= 2 && buckets <= 65536,
      s"buckets must be in [2, 65536] (the ratio table broadcasts + collects), got $buckets")
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    def bucketCounts(df: DataFrame): Array[Long] = {
      val arr = new Array[Long](buckets)
      df.select(explode(dsirFeatures(col(textCol), buckets)).as("__f"))
        .groupBy(col("__f")).agg(count(lit(1)).as("__c"))
        .collect() // bounded: <= buckets rows
        .foreach(r => arr(r.getInt(0)) = r.getLong(1))
      arr
    }
    val cRaw = bucketCounts(raw)
    val cTgt = bucketCounts(target)
    val tRaw = cRaw.sum.toDouble
    val tTgt = cTgt.sum.toDouble
    val lam = Array.tabulate(buckets) { f =>
      math.log((cTgt(f) + alpha) / (tTgt + alpha * buckets)) -
        math.log((cRaw(f) + alpha) / (tRaw + alpha * buckets))
    }
    val lamLit = array(lam.map(lit(_)): _*)
    raw
      .withColumn("__fs", dsirFeatures(col(textCol), buckets))
      .select(col(idCol),
        size(col("__fs")).cast("long").as("n_features"),
        (floor(aggregate(col("__fs"), lit(0.0),
          (acc, f) => acc + element_at(lamLit, f + 1)) * 1e6 + lit(0.5)) / 1e6)
          .as("dsir_weight"))
  }

}
