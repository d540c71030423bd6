package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Label encoding — reference biodata.py:821-895 `_set_labels` and
  * features/targets.py (`BinClassLabel`, `RegressionTarget`).
  *
  * Reference semantics:
  *  - class encode: labels (given or distinct-from-data, sorted for
  *    determinism here) → dense int codes; unseen/None → -1.
  *  - binarize: positive_labels→1, negative_labels→0; labels not in
  *    either map get: 0 if only positives given, 1 if only
  *    negatives given, -1 if both (biodata.py:851-867).
  *
  * Scale: the label dictionary is tiny (class counts, not data
  * size). Below `maxInlineLabels` we inline it as a literal
  * CASE/`map` expression — zero shuffle, zero join, stays in
  * whole-stage codegen. Above, a broadcast join. Either way the
  * fact table never shuffles.
  */
object LabelOps {

  val TargetColumn = "encoded_labels" // biodata.py:62

  private[operators] val maxInlineLabels = 10000

  /** Distinct labels of `labelCol`, sorted ascending (nulls
    * excluded) — the label dictionary. ONE job via a collect_set
    * aggregate: map-side partials hold ~#classes values each and
    * merge once, vs the distinct+orderBy formulation's extra
    * shuffle + sort stage. The tiny dictionary is sorted on the
    * driver.
    *
    * Guarded: an approx-distinct probe runs FIRST, so a
    * high-cardinality column fails fast instead of OOMing the
    * driver inside collect_set. Use [[classEncode]] (which
    * auto-falls-back to the broadcast-join path) when cardinality
    * is unknown.
    */
  def labelDictionary(df: DataFrame, labelCol: String): Seq[String] = {
    val approx = approxLabelCount(df, labelCol)
    // 5% HLL slack only — admitting more would run the collect_set
    // and then still fail classEncodeWith's inline require
    require(approx <= (maxInlineLabels * 1.05).toLong,
      s"~$approx distinct labels — too many to collect as an inline dictionary; " +
        s"use classEncode (broadcast-join fallback) or classEncodeBroadcast")
    unguardedDictionary(df, labelCol)
  }

  private def unguardedDictionary(df: DataFrame, labelCol: String): Seq[String] =
    df.select(col(labelCol).cast("string").as("l"))
      .agg(collect_set(col("l")))
      .collect()(0)
      .getSeq[String](0)
      // Spark's own binary/codepoint order, NOT Java's UTF-16
      // code-unit order (they disagree on supplementary characters
      // — emoji labels would get different class ids than any
      // engine-side ORDER BY or the DuckDB oracle produce)
      .sorted(Ordering.comparatorToOrdering[org.apache.spark.unsafe.types.UTF8String](
        java.util.Comparator.naturalOrder())
        .on[String](org.apache.spark.unsafe.types.UTF8String.fromString))

  private def approxLabelCount(df: DataFrame, labelCol: String): Long =
    df.agg(approx_count_distinct(col(labelCol).cast("string"))).collect()(0).getLong(0)

  /** Class encode with automatic strategy choice: inline literal
    * map below [[maxInlineLabels]] (zero shuffle, whole-stage
    * codegen), broadcast dictionary join above it (the dictionary
    * is class-count-sized — broadcastable far beyond what a driver
    * literal tolerates; the fact side still never shuffles).
    */
  def classEncode(df: DataFrame, labelCol: String, outputCol: String = TargetColumn): DataFrame = {
    // ±2% HLL error: use a 20% margin so a borderline dictionary
    // can't slip past the inline require; ONE probe job — the
    // dictionary collect skips its own guard
    if (approxLabelCount(df, labelCol) <= maxInlineLabels * 0.8)
      classEncodeWith(df, labelCol, unguardedDictionary(df, labelCol), outputCol)
    else classEncodeBroadcast(df, labelCol, outputCol)
  }

  /** Large-dictionary encode: dense codes assigned by a
    * row_number over the sorted distinct labels, attached to the
    * fact side through a broadcast left join — no driver collect at
    * any cardinality. The single-partition window sorts only the
    * dictionary (class-count rows, ≪ data); unseen is impossible
    * (codes come from the same data) and null encodes -1 like the
    * inline path.
    */
  def classEncodeBroadcast(df: DataFrame, labelCol: String, outputCol: String = TargetColumn): DataFrame = {
    val dict = df.select(col(labelCol).cast("string").as("__graft_label"))
      .filter(col("__graft_label").isNotNull)
      .distinct()
      .withColumn(outputCol,
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col("__graft_label"))) - 1)
    df.join(broadcast(dict), col(labelCol).cast("string") === col("__graft_label"), "left")
      .withColumn(outputCol, coalesce(col(outputCol), lit(-1)))
      .drop("__graft_label")
  }

  /** Encode against a fixed dictionary (the multi-file case where
    * the reference demands explicit labels, biodata.py:1006-1022).
    */
  def classEncodeWith(
      df: DataFrame,
      labelCol: String,
      labels: Seq[String],
      outputCol: String = TargetColumn
  ): DataFrame = {
    require(labels.size <= maxInlineLabels, s"label dictionary too large to inline (${labels.size})")
    val m = typedLit(labels.zipWithIndex.toMap)
    df.withColumn(
      outputCol,
      coalesce(element_at(m, col(labelCol).cast("string")), lit(-1))
    )
  }

  final case class BinarizeSpec(
      positive: Seq[String] = Nil,
      negative: Seq[String] = Nil,
      positiveName: String = "positive",
      negativeName: String = "negative"
  ) {
    require(positive.nonEmpty || negative.nonEmpty, "need positive and/or negative labels")
    /** biodata.py:851-867: the code assigned to labels in neither list. */
    def missingValue: Int =
      if (positive.nonEmpty && negative.nonEmpty) -1
      else if (positive.nonEmpty) 0
      else 1
  }

  def binarize(df: DataFrame, labelCol: String, spec: BinarizeSpec, outputCol: String = TargetColumn): DataFrame = {
    val c = col(labelCol).cast("string")
    val base: Column = lit(spec.missingValue)
    val withNeg = if (spec.negative.nonEmpty) when(c.isInCollection(spec.negative), lit(0)).otherwise(base) else base
    val full = if (spec.positive.nonEmpty) when(c.isInCollection(spec.positive), lit(1)).otherwise(withNeg) else withNeg
    df.withColumn(outputCol, full)
  }

  /** Smoothed target encoding of a categorical column — the
    * high-cardinality feature-engineering staple (replace a
    * category by its smoothed mean target,
    * `(Σ_cat + m·prior)/(n_cat + m)`), with the leave-one-out
    * variant that keeps the row's own target out of its encoding
    * (the standard target-leakage guard for training frames).
    *
    * ONE map-side-combinable groupBy(category) + a category-sized
    * join back + a 1-row prior broadcast. LOO rows from singleton
    * categories fall back to the prior (their "others" set is
    * empty). Encodings land on the 1e-9 grid.
    *
    * @param m smoothing pseudo-count (Micci-Barreca 2001 style)
    * @return input columns + `te` (1e-9 grid)
    */
  def targetEncode(
      df: DataFrame,
      catCol: String,
      targetCol: String,
      m: Double = 10.0,
      leaveOneOut: Boolean = false
  ): DataFrame = {
    require(m >= 0, s"smoothing m must be >= 0, got $m")
    val t = col(targetCol).cast("double")
    val prior = df.filter(t.isNotNull)
      .agg((floor(avg(t) * lit(1e9) + lit(0.5)) / lit(1e9)).as("__prior"))
    val stats = df.filter(t.isNotNull && col(catCol).isNotNull)
      .groupBy(col(catCol))
      .agg(count(lit(1)).as("__cn"), sum(t).as("__cs"))
    val joined = df.join(stats, Seq(catCol), "left").crossJoin(broadcast(prior))
    val snap9 = (c: Column) => floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val enc =
      if (leaveOneOut)
        when(t.isNotNull && col("__cn") > 1,
          snap9((col("__cs") - t + lit(m) * col("__prior")) / (col("__cn") - 1 + lit(m))))
          .otherwise(col("__prior"))
      else
        when(col("__cn").isNotNull,
          snap9((col("__cs") + lit(m) * col("__prior")) / (col("__cn") + lit(m))))
          .otherwise(col("__prior"))
    joined.withColumn("te", enc).drop("__cn", "__cs", "__prior")
  }
}
