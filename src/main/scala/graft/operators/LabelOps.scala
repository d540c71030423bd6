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

  private val maxInlineLabels = 10000

  /** Distinct labels of `labelCol`, sorted ascending (nulls
    * excluded) — the label dictionary. ONE job via a collect_set
    * aggregate: map-side partials hold ~#classes values each and
    * merge once, vs the distinct+orderBy formulation's extra
    * shuffle + sort stage. The tiny dictionary is sorted on the
    * driver.
    */
  def labelDictionary(df: DataFrame, labelCol: String): Seq[String] =
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

  def classEncode(df: DataFrame, labelCol: String, outputCol: String = TargetColumn): DataFrame = {
    val labels = labelDictionary(df, labelCol)
    classEncodeWith(df, labelCol, labels, outputCol)
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
}
