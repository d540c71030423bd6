package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Reshape operators for omics-style tables.
  *
  * The reference stores samples×features wide tables and offers
  * `rows_are_features` transposition (biodata.py:180) plus
  * horizontal/vertical concatenation (load.py:255
  * `concatenate_datasets(axis=0/1)`, biodata.py:946-971 positional
  * metadata concat). graft keeps the LONG format as the scale-native
  * representation and treats wide as a view you pivot into.
  */
object ReshapeOps {

  /** Wide→long. Built on `stack` (codegen'd, no shuffle, streams
    * through the scan). Value columns are cast to a common type.
    */
  def melt(
      df: DataFrame,
      idCols: Seq[String],
      valueCols: Seq[String],
      varName: String = "variable",
      valueName: String = "value"
  ): DataFrame = {
    require(valueCols.nonEmpty, "melt needs at least one value column")
    val stackArgs = valueCols
      .map(c => s"'${c.replace("'", "\\'")}', cast(`$c` as double)")
      .mkString(", ")
    val stacked = expr(s"stack(${valueCols.size}, $stackArgs) as (`$varName`, `$valueName`)")
    df.select(idCols.map(col) :+ stacked: _*)
  }

  /** Long→wide. `groupBy.pivot` WITH explicit values: providing the
    * pivot values skips Spark's extra distinct-collection job and
    * keeps the plan a single shuffle. At scale, always pass them.
    */
  def pivot(
      df: DataFrame,
      idCol: String,
      varCol: String,
      valueCol: String,
      values: Seq[String],
      agg: String = "sum"
  ): DataFrame = {
    val g = df.groupBy(col(idCol)).pivot(varCol, values)
    agg match {
      case "sum"   => g.sum(valueCol)
      case "avg"   => g.avg(valueCol)
      case "max"   => g.max(valueCol)
      case "min"   => g.min(valueCol)
      case "count" => g.count()
      case other   => throw new IllegalArgumentException(s"unsupported pivot agg: $other")
    }
  }

  /** Full transpose for `rows_are_features` inputs
    * (biodata.py:180). Implemented as melt→pivot: shuffle is
    * O(cells), never a driver collect. Intended for feature-major
    * inputs whose row count (= #features) is pivotable; for a
    * billion-row table you don't transpose, you keep long format.
    *
    * @param nameCol column holding the new header names (feature ids)
    */
  def transpose(df: DataFrame, nameCol: String): DataFrame = {
    val valueCols = df.columns.filter(_ != nameCol).toSeq
    val names = df.select(col(nameCol).cast("string")).distinct().orderBy(nameCol)
      .collect().map(_.getString(0)).toSeq
    val long = melt(df, Seq(nameCol), valueCols, "__sample", "__value")
      .withColumn(nameCol, col(nameCol).cast("string"))
    pivot(long, "__sample", nameCol, "__value", names).withColumnRenamed("__sample", "sample")
  }

  /** Vertical concat with schema alignment: columns are united by
    * name, missing ones null-filled — the reference's
    * `add_missing_columns` / multi-file union (biodata.py:182).
    * Pure union: no shuffle.
    */
  def concatRows(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Stable per-row index without a single-partition shuffle.
    * `zipWithIndex` runs one lightweight count-per-partition job
    * then assigns contiguous ids — unlike `monotonically_increasing_id`
    * the ids are dense, and unlike `row_number()` over no partition
    * there is no 1-partition window. Order is the DataFrame's
    * current order, so sort first for a deterministic result.
    */
  def withRowIndex(df: DataFrame, indexCol: String = "__row_idx"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(indexCol, LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Positional horizontal concat — the reference's keyless
    * sample-metadata path (biodata.py:936-971): row counts must
    * match, row order IS the alignment, colliding columns are
    * dropped from the data side (metadata wins).
    *
    * Callers must pass a deterministic ordering column set for each
    * side; "whatever order parquet came back in" is not a contract
    * at 100 TB. The join is on the dense row index (shuffle of both
    * sides by index — unavoidable for positional semantics).
    */
  def concatColumns(
      left: DataFrame,
      right: DataFrame,
      leftOrder: Seq[String],
      rightOrder: Seq[String]
  ): DataFrame = {
    val colliding = left.columns.toSet.intersect(right.columns.toSet)
    val cleanLeft = if (colliding.nonEmpty) left.drop(colliding.toSeq: _*) else left
    val li = withRowIndex(cleanLeft.orderBy(leftOrder.map(col): _*))
    val ri = withRowIndex(right.orderBy(rightOrder.map(col): _*))
    val joined = li.join(ri, "__row_idx")
    joined.drop("__row_idx").select((right.columns ++ cleanLeft.columns).map(col).toIndexedSeq: _*)
  }

  /** Recursively flatten struct columns into `parent.child`
    * top-level columns — the reference's `Dataset.flatten`
    * (arrow_dataset.py wraps HF flatten). Pure projection: no
    * shuffle, nested-column pruning still reaches the scan.
    */
  def flattenStructs(df: DataFrame, sep: String = "."): DataFrame = {
    import org.apache.spark.sql.types.StructType
    def expand(prefix: String, field: org.apache.spark.sql.types.StructField): Seq[Column] =
      field.dataType match {
        case st: StructType =>
          st.fields.toSeq.flatMap(f => expand(s"$prefix${field.name}$sep", f.copy(name = f.name)))
            .map(identity)
        case _ =>
          Seq(col((s"$prefix${field.name}").split(java.util.regex.Pattern.quote(sep)).map(n => s"`$n`").mkString(".")).as(s"$prefix${field.name}"))
      }
    val cols = df.schema.fields.toSeq.flatMap(f => expand("", f))
    df.select(cols: _*)
  }

  /** Union of two frames with differing schemas where missing
    * columns become nulls, preserving a `source` tag.
    */
  def unionTagged(dfs: Seq[(String, DataFrame)], tagCol: String = "source_split"): DataFrame =
    concatRows(dfs.map { case (tag, df) => df.withColumn(tagCol, lit(tag)) })
}
