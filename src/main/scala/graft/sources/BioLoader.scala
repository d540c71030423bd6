package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-format tabular loader — the Spark-first analogue of the
  * reference's format dispatch (reference: biodata.py:187-196
  * EXTENSION_MAP: csv/tsv/txt/json/jsonl/parquet/arrow/npz).
  *
  * Spark's own readers already stream, predicate-push, and
  * column-prune; graft only normalizes the dispatch + options so a
  * caller can hand any supported path (or list of paths — the
  * reference accepts multi-file splits) and get a DataFrame whose
  * scan prunes to exactly the referenced columns.
  *
  * NPZ (scipy sparse) has no Spark reader; see [[NpzReader]].
  */
object BioLoader {

  /** Options mirroring the reference's CsvConfig knobs that make
    * sense under Spark (reference: packaged_modules/csv/csv.py:26-55).
    */
  final case class CsvOptions(
      sep: String = ",",
      header: Boolean = true,
      quote: String = "\"",
      comment: String = "",
      nullValue: String = "",
      inferSchema: Boolean = true
  )

  def load(spark: SparkSession, paths: Seq[String], csv: CsvOptions = CsvOptions()): DataFrame = {
    require(paths.nonEmpty, "at least one data file must be specified")
    val exts = paths.map(extensionOf).distinct
    require(exts.size == 1, s"all files in one load must share a format, got $exts")
    exts.head match {
      case "parquet" => spark.read.parquet(paths: _*)
      case "csv" | "tsv" | "txt" =>
        val sep = if (extensionOf(paths.head) == "tsv") "\t" else csv.sep
        var r = spark.read
          .option("sep", sep)
          .option("header", csv.header.toString)
          .option("quote", csv.quote)
          .option("nullValue", csv.nullValue)
          .option("inferSchema", csv.inferSchema.toString)
        if (csv.comment.nonEmpty) r = r.option("comment", csv.comment)
        r.csv(paths: _*)
      case "json" | "jsonl" => spark.read.json(paths: _*)
      case "npz"            => NpzReader.read(spark, paths)
      case "arrow"          => ArrowIpcReader.read(spark, paths)
      case other            => throw new IllegalArgumentException(s"unsupported extension: .$other")
    }
  }

  def load(spark: SparkSession, path: String): DataFrame = load(spark, Seq(path))

  /** Normalize an epoch-nanos long column (how nanosecond parquet
    * timestamps surface under `nanosAsLong`) to a microsecond
    * TimestampType. Integer division — no double round-trip, which
    * would lose precision above 2^53 ns.
    */
  def nanosToTimestamp(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(c, org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr(s"`$c` div 1000")))
      case _ => df
    }

  private def extensionOf(path: String): String = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    val i = name.lastIndexOf('.')
    if (i < 0) "parquet" else name.substring(i + 1).toLowerCase
  }
}
