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
    * sense under Spark (reference: packaged_modules/csv/csv.py:26-55
    * — has_header/sep/quote_char/comment_prefix/null_values/
    * skip_rows/columns/new_columns/n_rows/encoding). Knobs with no
    * distributed analogue (n_threads, low_memory, rechunk,
    * batch_size) are intentionally absent — Spark's reader owns
    * those concerns.
    *
    * @param skipRows   raw lines skipped at the head of EACH file
    *                   before header parsing (polars skip_rows)
    * @param columns    keep only these columns (projection pushdown
    *                   still applies — Spark prunes the parse)
    * @param newColumns rename all columns positionally after read
    * @param nRows      cap on returned rows (polars n_rows)
    * @param nullValues additional strings parsed as null in string
    *                   columns (polars accepts a list; Spark's
    *                   reader takes one, the rest are normalized
    *                   post-read)
    */
  final case class CsvOptions(
      sep: String = ",",
      header: Boolean = true,
      quote: String = "\"",
      comment: String = "",
      nullValue: String = "",
      inferSchema: Boolean = true,
      skipRows: Int = 0,
      columns: Seq[String] = Nil,
      newColumns: Seq[String] = Nil,
      nRows: Option[Int] = None,
      nullValues: Seq[String] = Nil,
      encoding: String = "UTF-8"
  )

  /** @param addMissingColumns when shards disagree on columns,
    *   align-union them with null fill (reference
    *   `add_missing_columns`, biodata.py config) instead of raising
    * @param validateShardLimit how many shards have their column
    *   sets compared before a multi-file read (reference raises on
    *   mismatched shards, tests/test_load.py:748-960; bounded so a
    *   100k-shard production load doesn't pay 100k driver schema
    *   reads — full validation is a sampling concern at that scale)
    */
  def load(
      spark: SparkSession,
      paths: Seq[String],
      csv: CsvOptions = CsvOptions(),
      addMissingColumns: Boolean = false,
      validateShardLimit: Int = 32
  ): DataFrame = {
    require(paths.nonEmpty, "at least one data file must be specified")
    // http(s) URLs: fetch-once into the local cache (reference
    // download manager parity — see HttpFetch); s3a/hdfs/file pass
    // straight through to Spark's own readers
    val localized = HttpFetch.localize(paths)
    // zip archives: driver-side unpack (reference loads zipped CSVs,
    // tests/test_load.py:983 — archives are sidecar-scale by nature;
    // at data scale use gz/bz2, which Spark's readers stream natively)
    val expanded = localized.flatMap(p => if (rawExtension(p) == "zip") unzip(p) else Seq(p))
    require(expanded.nonEmpty, s"no loadable files (empty zip archive?) in $paths")
    val exts = expanded.map(extensionOf).distinct
    require(exts.size == 1, s"all files in one load must share a format, got $exts")

    // mismatched-shard guard (reference: four raising variants in
    // tests/test_load.py:748-960): parquet without mergeSchema takes
    // the first file's columns and CSV shards silently shift —
    // validate up front, align-union on request
    if (expanded.size > 1) {
      val cheap = csv.copy(inferSchema = false) // names only; no inference scan
      // addMissingColumns must see EVERY shard's columns — a capped
      // probe would silently skip the align-union when the mismatch
      // first appears past the cap, shifting that shard's values
      // into the wrong columns; the caller opted into per-shard
      // schema reads by asking for alignment
      val toCheck = if (addMissingColumns) expanded else expanded.take(validateShardLimit)
      val checked = toCheck
        .map(p => p -> loadOne(spark, Seq(p), cheap, exts.head).columns.toSeq)
      if (checked.map(_._2).distinct.size > 1) {
        if (addMissingColumns)
          return graft.operators.ReshapeOps.concatRows(
            expanded.map(p => loadOne(spark, Seq(p), csv, exts.head)))
        val (p1, c1) = checked.head
        val (p2, c2) = checked.find(_._2 != checked.head._2).get
        throw new IllegalArgumentException(
          s"shards disagree on columns: $p1 has $c1 but $p2 has $c2 — " +
            "fix the shards or pass addMissingColumns=true to align-union with null fill")
      }
    }
    loadOne(spark, expanded, csv, exts.head)
  }

  private def loadOne(spark: SparkSession, paths: Seq[String], csv: CsvOptions, ext: String): DataFrame =
    normalizeNtz(loadOneRaw(spark, paths, csv, ext))

  /** Engine timestamp contract: one timestamp flavor, UTC-normalized
    * `TimestampType`. Parquet files written with naive (not
    * UTC-adjusted) timestamps surface as `TIMESTAMP_NTZ` under Spark
    * 4's default inference; event-time operators (watermarks,
    * `unix_micros`, window functions) require `TIMESTAMP`, so a
    * naive column is reinterpreted here as a UTC instant — the same
    * reading DuckDB/pandas give naive timestamps under a UTC
    * session, which keeps oracle replays bit-identical. Cast is a
    * zero-cost reinterpretation under a UTC session timezone (the
    * session contract set by Verify/Bench).
    */
  def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.TimestampNTZType
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
    if (ntz.isEmpty) df
    else ntz.foldLeft(df) { (d, f) =>
      d.withColumn(f.name, org.apache.spark.sql.functions.col(f.name).cast("timestamp"))
    }
  }

  private def loadOneRaw(spark: SparkSession, paths: Seq[String], csv: CsvOptions, ext: String): DataFrame = {
    ext match {
      case "parquet" => spark.read.parquet(paths: _*)
      case "orc"     => spark.read.orc(paths: _*)
      case "csv" | "tsv" | "txt" =>
        val sep = if (extensionOf(paths.head) == "tsv") "\t" else csv.sep
        var r = spark.read
          .option("sep", sep)
          .option("header", csv.header.toString)
          .option("quote", csv.quote)
          .option("nullValue", csv.nullValue)
          .option("inferSchema", csv.inferSchema.toString)
          .option("encoding", csv.encoding)
        if (csv.comment.nonEmpty) r = r.option("comment", csv.comment)
        var df =
          if (csv.skipRows > 0) {
            // polars skip_rows: drop raw lines from the head of each
            // file BEFORE header parsing. Per-file text read +
            // zipWithIndex keeps the semantics for multi-file loads
            // (metadata sidecars — small file counts by construction).
            import spark.implicits._
            // The text datasource ignores an 'encoding' option, so a
            // non-UTF-8 charset must be decoded explicitly (whole-file
            // per-executor decode — skipRows inputs are small sidecar
            // files by construction).
            val utf8Compat =
              Set("UTF-8", "UTF8", "US-ASCII", "ASCII").contains(csv.encoding.toUpperCase)
            val bodies = paths.map { p =>
              if (utf8Compat)
                spark.read.textFile(p).rdd.zipWithIndex().filter(_._2 >= csv.skipRows).map(_._1)
              else
                spark.sparkContext.binaryFiles(p).flatMap { case (_, pds) =>
                  val in = pds.open()
                  try scala.io.Source.fromInputStream(in, csv.encoding)
                    .getLines().drop(csv.skipRows).toVector.iterator
                  finally in.close()
                }
            }
            val all = bodies.reduce(_ union _).toDS()
            r.csv(all)
          } else r.csv(paths: _*)
        if (csv.newColumns.nonEmpty) {
          require(csv.newColumns.size == df.columns.length,
            s"new_columns has ${csv.newColumns.size} names for ${df.columns.length} columns")
          df = df.toDF(csv.newColumns: _*)
        }
        if (csv.columns.nonEmpty)
          df = df.select(csv.columns.map(org.apache.spark.sql.functions.col): _*)
        if (csv.nullValues.nonEmpty) {
          val extraNulls = csv.nullValues
          df = df.schema.fields.foldLeft(df) { (d, f) =>
            if (f.dataType == org.apache.spark.sql.types.StringType)
              d.withColumn(f.name, org.apache.spark.sql.functions
                .when(org.apache.spark.sql.functions.col(f.name).isin(extraNulls: _*), null)
                .otherwise(org.apache.spark.sql.functions.col(f.name)))
            else d
          }
        }
        csv.nRows.fold(df)(df.limit(_).toDF())
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
      case org.apache.spark.sql.types.TimestampNTZType =>
        // naive timestamp → UTC instant (see normalizeNtz contract)
        df.withColumn(c, org.apache.spark.sql.functions.col(c).cast("timestamp"))
      case _ => df
    }

  /** Literal last extension (no compression stripping). */
  private def rawExtension(path: String): String = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    val i = name.lastIndexOf('.')
    if (i < 0) "parquet" else name.substring(i + 1).toLowerCase
  }

  /** Format dispatch extension: gz/bz2 compression suffixes are
    * stripped (Spark's text-based readers stream those codecs
    * natively — `a.csv.gz` IS a csv file, reference
    * tests/test_load.py:961), and `.feather` aliases to arrow
    * (Feather v2 is the Arrow IPC file format, reference
    * data_files.py:29-38).
    */
  private def extensionOf(path: String): String = {
    val name = path.substring(path.lastIndexOf('/') + 1).toLowerCase
    val base = name.stripSuffix(".gz").stripSuffix(".bz2")
    val i = base.lastIndexOf('.')
    val ext = if (i < 0) "parquet" else base.substring(i + 1)
    if (ext == "feather") "arrow" else ext
  }

  /** Driver-side zip unpack into a temp dir; nested directory
    * entries flatten (reference reads both flat and dir-nested zip
    * CSVs, tests/test_load.py:983-1016). macOS resource forks and
    * hidden entries are skipped.
    */
  private val unzipCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), Seq[String]]()

  /** Cached by (path, size, mtime): repeated loads of the same zip
    * reuse one extraction instead of leaking a fresh temp dir per
    * call for the process lifetime; a rewritten zip (different
    * size/mtime) re-extracts. Extraction dirs are removed on JVM
    * exit (dir registered before its files — deleteOnExit runs in
    * reverse registration order, so files delete first).
    */
  private[sources] def unzip(path: String): Seq[String] = {
    val f = new java.io.File(path)
    unzipCache.computeIfAbsent((f.getAbsolutePath, f.length(), f.lastModified()), _ => doUnzip(path))
  }

  private def doUnzip(path: String): Seq[String] = {
    val dest = java.nio.file.Files.createTempDirectory("graft-unzip").toFile
    dest.deleteOnExit()
    val zf = new java.util.zip.ZipFile(path)
    try {
      import scala.jdk.CollectionConverters._
      zf.entries().asScala
        .filterNot(_.isDirectory)
        .filterNot { e =>
          val n = e.getName
          n.startsWith("__MACOSX") || new java.io.File(n).getName.startsWith(".")
        }
        .map { e =>
          // keep directory structure in the flat name: train/data.csv
          // and test/data.csv must not collide on the basename
          val safe = e.getName.replace('/', '_').replace('\\', '_')
          val out = new java.io.File(dest, safe)
          out.deleteOnExit()
          val in = zf.getInputStream(e)
          try java.nio.file.Files.copy(in, out.toPath)
          finally in.close()
          out.getAbsolutePath
        }
        .toSeq.sorted
    } finally zf.close()
  }

  /** Streaming tabular load — the reference's
    * `load_dataset(..., streaming=True)` for csv/tsv/json/parquet
    * (tests/test_load.py:961,1017) as a Structured Streaming
    * source over a directory. Streaming sources need a fixed
    * schema; when absent it is inferred once from the files already
    * present (one bounded batch read).
    */
  def loadStream(
      spark: SparkSession,
      dir: String,
      format: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      csv: CsvOptions = CsvOptions()
  ): DataFrame = {
    val glob = s"$dir/*.$format"
    val resolved = schema.getOrElse {
      val seed = Option(new java.io.File(dir).listFiles())
        .map(_.toSeq.map(_.getAbsolutePath).filter(_.toLowerCase.endsWith(s".$format")).sorted)
        .getOrElse(Nil)
      require(seed.nonEmpty, s"cannot infer a streaming schema: no *.$format files under $dir yet — pass schema")
      load(spark, Seq(seed.head), csv).schema
    }
    format match {
      case "parquet" => spark.readStream.schema(resolved).parquet(glob)
      case "orc"     => spark.readStream.schema(resolved).orc(glob)
      case "json" | "jsonl" => spark.readStream.schema(resolved).json(glob)
      case "csv" | "tsv" | "txt" =>
        val sep = if (format == "tsv") "\t" else csv.sep
        spark.readStream.schema(resolved)
          .option("sep", sep).option("header", csv.header.toString)
          .option("quote", csv.quote).option("nullValue", csv.nullValue)
          .csv(glob)
      case other => throw new IllegalArgumentException(s"unsupported streaming format: $other")
    }
  }
}
