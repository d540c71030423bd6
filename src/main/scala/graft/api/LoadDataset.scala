package graft.api

import graft.operators.{LabelOps, MetadataOps, ReshapeOps, SplitOps}
import graft.sources.{BioLoader, ColumnInference}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder

/** The user-facing load path — graft's equivalent of the
  * reference's `load_dataset(...)` (reference: load.py:58-253,
  * biodata.py:538 BioData builder).
  *
  * What the reference does imperatively over Arrow tables, this
  * declares as one Catalyst plan: multi-format read → broadcast
  * sample-metadata join → feature-metadata schema annotation →
  * role inference → label encode/binarize → (optional) transpose.
  * Nothing materializes until the caller acts on the DataFrame.
  */
object LoadDataset {

  /** Experiment type → (input feature type tag, storage dtype) —
    * reference: packaged_modules/{metagenomics/otu.py,genomics/
    * snp.py,proteomics/maldi.py} INPUT_FEATURE and
    * features/omics.py dtypes.
    */
  val ExperimentFeatureTypes: Map[String, (String, String)] = Map(
    "otu" -> ("Abundance", "long"),
    "metagenomics" -> ("Abundance", "long"),
    "snp" -> ("GenomicVariant", "byte"),
    "genomics" -> ("GenomicVariant", "byte"),
    "maldi" -> ("PeakIntensity", "float"),
    "proteomics" -> ("PeakIntensity", "float"),
    "rna" -> ("ReadCount", "long"),
    "kmer" -> ("KmerCount", "long"),
    "biodata" -> ("ValueWithMetadata", "double")
  )

  final case class Config(
      dataFiles: Seq[String],
      sampleMetadataFiles: Seq[String] = Nil,
      featureMetadataFiles: Seq[String] = Nil,
      experimentType: String = "biodata",
      sampleColumn: Option[String] = None,
      batchColumn: Option[String] = None,
      targetColumn: Option[String] = None,
      metadataColumns: Seq[String] = Nil,
      labels: Seq[String] = Nil,
      positiveLabels: Seq[String] = Nil,
      negativeLabels: Seq[String] = Nil,
      encodeLabels: Boolean = true,
      rowsAreFeatures: Boolean = false,
      columns: Seq[String] = Nil,
      zeroAsMissing: Boolean = false,
      dropUnmatchedSamples: Boolean = false,
      autoDiscoverMetadata: Boolean = true
  )

  /** Metadata-file auto-discovery by conventional filenames —
    * reference: data_files.py:15-45 (_SAMPLE_METADATA_NAMES ×
    * extensions, searched beside the data). Returns (sample
    * metadata files, feature metadata files) found under `dir`.
    */
  def discoverMetadata(dir: String): (Seq[String], Seq[String]) = {
    val sampleNames = Seq("metadata", "sample_metadata", "sample", "samples")
    val featureNames = Seq("feature_metadata", "feature", "features", "annotation", "annotations")
    val exts = Seq("csv", "tsv", "txt", "json", "jsonl", "parquet", "arrow")
    val files = walkFiles(dir)
    def find(names: Seq[String]): Seq[String] = {
      val wanted = (for (n <- names; e <- exts) yield s"$n.$e").toSet
      files.filter(f => wanted.contains(f.name.toLowerCase)).map(_.path).sorted
    }
    (find(sampleNames), find(featureNames))
  }

  /** Canonical split → filename keywords — reference
    * data_files.py:141-185 builds its split patterns from the HF
    * SPLIT_KEYWORDS table; a keyword counts only when delimited by
    * non-word characters (so "validation" never matches "val"
    * mid-word, and "training" matches as its own keyword).
    */
  private val splitKeywords: Seq[(String, Seq[String])] = Seq(
    "train" -> Seq("train", "training"),
    "validation" -> Seq("validation", "valid", "dev", "val"),
    "test" -> Seq("test", "testing", "eval", "evaluation")
  )

  private def keywordMatch(name: String, kw: String): Boolean =
    s"(?:^|[^a-z0-9])${java.util.regex.Pattern.quote(kw)}(?:[^a-z0-9]|$$)".r
      .findFirstIn(name.toLowerCase).isDefined

  private def splitOf(fileName: String): Option[String] = {
    val base = fileName.substring(0, math.max(fileName.lastIndexOf('.'), 0)).toLowerCase
    splitKeywords.collectFirst { case (split, kws) if kws.exists(keywordMatch(base, _)) => split }
  }

  private val dataExtensions =
    Set("csv", "tsv", "txt", "json", "jsonl", "parquet", "orc", "arrow", "feather", "npz", "zip")

  /** Dispatch extension matching BioLoader's: gz/bz2 compression
    * suffixes stripped (a.csv.gz IS a csv), so compressed shards are
    * visible to split discovery exactly where load() accepts them.
    */
  private def dataExtensionOf(name: String): String = {
    val n = name.toLowerCase
    val base = n.stripSuffix(".gz").stripSuffix(".bz2")
    base.substring(base.lastIndexOf('.') + 1)
  }

  /** Metadata classification mirrors the reference's caution: exact
    * conventional basenames, or a DELIMITED "metadata"/"annotation"
    * token (split-scoped `train-metadata.csv`). Bare "sample(s)"/
    * "feature(s)" tokens inside longer names do NOT count — the
    * reference skips those fuzzy patterns precisely so a data file
    * like `train-samples_1.csv` (tests/test_load.py:715) stays data.
    */
  private val metadataBaseRe =
    ("^(metadata|sample[-._ ]metadata|sample|samples|feature[-._ ]metadata|feature|features|" +
      "annotation|annotations)([-._ ][0-9]+)*$").r

  private def isMetadataFile(name: String): Boolean = {
    val base = name.substring(0, math.max(name.lastIndexOf('.'), 0)).toLowerCase
    metadataBaseRe.findFirstIn(base).isDefined ||
      keywordMatch(base, "metadata") ||
      keywordMatch(base, "annotation") || keywordMatch(base, "annotations")
  }

  /** One discovered file: normalized path string (plain local path
    * for file-scheme, full URI otherwise), basename, immediate
    * parent directory's name, and whether that parent IS the
    * user-supplied root (split inference must never consult the
    * root's own name — a data_dir called `test_data` is not a test
    * split; the reference's KEYWORDS_IN_DIR_NAME patterns only
    * match subdirectories inside the data dir).
    */
  private[api] final case class DiscoveredFile(
      path: String, name: String, parentName: String, parentIsRoot: Boolean)

  /** Recursive file walk through the Hadoop FileSystem API, so
    * discovery works on any scheme BioLoader.load can read
    * (HDFS/S3/file), not just the driver's local disk — a
    * java.io.File walk silently finds nothing on remote stores and
    * loadSplitsAuto would fail with "no data files discovered"
    * even though the paths are readable.
    */
  private def walkFiles(dir: String): Seq[DiscoveredFile] = {
    import org.apache.hadoop.fs.Path
    // activeSession is THREAD-local — from a Future/pool thread it is
    // unset even when a session exists, and a bare Configuration()
    // would lose fs.s3a credentials; fall through to defaultSession
    val conf = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root) || !fs.getFileStatus(root).isDirectory) return Nil
    val rootQ = fs.makeQualified(root)
    def norm(p: Path): String = {
      val u = p.toUri
      if (u.getScheme == null || u.getScheme == "file") u.getPath else p.toString
    }
    val out = scala.collection.mutable.ArrayBuffer[DiscoveredFile]()
    val it = fs.listFiles(rootQ, /* recursive = */ true)
    while (it.hasNext) {
      val p = it.next().getPath
      out += DiscoveredFile(norm(p), p.getName, p.getParent.getName, p.getParent == rootQ)
    }
    out.toSeq
  }

  /** Infer split membership from filename patterns (reference
    * data_files.py:141-185, tests/test_load.py:715
    * `train-samples_1.csv` / `test-samples_2.csv`): a delimited
    * split keyword in the basename or the parent directory name
    * assigns the file; keyword-free data files default to "train"
    * (HF's single-split convention). Metadata/annotation sidecars
    * are excluded — they ride [[discoverMetadata]] /
    * [[discoverSplitMetadata]].
    */
  def discoverSplits(dir: String): Map[String, Seq[String]] = {
    val data = walkFiles(dir).filter { f =>
      dataExtensions.contains(dataExtensionOf(f.name)) && !isMetadataFile(f.name)
    }
    data.groupBy { f =>
      splitOf(f.name)
        // only directory names STRICTLY BELOW the data dir carry
        // split meaning — the root's own name must not (a dir
        // called `eval` would otherwise swallow every file as test)
        .orElse(if (f.parentIsRoot) None else splitOf(f.parentName + "."))
        .getOrElse("train")
    }.map { case (s, fs) => s -> fs.map(_.path).sorted.toSeq }
  }

  /** Split-scoped metadata discovery (reference
    * DEFAULT_SAMPLE_METADATA_PATTERNS_SPLIT_IN_FILENAME,
    * data_files.py:144-151): a metadata file whose name carries a
    * delimited split keyword (`train-metadata.csv`,
    * `sample_metadata_test.tsv`) binds to that split only; returns
    * split → (sample metadata files, feature metadata files).
    * Keyword-free metadata stays shared via [[discoverMetadata]].
    */
  def discoverSplitMetadata(dir: String): Map[String, (Seq[String], Seq[String])] = {
    val metaFiles = walkFiles(dir).filter { f =>
      dataExtensions.contains(dataExtensionOf(f.name)) && isMetadataFile(f.name)
    }
    val tagged = metaFiles.flatMap(f => splitOf(f.name).map(s => (s, f)))
    tagged.groupBy(_._1).map { case (s, fs) =>
      val (feat, samp) = fs.map(_._2).partition(f => {
        val b = f.name.toLowerCase
        b.contains("feature") || b.contains("annotation")
      })
      s -> (samp.map(_.path).sorted.toSeq, feat.map(_.path).sorted.toSeq)
    }
  }

  /** Directory in, split datasets out: [[discoverSplits]] for the
    * data files, [[discoverSplitMetadata]] for split-scoped
    * sidecars, then the shared-label-dictionary multi-split load —
    * the reference's `load_dataset("csv", data_dir=...)` shape
    * (tests/test_load.py:715).
    */
  def loadSplitsAuto(spark: SparkSession, dir: String, config: Config = Config(Nil)): Map[String, GraftDataset] = {
    val splits = discoverSplits(dir)
    require(splits.nonEmpty, s"no data files discovered under $dir")
    val metaBySplit = discoverSplitMetadata(dir)
    // metadata-ish files with NO split keyword are shared across
    // splits — including fuzzy names (`annotation_v2.csv`) that the
    // exact-filename convention in load()'s own discovery would
    // miss; otherwise they'd be excluded from data here yet
    // collected by nothing (silently dropped)
    val (sharedSample, sharedFeature) = {
      val untagged = walkFiles(dir).filter { f =>
        dataExtensions.contains(dataExtensionOf(f.name)) &&
          isMetadataFile(f.name) && splitOf(f.name).isEmpty
      }
      val (feat, samp) = untagged.partition { f =>
        val b = f.name.toLowerCase
        b.contains("feature") || b.contains("annotation")
      }
      (samp.map(_.path).sorted, feat.map(_.path).sorted)
    }
    val perSplit = splits.map { case (name, files) =>
      val (sm, fm) = metaBySplit.getOrElse(name, (Nil, Nil))
      name -> load(spark, config.copy(
        dataFiles = files,
        sampleMetadataFiles =
          if (config.sampleMetadataFiles.nonEmpty) config.sampleMetadataFiles
          else if (sm.nonEmpty) sm else sharedSample,
        featureMetadataFiles =
          if (config.featureMetadataFiles.nonEmpty) config.featureMetadataFiles
          else if (fm.nonEmpty) fm else sharedFeature,
        encodeLabels = false))
    }
    shareLabelEncoding(perSplit, config)
  }

  final case class GraftDataset(
      df: DataFrame,
      roles: ColumnInference.Roles,
      labelNames: Seq[String],
      task: Option[ColumnInference.TaskType]
  ) {
    /** Deterministic hash-bucket split — Map(split name → frame). */
    def trainTestSplit(testFraction: Double, seed: Long = 42L): Map[String, DataFrame] = {
      val keys = roles.sampleColumn.map(Seq(_)).getOrElse(df.columns.toSeq)
      val tagged = SplitOps.trainTestSplit(df, keys, testFraction, seed)
      Map(
        "train" -> tagged.filter(col("split") === "train").drop("split"),
        "test" -> tagged.filter(col("split") === "test").drop("split")
      )
    }

    // ---- role accessors (reference arrow_dataset.py get_* family:
    //      get_sample_col_name/get_data/get_sample_metadata/
    //      get_target/get_feature_metadata) ----

    /** Data (feature) columns, prefixed by the sample column when
      * present — reference `get_data`.
      */
    def getData: DataFrame =
      df.select((roles.sampleColumn.toSeq ++ roles.dataColumns).map(col): _*)

    /** Sample + batch + metadata columns — reference
      * `get_sample_metadata`.
      */
    def getSampleMetadata: DataFrame = {
      val cols = (roles.sampleColumn.toSeq ++ roles.batchColumn.toSeq ++ roles.metadataColumns).distinct
      df.select(cols.map(col): _*)
    }

    /** Target column (+ encoded form when present) keyed by sample —
      * reference `get_target`.
      */
    def getTarget: DataFrame = {
      val enc = if (df.columns.contains(LabelOps.TargetColumn)) Seq(LabelOps.TargetColumn) else Nil
      val cols = (roles.sampleColumn.toSeq ++ roles.targetColumn.toSeq ++ enc).distinct
      df.select(cols.map(col): _*)
    }

    /** Per-feature metadata map recovered from StructField.metadata
      * — reference `get_feature_metadata`. Values are rendered per
      * key: strings verbatim, everything else (arrays, numbers,
      * nested objects) as that KEY'S compact json — never the whole
      * metadata blob.
      */
    def getFeatureMetadata: Map[String, Map[String, String]] = {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      df.schema.fields.flatMap { f =>
        JsonMethods.parse(f.metadata.json) match {
          case JObject(fields) if fields.nonEmpty =>
            Some(f.name -> fields.map {
              case (k, JString(s)) => k -> s
              case (k, v)          => k -> JsonMethods.compact(JsonMethods.render(v))
            }.toMap)
          case _ => None
        }
      }.toMap
    }

    // ---- HF Dataset ops with no direct DataFrame spelling ----

    /** Positional row selection (reference `select(indices)`):
      * stable row index via zipWithIndex, then a semi join against
      * the index set — distributed, no collect. Order of `df` is
      * its current order; sort first for determinism.
      */
    def selectRows(indices: Seq[Long]): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val indexed = graft.operators.ReshapeOps.withRowIndex(df, "__idx")
      val wanted = indices.toDF("__idx")
      indexed.join(org.apache.spark.sql.functions.broadcast(wanted), Seq("__idx"), "left_semi").drop("__idx")
    }

    /** Append a single row given as (column → value) — reference
      * `add_item`. Missing columns null-filled; types must line up.
      */
    def addItem(item: Map[String, Any]): DataFrame = {
      val row = org.apache.spark.sql.Row.fromSeq(df.columns.toSeq.map(c => item.getOrElse(c, null)))
      val one = df.sparkSession.createDataFrame(
        java.util.Collections.singletonList(row), df.schema)
      df.unionByName(one)
    }

    /** Cast one column — reference `cast_column`. */
    def castColumn(name: String, to: org.apache.spark.sql.types.DataType): DataFrame =
      df.withColumn(name, col(name).cast(to))

    // ---- the remaining HF Dataset op surface (arrow_dataset.py):
    //      thin DataFrame delegations, present so a reference user
    //      finds every operator under the same names ----

    /** Reference `rename_column`. */
    def renameColumn(from: String, to: String): DataFrame = df.withColumnRenamed(from, to)

    /** Reference `remove_columns`. */
    def removeColumns(names: String*): DataFrame = df.drop(names: _*)

    /** Reference `sort` (ascending per column; wrap in desc()
      * upstream for descending).
      */
    def sortBy(cols: String*): DataFrame = df.orderBy(cols.map(col): _*)

    /** Reference `unique(column)` — distinct values of one column. */
    def unique(column: String): DataFrame = df.select(column).distinct()

    /** Reference `shuffle(seed)` — deterministic, see
      * [[graft.operators.SplitOps.deterministicShuffle]].
      */
    def shuffle(seed: Long = 42L): DataFrame =
      SplitOps.deterministicShuffle(df,
        roles.sampleColumn.map(Seq(_)).getOrElse(df.columns.toSeq), seed)

    /** Reference `flatten` — nested structs to dotted top-level
      * columns, see [[ReshapeOps.flattenStructs]].
      */
    def flatten: DataFrame = ReshapeOps.flattenStructs(df)

    /** Inverse of class encoding — encoded int codes back to label
      * names (reference arrow_dataset.py:197 `decode`): code i →
      * labelNames(i); -1 and out-of-range codes → null. Inline
      * literal map, zero shuffle (the dictionary is
      * class-count-sized, same bound as the encode side).
      */
    def decode(outputCol: String = "decoded_labels"): DataFrame = {
      require(labelNames.nonEmpty, "decode needs a label dictionary (labelNames is empty)")
      require(df.columns.contains(LabelOps.TargetColumn),
        s"decode needs the ${LabelOps.TargetColumn} column")
      val m = org.apache.spark.sql.functions.typedLit(
        labelNames.zipWithIndex.map { case (l, i) => i -> l }.toMap)
      df.withColumn(outputCol,
        org.apache.spark.sql.functions.element_at(m, col(LabelOps.TargetColumn).cast("int")))
    }

    /** Arbitrary batched row transform — reference `map(batched=
    * True)`. Only for logic genuinely inexpressible as columns
    * (prefer select/withColumn: they stay in codegen and keep
    * pushdown); the function sees partition-sized batches, the
    * Spark analogue of the reference's batch dict → batch dict.
    */
    def mapBatches(outSchema: org.apache.spark.sql.types.StructType)(
        fn: Iterator[org.apache.spark.sql.Row] => Iterator[org.apache.spark.sql.Row]): DataFrame =
      df.sparkSession.createDataFrame(df.rdd.mapPartitions(fn), outSchema)

  }

  /** Multi-split load (the reference's DataFilesDict: split name →
    * files). The label dictionary is computed over ALL splits and
    * shared, so "test" rows encode against the same codes as
    * "train" — the invariant the reference enforces by demanding
    * explicit labels for multi-file loads (biodata.py:1006-1022).
    */
  def loadSplits(spark: SparkSession, splitFiles: Map[String, Seq[String]], config: Config): Map[String, GraftDataset] = {
    require(splitFiles.nonEmpty, "no splits given")
    val perSplit = splitFiles.map { case (name, files) =>
      name -> load(spark, config.copy(dataFiles = files, encodeLabels = false))
    }
    shareLabelEncoding(perSplit, config)
  }

  private def shareLabelEncoding(perSplit: Map[String, GraftDataset], config: Config): Map[String, GraftDataset] = {
    val tc = perSplit.values.head.roles.targetColumn
    val needEncode = config.encodeLabels && tc.isDefined &&
      config.positiveLabels.isEmpty && config.negativeLabels.isEmpty &&
      perSplit.values.head.task.contains(ColumnInference.Classification)
    if (!needEncode) perSplit
    else {
      val dict =
        if (config.labels.nonEmpty) config.labels
        else {
          val union = perSplit.values.map(_.df.select(col(tc.get).cast("string"))).reduce(_.unionByName(_))
          LabelOps.labelDictionary(union, tc.get)
        }
      perSplit.map { case (name, ds) =>
        name -> ds.copy(df = LabelOps.classEncodeWith(ds.df, tc.get, dict), labelNames = dict)
      }
    }
  }

  def load(spark: SparkSession, config0: Config): GraftDataset = {
    // fill missing metadata files by directory convention, like the
    // reference does on every load (biodata.py:230-252)
    val config =
      if (!config0.autoDiscoverMetadata ||
        (config0.sampleMetadataFiles.nonEmpty && config0.featureMetadataFiles.nonEmpty)) config0
      else {
        val dirs = config0.dataFiles.map(p => new java.io.File(p).getParent).distinct
        val (sm, fm) = dirs.map(discoverMetadata).foldLeft((Seq.empty[String], Seq.empty[String])) {
          case ((a, b), (s, f)) => (a ++ s, b ++ f)
        }
        config0.copy(
          sampleMetadataFiles = if (config0.sampleMetadataFiles.nonEmpty) config0.sampleMetadataFiles else sm,
          featureMetadataFiles = if (config0.featureMetadataFiles.nonEmpty) config0.featureMetadataFiles else fm
        )
      }
    var df = BioLoader.load(spark, config.dataFiles)
    if (config.rowsAreFeatures) {
      // reference biodata.py:180 rows_are_features: first column is
      // the feature name axis in feature-major files
      df = ReshapeOps.transpose(df, df.columns.head)
    }
    if (config.columns.nonEmpty) df = df.select(config.columns.map(col): _*)

    // sample metadata: keyed broadcast join when a shared sample
    // column exists; else positional concat (biodata.py:897-972)
    if (config.sampleMetadataFiles.nonEmpty) {
      val meta = BioLoader.load(spark, config.sampleMetadataFiles)
      val metaRoles = ColumnInference.inferRoles(meta, config.sampleColumn)
      val joinKey = metaRoles.sampleColumn.filter(df.columns.contains)
      df = joinKey match {
        case Some(k) =>
          val joined = MetadataOps.joinSampleMetadata(df, meta, k)
          // reference `drop_samples`: discard data rows without a
          // metadata match instead of null-filling their metadata
          if (config.dropUnmatchedSamples)
            joined.join(broadcast(meta.select(col(k))), Seq(k), "left_semi")
          else joined
        case None =>
          ReshapeOps.concatColumns(df, meta, df.columns.toSeq.take(1), meta.columns.toSeq.take(1))
      }
    }

    // feature metadata → StructField.metadata annotation (the
    // reference's feature_metadata table, biodata.py:707/1200)
    if (config.featureMetadataFiles.nonEmpty) {
      val fm = BioLoader.load(spark, config.featureMetadataFiles)
      val nameCol = fm.columns.head
      val kv = fm.collect().map { r =>
        val name = Option(r.get(0)).map(_.toString).getOrElse("")
        name -> fm.columns.tail.map(c => c -> Option(r.getAs[Any](c)).map(_.toString).getOrElse("")).toMap
      }.toMap
      df = MetadataOps.attachFeatureMetadata(df, kv)
    }

    val roles = ColumnInference.inferRoles(
      df, config.sampleColumn, config.batchColumn, config.targetColumn, config.metadataColumns)

    // tag data columns with the experiment's feature type
    val (featType, _) = ExperimentFeatureTypes.getOrElse(config.experimentType, ("ValueWithMetadata", "double"))
    if (roles.dataColumns.nonEmpty) {
      val cols = df.schema.fields.map { f =>
        if (roles.dataColumns.contains(f.name)) {
          val mb = new MetadataBuilder().withMetadata(f.metadata).putString("graft.featureType", featType)
          col(f.name).as(f.name, mb.build())
        } else col(f.name)
      }
      df = df.select(cols.toIndexedSeq: _*)
    }

    // zero_as_missing (biodata.py:183): zeros in sparse omics data
    // mean "not measured" — null them in every data column
    if (config.zeroAsMissing) {
      roles.dataColumns.foreach(c => df = graft.operators.FilterOps.zeroAsMissing(df, c))
    }

    // labels (biodata.py:821-895/974-1035)
    var labelNames = config.labels
    var task: Option[ColumnInference.TaskType] = None
    roles.targetColumn.foreach { tc =>
      task = Some(ColumnInference.inferTask(df, tc))
      if (config.positiveLabels.nonEmpty || config.negativeLabels.nonEmpty) {
        df = LabelOps.binarize(df, tc, LabelOps.BinarizeSpec(config.positiveLabels, config.negativeLabels))
        if (labelNames.isEmpty) labelNames = Seq("negative", "positive")
        // reference attaches BinClassLabel feature metadata to the
        // encoded column (features/targets.py: _type/positive_labels/
        // negative_labels/names) — carried in StructField.metadata so
        // it round-trips through DatasetIO.save
        df = tagTargetMetadata(df, "BinClassLabel", labelNames,
          Map("graft.positiveLabels" -> config.positiveLabels,
              "graft.negativeLabels" -> config.negativeLabels))
      } else if (config.encodeLabels && task.contains(ColumnInference.Classification)) {
        if (labelNames.nonEmpty) df = LabelOps.classEncodeWith(df, tc, labelNames)
        else {
          labelNames = LabelOps.labelDictionary(df, tc)
          df = LabelOps.classEncodeWith(df, tc, labelNames)
        }
        df = tagTargetMetadata(df, "ClassLabel", labelNames, Map.empty)
      }
    }

    GraftDataset(df, roles, labelNames, task)
  }

  /** Attach the reference's target feature-type metadata to the
    * encoded-labels column (features/targets.py BinClassLabel /
    * ClassLabel analogue).
    */
  private def tagTargetMetadata(
      df: DataFrame,
      featureType: String,
      names: Seq[String],
      extra: Map[String, Seq[String]]
  ): DataFrame = {
    if (!df.columns.contains(LabelOps.TargetColumn)) return df
    val cols = df.schema.fields.map { f =>
      if (f.name == LabelOps.TargetColumn) {
        var mb = new MetadataBuilder().withMetadata(f.metadata)
          .putString("graft.featureType", featureType)
          .putStringArray("graft.names", names.toArray)
        extra.foreach { case (k, v) => mb = mb.putStringArray(k, v.toArray) }
        col(f.name).as(f.name, mb.build())
      } else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
