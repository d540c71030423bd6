package graft.api

import graft.sources.ColumnInference
import org.apache.spark.sql.{DataFrame, SparkSession}



/** Persist / restore a [[LoadDataset.GraftDataset]] — the
  * reference's `save_to_disk` / `load_from_disk` + DatasetDict
  * surface (reference: load.py:269, dataset_dict.py).
  *
  * Layout: one parquet directory per split plus a `graft_info.json`
  * sidecar holding roles, label dictionary, and task type. Parquet
  * keeps the `StructField.metadata` feature annotations on its own;
  * the sidecar carries what schema metadata can't (split names,
  * role assignment, label order). Splits are separate directories
  * so a consumer of only "train" never lists or reads "test" files.
  */
object DatasetIO {

  /** @param format "parquet" (default) or "arrow" — arrow splits
    *   are written as sharded IPC files (one per partition,
    *   [[graft.sources.ArrowIpcWriter.writeDir]]), the layout
    *   HF-style arrow datasets interop with; the sidecar records
    *   the choice so load() needs no hint. StructField.metadata
    *   annotations persist through parquet only — the arrow path
    *   relies on the sidecar for roles/labels/task (IPC schema
    *   metadata is not mapped).
    */
  def save(
      ds: LoadDataset.GraftDataset,
      path: String,
      splits: Map[String, DataFrame] = Map.empty,
      format: String = "parquet"
  ): Unit = {
    require(format == "parquet" || format == "arrow", s"unsupported format $format")
    val all = if (splits.nonEmpty) splits else Map("train" -> ds.df)
    all.foreach { case (name, df) =>
      if (format == "arrow") graft.sources.ArrowIpcWriter.writeDir(df, s"$path/$name")
      else df.write.mode("overwrite").parquet(s"$path/$name")
    }
    val info = renderInfo(ds, all.keys.toSeq.sorted, format)
    // sidecar goes through the Hadoop FS like the split data — a
    // scheme-qualified path (file://, hdfs://, s3a://) must land the
    // sidecar next to its splits, not in a literal "file:" local dir
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(ds.df.sparkSession.sessionState.newHadoopConf())
    fs.mkdirs(root)
    val out = fs.create(new org.apache.hadoop.fs.Path(root, "graft_info.json"), true)
    try out.write(info.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readSplit(spark: SparkSession, dir: String, format: String): DataFrame =
    if (format == "arrow") {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      // the writer's job-commit marker: without it the export died
      // midway and the part files present are an incomplete split
      require(fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")),
        s"arrow split at $dir has no _SUCCESS marker — incomplete export")
      // fully-qualified paths (scheme kept) so hdfs/s3a splits load
      val parts = fs.listStatus(p).map(_.getPath)
        .filter(_.getName.endsWith(".arrow")).map(_.toString).sorted
      graft.sources.ArrowIpcReader.read(spark, parts.toSeq)
    } else spark.read.parquet(dir)

  def load(spark: SparkSession, path: String): (Map[String, DataFrame], LoadDataset.GraftDataset) = {
    val info = {
      val p = new org.apache.hadoop.fs.Path(s"$path/graft_info.json")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val in = fs.open(p)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    val splits = strListField(info, "splits")
    val format = strField(info, "format").getOrElse("parquet")
    val frames = splits.map(s => s -> readSplit(spark, s"$path/$s", format)).toMap
    val primary = frames.getOrElse("train", frames.values.head)
    val roles = ColumnInference.Roles(
      strField(info, "sample_column"),
      strField(info, "batch_column"),
      strField(info, "target_column"),
      strListField(info, "metadata_columns"),
      strListField(info, "data_columns")
    )
    val task = strField(info, "task").map {
      case "regression" => ColumnInference.Regression
      case _            => ColumnInference.Classification
    }
    (frames, LoadDataset.GraftDataset(primary, roles, strListField(info, "labels"), task))
  }

  // minimal JSON (flat schema, controlled keys — no library dependency)
  private def renderInfo(ds: LoadDataset.GraftDataset, splits: Seq[String], format: String = "parquet"): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def arr(xs: Seq[String]) = xs.map(q).mkString("[", ",", "]")
    def opt(o: Option[String]) = o.map(q).getOrElse("null")
    val task = ds.task.map {
      case ColumnInference.Regression     => "regression"
      case ColumnInference.Classification => "classification"
    }
    s"""{
       |  "format": ${q(format)},
       |  "splits": ${arr(splits)},
       |  "sample_column": ${opt(ds.roles.sampleColumn)},
       |  "batch_column": ${opt(ds.roles.batchColumn)},
       |  "target_column": ${opt(ds.roles.targetColumn)},
       |  "metadata_columns": ${arr(ds.roles.metadataColumns)},
       |  "data_columns": ${arr(ds.roles.dataColumns)},
       |  "labels": ${arr(ds.labelNames)},
       |  "task": ${task.map(q).getOrElse("null")}
       |}""".stripMargin
  }

  private def strField(json: String, key: String): Option[String] = {
    val m = ("\"" + key + "\":\\s*(null|\"((?:[^\"\\\\]|\\\\.)*)\")").r.findFirstMatchIn(json)
    m.flatMap(g => Option(g.group(2))).map(_.replace("\\\"", "\"").replace("\\\\", "\\"))
  }

  private def strListField(json: String, key: String): Seq[String] = {
    val m = ("\"" + key + "\":\\s*\\[([^\\]]*)\\]").r.findFirstMatchIn(json)
    m.map(_.group(1)).filter(_.trim.nonEmpty).toSeq.flatMap { body =>
      "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(body).map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
    }
  }
}
