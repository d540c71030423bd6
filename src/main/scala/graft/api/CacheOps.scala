package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic dataset fingerprinting + disk-backed
  * checkpointing — the Spark-native answer to the reference's
  * transform-chain fingerprint cache (reference:
  * utils/fingerprint.py — HF hashes the dataset state + transform
  * to key its arrow cache files).
  *
  * In Spark the "transform chain" IS the logical plan, so the
  * fingerprint is the plan's semantic hash combined with a hash of
  * the input file listing (path, size, mtime). Two DataFrames with
  * semantically equal plans over identical inputs share a
  * fingerprint — same property HF's fingerprint provides, with no
  * bookkeeping layer.
  */
object CacheOps {

  /** Stable hex fingerprint of (logical plan, input files as
    * (path, size, mtime)) — rewriting an input file in place changes
    * the fingerprint, so a stale checkpoint is never returned.
    */
  def fingerprint(df: DataFrame): String = {
    val planHash = df.queryExecution.analyzed.semanticHash()
    val files = df.queryExecution.analyzed.collectLeaves().flatMap {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.listFiles(Nil, Nil).flatMap(_.files)
              .map(f => s"${f.getPath}:${f.getLen}:${f.getModificationTime}").sorted
          case _ => Nil
        }
      case _ => Nil
    }
    val fileHash = files.foldLeft(17L)((acc, f) => acc * 31 + f.hashCode)
    f"${planHash.toLong & 0xffffffffL}%08x${fileHash & 0xffffffffL}%08x"
  }

  /** Materialize-once: if a parquet checkpoint for this exact
    * (plan, inputs) fingerprint exists under `cacheDir`, read it;
    * otherwise compute, write, and read back. The read-back frame
    * has a flat scan plan — downstream queries reuse the
    * materialization the way the reference reuses its arrow cache
    * files.
    */
  def checkpoint(df: DataFrame, cacheDir: String): DataFrame = {
    val spark = df.sparkSession
    val fp = fingerprint(df)
    val path = s"$cacheDir/graft-cache-$fp"
    // Hadoop FileSystem, not java.io.File: the cache dir is HDFS/S3
    // in any real deployment, where a local-FS probe always misses
    // and every call recomputes + overwrites — silent cache defeat.
    val marker = new org.apache.hadoop.fs.Path(s"$path/_SUCCESS")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(marker)) {
      df.write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }
}
