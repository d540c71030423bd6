package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Training-shard export: the last stage of a data pipeline —
  * materialize a cleaned corpus as a fixed number of
  * deterministically-ordered shards.
  *
  * `repartitionByRange` gives contiguous, globally-sorted key
  * ranges (one range shuffle); `sortWithinPartitions` fixes the
  * order inside each shard; parquet then writes exactly
  * `shardCount` files. Downstream trainers get stable shard
  * boundaries and reproducible sample order — rerunning the
  * pipeline on the same input bytes yields byte-identical shard
  * assignment (modulo parquet metadata).
  */
object ExportOps {

  def writeShards(
      df: DataFrame,
      path: String,
      shardCount: Int,
      orderCols: Seq[String]
  ): Unit = {
    require(orderCols.nonEmpty, "need ordering columns for deterministic shards")
    df.repartitionByRange(shardCount, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Materialize as ONE parquet file at `path` (not a directory) —
    * the reference's single-file dataset layout, which metadata
    * auto-discovery matches by exact basename (`metadata.parquet`
    * beside `data.parquet`). One writer task: only for
    * driver-bounded frames (metadata tables, fixtures); sharded
    * corpora go through [[writeShards]].
    */
  def writeSingleFile(df: DataFrame, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val stage = path + ".__stage__"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val target = new Path(path)
    val fs = target.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    val part = fs.listStatus(new Path(stage))
      .map(_.getPath).find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(s"no part file under $stage"))
    if (fs.exists(target)) fs.delete(target, true)
    fs.rename(part, target)
    fs.delete(new Path(stage), true)
  }

  /** Interleaved (round-robin by hash) sharding — equal-sized
    * shards when the order key is skewed; order within shard still
    * deterministic.
    */
  def writeShardsBalanced(
      df: DataFrame,
      path: String,
      shardCount: Int,
      keyCols: Seq[String]
  ): Unit = {
    df.withColumn("__shard", pmod(xxhash64(keyCols.map(col): _*), lit(shardCount)))
      .repartition(shardCount, col("__shard"))
      .sortWithinPartitions(keyCols.map(col): _*)
      .drop("__shard")
      .write.mode("overwrite").parquet(path)
  }
}
