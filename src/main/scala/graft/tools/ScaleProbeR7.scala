package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 engineering probe (not part of the driver contract):
  * exercise the round-6 surfaces that had never run above sf0.1 —
  * the streaming MinHash-LSH state machine at 100k docs, the PQ
  * index save→append lifecycle under 10 consecutive appends, and
  * the sharded Arrow writer on a 1M-row frame — and print the
  * numbers that say whether their cost curves hold.
  *
  *   sbt "runMain graft.tools.ScaleProbeR7 /root/testdata/sf0.1"
  */
object ScaleProbeR7 {

  private def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.getOrCreate()
    streamingMinhashProbe(spark, nDocs = 50000)
    pqAppendProbe(spark, dir, nAppends = 10)
    arrowWriteDirProbe(spark, nRows = 1000000)
    spark.stop()
  }

  /** 100k rows (50k originals + 50k identical-text twins) through
    * the q_stream_minhash path: file source → band explode →
    * transformWithState on RocksDB → windowed combine → memory
    * sink. Reports wall-clock, state rows, and survivor count
    * (must be exactly the originals).
    */
  def streamingMinhashProbe(spark: SparkSession, nDocs: Int): Unit = {
    val streamDir = java.nio.file.Files.createTempDirectory("probe-stream").toString
    // disjoint vocab: band collisions are structural (iff equal text)
    def synthText(id: org.apache.spark.sql.Column) =
      concat_ws(" ", transform(sequence(lit(0), lit(9)),
        i => concat(lit("tok"), (id * 100 + i).cast("string"))))
    val base = spark.range(nDocs.toLong)
      .select(col("id").as("doc_id"), synthText(col("id")).as("text"),
        expr("timestamp'2024-01-01 00:00:00'").as("ts"))
    val twins = base.select((col("doc_id") + 10000000L).as("doc_id"), col("text"), col("ts"))
    val pusher = spark.range(1).select(lit(99000000L).as("doc_id"),
      lit("zz yy xx ww vv uu").as("text"), expr("timestamp'2024-01-02 00:00:00'").as("ts"))
    base.unionByName(twins).unionByName(pusher)
      .repartition(32).write.mode("overwrite").parquet(streamDir)

    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING, ts TIMESTAMP").parquet(streamDir)
      val kept = graft.streaming.EventStreams.streamingMinhashDedup(
        stream, "doc_id", "text", shingleSize = 3, numHashes = 16,
        watermark = "10 seconds", stateTtlMs = 3600 * 1000L, windowLen = "1 minute")
      val sink = "probe_minhash_" + java.lang.Long.toHexString(System.nanoTime())
      time(s"streamingMinhashDedup ($nDocs docs + $nDocs twins)") {
        val q = kept.writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
          .start()
        try {
          q.processAllAvailable()
          val stateRows = q.recentProgress.flatMap(p => p.stateOperators.map(_.numRowsTotal)).maxOption
          println(s"[probe] minhash stream: batches=${q.recentProgress.length} stateRowsMax=${stateRows.getOrElse(-1L)}")
        } finally q.stop()
      }
      val survivors = spark.table(sink).filter(col("doc_id") < 10000000L).count()
      val twinsKept = spark.table(sink).filter(col("doc_id") >= 10000000L && col("doc_id") < 99000000L).count()
      println(s"[probe] minhash stream survivors=$survivors (expect $nDocs) twinsKept=$twinsKept (expect 0)")
    } finally prev match {
      case Some(v) => spark.conf.set(provKey, v)
      case None    => spark.conf.unset(provKey)
    }
  }

  /** savePqIndex once, then `nAppends` consecutive
    * appendToSavedPqIndex batches; after each append, reload and
    * probe — the numbers to watch are file-count growth in the
    * codes directory (small-file accretion) and probe latency
    * drift across appends.
    */
  def pqAppendProbe(spark: SparkSession, dir: String, nAppends: Int): Unit = {
    import graft.operators.IvfKnnOps
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").select("vec_id", "embedding")
    val n = emb.count()
    val path = java.nio.file.Files.createTempDirectory("probe-pq").toString + "/index"
    val index = time(s"pqBuild ($n vectors)")(
      IvfKnnOps.buildPqIndex(emb, "vec_id", "embedding", nLists = 64, m = 8, maxIter = 5))
    time("pqSave")(IvfKnnOps.savePqIndex(index, path))
    val queries = emb.filter(col("vec_id") < 100)
    def codesFiles(): Int = {
      val p = new org.apache.hadoop.fs.Path(s"$path/codes")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val it = fs.listFiles(p, true)
      var c = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) c += 1 }
      c
    }
    for (a <- 1 to nAppends) {
      val batch = emb.limit(1000)
        .select((col("vec_id") + lit(1000000L * a)).as("vec_id"), col("embedding"))
      time(f"append#$a%02d (1000 rows)")(
        IvfKnnOps.appendToSavedPqIndex(spark, path, batch, "vec_id", "embedding"))
      val loaded = IvfKnnOps.loadPqIndex(spark, path)
      time(f"probe#$a%02d (100 queries, files=${codesFiles()})")(
        IvfKnnOps.pqTopK(queries, loaded, "vec_id", "embedding", 5, nProbe = 8).count())
    }
    // compaction closes the small-file accretion the loop above
    // measures: back to one file per list, rows preserved
    val before = spark.read.parquet(s"$path/codes").count()
    time("compact")(IvfKnnOps.compactSavedPqIndex(spark, path))
    val after = spark.read.parquet(s"$path/codes").count()
    println(s"[probe] post-compact files=${codesFiles()} rows=$after (expect $before)")
    val reloaded = IvfKnnOps.loadPqIndex(spark, path)
    time("probe post-compact (100 queries)")(
      IvfKnnOps.pqTopK(queries, reloaded, "vec_id", "embedding", 5, nProbe = 8).count())
  }

  /** Sharded Arrow export of a 1M-row frame with an embedding-shaped
    * column, then a full read-back — the corpus-export path.
    */
  def arrowWriteDirProbe(spark: SparkSession, nRows: Int): Unit = {
    val df = spark.range(nRows.toLong).select(col("id"),
      concat(lit("doc-"), col("id").cast("string")).as("name"),
      transform(sequence(lit(0), lit(15)), i => (col("id") % 97 + i).cast("double") / 97.0).as("vec"))
      .repartition(32)
    val out = java.nio.file.Files.createTempDirectory("probe-arrow").toString + "/export"
    time(s"arrowWriteDir ($nRows rows, 32 shards)")(
      graft.sources.ArrowIpcWriter.writeDir(df, out))
    val parts = {
      val d = new java.io.File(out)
      d.listFiles.filter(_.getName.endsWith(".arrow")).map(_.getAbsolutePath).sorted
    }
    println(s"[probe] arrow shards=${parts.length}")
    val back = time("arrowReadBack")(
      graft.sources.ArrowIpcReader.read(spark, parts.toIndexedSeq).count())
    println(s"[probe] arrow readBack rows=$back (expect $nRows)")
  }
}
