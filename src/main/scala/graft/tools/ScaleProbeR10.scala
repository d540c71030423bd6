package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators._

/** Round-10 probes:
  *
  *   1. Batch ER at the r9 OOM boundary — 2M records / 676 blocks of
  *      ~3000 (≈3G candidate pairs) — UNDER the new `maxBlockSize`
  *      cap: every block exceeds the cap, so the pair join must
  *      complete in seconds with zero pairs and the overflow report
  *      must surface all 676 blocks (r9 recorded this exact shape
  *      OOMing the CC edge checkpoint without the cap).
  *   2. Same shape with SELECTIVE keys mixed in: capped blocks drop,
  *      selective blocks still match end-to-end through CC.
  *   3. Louvain contraction at 2M-edge scale: LPA-seeded refinement
  *      completes with bounded rounds; the contraction's big-frame
  *      cost is ONE und-mapped fold.
  *
  * Run: `sbt "runMain graft.tools.ScaleProbeR10"`. Findings →
  * SCALEPROBE_r10.md.
  */
object ScaleProbeR10 {

  private def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    if (args.contains("--tfrecord-only")) tfRecordBigShard(spark)
    else {
      cappedBoundaryEr(spark)
      cappedSelectiveEr(spark)
      louvainContractionScale(spark)
      if (args.contains("--tfrecord")) tfRecordBigShard(spark)
    }
    spark.stop()
  }

  /** Probe 4: a single >2 GiB TFRecord shard — the shape
    * `binaryFile` hard-fails on (2 GiB array ceiling) and the r10
    * streaming reader must stream with one-record peak memory.
    * Writes ~2.2 GiB of 2 MiB binary records, reads them back
    * CRC-verified, checks count + sampled payload integrity.
    */
  def tfRecordBigShard(spark: SparkSession): Unit = {
    import org.apache.spark.sql.types._
    val dir = "/tmp/graft_probe_tfr_big"
    val recBytes = 2 << 20 // 2 MiB payload per record
    val nRecs = 1100 // ~2.2 GiB total
    val schema = StructType(Seq(StructField("id", LongType), StructField("payload", BinaryType)))
    time(s"write 1 shard: $nRecs x 2MiB = ${nRecs.toLong * recBytes / (1L << 30)}+ GiB") {
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
      val out = new java.io.BufferedOutputStream(
        fs.create(new org.apache.hadoop.fs.Path(dir, "part-00000.tfrecord"), true), 1 << 20)
      val base = new Array[Byte](recBytes)
      try {
        var i = 0L
        while (i < nRecs) {
          // deterministic per-record payload: first 8 bytes carry the id
          java.nio.ByteBuffer.wrap(base).putLong(0, i)
          out.write(frame(graft.sources.TfRecordIO.exampleBytes(
            org.apache.spark.sql.Row(i, base), schema)))
          i += 1
        }
      } finally out.close()
    }
    val n = time("stream-read the >2GiB shard (binaryFile would throw)") {
      graft.sources.TfRecordIO.read(spark, dir, schema)
        .select(col("id"), length(col("payload")).as("len"))
        .agg(count(lit(1)), sum(col("len")), countDistinct(col("id"))).head()
    }
    println(s"[probe]   rows=${n.getLong(0)} bytes=${n.getLong(1)} distinct=${n.getLong(2)} " +
      s"(expect $nRecs / ${nRecs.toLong * recBytes} / $nRecs)")
    new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
  }

  private def frame(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 16)
    val lenBytes = new Array[Byte](8)
    var l = data.length.toLong
    var i = 0
    while (i < 8) { lenBytes(i) = (l & 0xFF).toByte; l >>>= 8; i += 1 }
    out.write(lenBytes)
    writeU32le(out, graft.sources.TfRecordIO.maskedCrc(lenBytes, 0, 8))
    out.write(data)
    writeU32le(out, graft.sources.TfRecordIO.maskedCrc(data, 0, data.length))
    out.toByteArray
  }

  private def writeU32le(out: java.io.OutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
    out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
  }

  /** The r9 OOM shape, now bounded: 676 two-letter blocks x ~3000
    * members. With maxBlockSize=1000 every block drops wholesale —
    * the run must finish fast and report all 676.
    */
  def cappedBoundaryEr(spark: SparkSession): Unit = {
    val letters = "abcdefghijklmnopqrstuvwxyz"
    val df = spark.range(2000000L).select(
      col("id"),
      concat(
        // 676 non-selective block keys: (id % 676) -> two letters
        element_at(lit(letters.split("").map(_.toString)), (pmod(col("id"), lit(676L)) / 26L).cast("int") + 1),
        element_at(lit(letters.split("").map(_.toString)), pmod(pmod(col("id"), lit(676L)), lit(26L)).cast("int") + 1),
        lit(" entity "), (col("id") / 676L).cast("string")).as("name"))
    val pairs = time("capped ER boundary: 2M recs / 676 blocks of ~3000, cap=1000") {
      FuzzyJoinOps.fuzzyJoinJaro(
        df.select(col("id").as("id_a"), col("name").as("name_a")),
        df.select(col("id").as("id_b"), col("name").as("name_b")),
        "name_a", "name_b", minSim = 0.95, blockPrefix = 2, maxBlockSize = 1000)
        .filter(col("id_a") < col("id_b"))
        .count()
    }
    println(s"[probe]   pairs: $pairs (expected 0 — every block over cap)")
    val reported = time("overflow report over the same shape") {
      FuzzyJoinOps.jaroBlockOverflowReport(
        df.select(col("name").as("name_a")), df.select(col("name").as("name_b")),
        "name_a", "name_b", blockPrefix = 2, maxBlockSize = 1000).count()
    }
    println(s"[probe]   over-cap blocks: $reported (expected 676)")
  }

  /** Hot blocks under cap + selective tail that must still resolve. */
  def cappedSelectiveEr(spark: SparkSession): Unit = {
    val hot = spark.range(500000L).select(
      col("id"), concat(lit("xx hot "), (col("id") % 5L).cast("string")).as("name"))
    val sel = spark.range(1000L).select(
      (col("id") + 10000000L).as("id"),
      concat(lit("y"), (col("id") % 26L + 97L).cast("int").cast("char(1)"),
        lit(" firm "), (col("id") / 2L).cast("string")).as("name"))
    val df = hot.unionAll(sel)
    val resolved = time("capped ER selective tail: 0.5M hot-block + 1k selective") {
      val pairs = FuzzyJoinOps.fuzzyJoinJaro(
        df.select(col("id").as("id_a"), col("name").as("name_a")),
        df.select(col("id").as("id_b"), col("name").as("name_b")),
        "name_a", "name_b", minSim = 0.95, blockPrefix = 2, maxBlockSize = 10000)
        .filter(col("id_a") < col("id_b"))
      GraphOps.connectedComponents(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst"))).count()
    }
    println(s"[probe]   clustered endpoints: $resolved (selective families only)")
  }

  /** LPA-seeded Louvain contraction at synthetic 2M-edge scale. */
  def louvainContractionScale(spark: SparkSession): Unit = {
    // ring-of-cliques: 100k cliques of 6 (planted communities) plus
    // ring bridges — 1.6M edges
    val k = 6L
    val cliqueEdges = spark.range(100000L * k).select((col("id") / k).as("c"), pmod(col("id"), lit(k)).as("i"))
      .join(spark.range(k).select(col("id").as("j")), col("j") > col("i"))
      .select((col("c") * k + col("i")).as("src"), (col("c") * k + col("j")).as("dst"))
    val bridges = spark.range(100000L).select(
      (col("id") * k).as("src"), (pmod(col("id") + 1L, lit(100000L)) * k).as("dst"))
    val edges = cliqueEdges.unionAll(bridges)
    val q = time("louvain contraction: 100k cliques / 1.6M edges, LPA3 seed + 4 refine") {
      val g = GraphOps.canonicalize(edges)
      val lpa = GraphOps.labelPropagation(g, iters = 3)
      val r = GraphOps.louvainRefine(g, lpa, 4, "node", "label")
      GraphOps.modularityOfLouvain(r).agg(sum("q_contrib")).head.getDouble(0)
    }
    println(f"[probe]   modularity: $q%.4f (planted structure => high Q)")
  }
}
