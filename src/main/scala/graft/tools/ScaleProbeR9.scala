package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators._

/** Round-9 probes for the new operators:
  *
  *   1. quantileSampleSketch at 50M rows / 100 groups, k=4096 — the
  *      bounded-buffer aggregate must cap the exchange at groups·k
  *      per map task (the window formulation would sort 50M rows).
  *   2. quantileSampleSketch heavy skew — ONE group holding 49M of
  *      50M rows: partial buffers still cap at k, no single-reducer
  *      value buffering.
  *   3. quantileSampleMerge fan-in — 10k shard sketches per group
  *      merged in one groupBy (the day×shard accretion case).
  *   4. Batch-branch entity resolution at 2M records / ~26² blocks —
  *      the blocked pair join + CC composition at width (the
  *      streaming branch shares the block-confinement contract; its
  *      per-record cost is bounded by block size, probed in the
  *      overflow spec).
  *
  * Run: `sbt "runMain graft.tools.ScaleProbeR9"`. Findings →
  * SCALEPROBE_r09.md.
  */
object ScaleProbeR9 {

  private def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    bigSketch(spark)
    skewSketch(spark)
    mergeFanIn(spark)
    bigEr(spark)
    hotBlockEr(spark)
    sinkThroughput(spark)
    spark.stop()
  }

  def bigSketch(spark: SparkSession): Unit = {
    val df = spark.range(50000000L).select(
      col("id"),
      (col("id") % 100L).as("g"),
      // heavy-tailed synthetic values, unknown range
      (pmod(col("id") * 2654435761L, lit(1000000L)).cast("double") *
        pmod(col("id") * 48271L, lit(97L)).cast("double")).as("v"))
    val n = time("quantileSampleSketch 50M rows / 100 groups / k=4096") {
      SketchOps.quantileSampleSketch(df, Seq("g"), "id", "v", k = 4096).count()
    }
    println(s"[probe]   rows: $n")
  }

  def skewSketch(spark: SparkSession): Unit = {
    val df = spark.range(50000000L).select(
      col("id"),
      when(col("id") % 50L === 0, col("id") % 49L + 1L).otherwise(lit(0L)).as("g"),
      pmod(col("id") * 2654435761L, lit(1000000L)).cast("double").as("v"))
    val n = time("quantileSampleSketch 50M rows, 98% in ONE group, k=4096") {
      SketchOps.quantileSampleSketch(df, Seq("g"), "id", "v", k = 4096).count()
    }
    println(s"[probe]   rows: $n")
  }

  def mergeFanIn(spark: SparkSession): Unit = {
    val shards = spark.range(10000000L).select(
      col("id"),
      (col("id") % 10L).as("g"),
      (col("id") % 10000L).as("shard"),
      pmod(col("id") * 48271L, lit(1000000L)).cast("double").as("v"))
    val sk = SketchOps.quantileSampleSketch(
      shards, Seq("g", "shard"), "id", "v", k = 256)
    val n = time("quantileSampleMerge 100k shard sketches -> 10 groups, k=256") {
      SketchOps.quantileSampleMerge(sk, Seq("g"), k = 256).count()
    }
    println(s"[probe]   rows: $n")
  }

  def bigEr(spark: SparkSession): Unit = {
    // 2M records under REALISTIC blocking: 100k blocks of ~20
    // records (5 planted 4-member variant families each) — the
    // selective-key contract the blocked join documents
    val df = spark.range(2000000L).select(
      col("id"),
      concat(
        lpad(conv((col("id") / 20L).cast("string"), 10, 36), 4, "0"),
        lit(" entity "),
        (col("id") / 4L).cast("string"),
        lit(" v"),
        (col("id") % 4L).cast("string")).as("name"))
    val resolved = graft.streaming.EntityResolution.streamingEntityResolution(
      df, "id", "name", minSim = 0.93, blockPrefix = 4)
    val n = time("batch ER 2M records / 100k blocks of 20 / 4-member families") {
      resolved.count()
    }
    println(s"[probe]   rows: $n")
  }

  def sinkThroughput(spark: SparkSession): Unit = {
    // 10M synthetic (id, text ~60B, 8 longs) rows through each sink —
    // one mapPartitions pass, shard per partition; throughput is the
    // per-executor serialize+write rate (the 100 TB axis)
    val df = spark.range(10000000L).select(
      col("id"),
      concat(lit("document text payload number "),
        col("id").cast("string"), lit(" with deterministic filler words")).as("text"),
      array((0 until 8).map(i => col("id") * (i + 1)): _*).as("toks"))
      .repartition(32)
    val tmp1 = java.nio.file.Files.createTempDirectory("probe-tfr").toString
    time("TFRecord write 10M rows / 32 shards") {
      graft.sources.TfRecordIO.write(df, "file:" + tmp1 + "/o")
    }
    val wdf = df.select(col("id").cast("string").as("key"), col("text"))
    val tmp2 = java.nio.file.Files.createTempDirectory("probe-wds").toString
    time("WebDataset write 10M rows / 32 shards") {
      graft.sources.WebDatasetIO.write(wdf, "file:" + tmp2 + "/o", "key")
    }
  }

  def hotBlockEr(spark: SparkSession): Unit = {
    // ONE 20k-member hot block: the O(block^2) cost a non-selective
    // key pays — 200M scored pairs. Measured, not hidden: a first
    // probe at 3000-member blocks x 676 blocks (3G pairs) OOMed the
    // CC edge materialization, which is the boundary this records.
    val df = spark.range(20000L).select(
      col("id"),
      concat(lit("aaaa entity "), (col("id") / 4L).cast("string"),
        lit(" v"), (col("id") % 4L).cast("string")).as("name"))
    val resolved = graft.streaming.EntityResolution.streamingEntityResolution(
      df, "id", "name", minSim = 0.93, blockPrefix = 4)
    val n = time("batch ER hot block: 20k records in ONE block (200M pairs)") {
      resolved.count()
    }
    println(s"[probe]   rows: $n")
  }
}
