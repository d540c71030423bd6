package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{DedupOps, IvfKnnOps, RetrievalOps}

/** Round-14 scale probes (the two r13-verdict axes the evidence
  * lacked):
  *
  *  1. `knn`  — the kNN-graph family (S13/S14) at 1M vectors,
  *     uniform lists: does the candidate-volume formula
  *     n·nProbe·(n/nLists) predict the measured work, and does the
  *     one shuffle-hash list_id join hold its memory geometry at
  *     ~2.5e8 candidate rows?
  *  2. `knnskew` — a skewed corpus (one cluster holding ~10% of the
  *     vectors): the hot list's candidate block is |hot|² — measure
  *     whether AQE skew-join splits the straggler and what the
  *     hot/uniform wall ratio is, to decide if knnGraph needs a
  *     D12-style cap + overflow report.
  *  3. `docs` — the doc-family axis at 1M documents with realistic
  *     dup structure (≈8% exact-dup band, ≈5% near-dup band, one
  *     5000-copy hot template) through the END-TO-END curation
  *     pipeline: dedupAll → removeRepeatedNgrams → BM25 index
  *     build. Relational tables have sf1 (10×) evidence; documents
  *     only had 4× — this is the missing measurement.
  *
  * All synthetic columns derive from xxhash64/pmod (the r11 lesson:
  * affine mod-folds alias catastrophically) and LAND IN PARQUET
  * before any timed pass (the r12 lesson: toy in-memory size
  * estimates bait a driver-collect broadcast).
  *
  * Run: `sbt "runMain graft.tools.ScaleProbeR14 [knn knnskew docs]"`
  * or spark-submit on the packaged jar (no sbt lock).
  */
object ScaleProbeR14 {

  def main(args: Array[String]): Unit = {
    val which = if (args.isEmpty) Set("knn", "knnskew", "docs") else args.toSet
    val spark = GraftSession.getOrCreate()
    val base = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR", "/root/repo/tmp/probe_r14")

    if (which("knn")) uniformKnn(spark, base)
    if (which("knnskew")) skewedKnn(spark, base)
    if (which("docs")) docPipeline(spark, base)
    spark.stop()
  }

  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[r14probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  /** dim-16 clustered vectors: cluster centers on hashed directions,
    * members = center·4 + hashed noise. `hotFrac10` routes 1/10 of
    * ids to cluster 0 when set (the skew shape).
    */
  private def writeVectors(spark: SparkSession, path: String, n: Long,
      nClusters: Int, hot: Boolean): Unit = {
    val dim = 16
    val cluster =
      if (hot)
        when(pmod(xxhash64(col("id"), lit(7)), lit(10)) === 0, lit(0))
          .otherwise(pmod(xxhash64(col("id"), lit(11)), lit(nClusters - 1)) + 1)
      else pmod(xxhash64(col("id"), lit(11)), lit(nClusters))
    // component j: center(cluster, j) in [-4, 4] + noise in [-1, 1]
    val comps = (0 until dim).map { j =>
      ((pmod(xxhash64(col("cl"), lit(100 + j)), lit(2000001)) / 1e6 - 1.0) * 4.0 +
        (pmod(xxhash64(col("id"), lit(200 + j)), lit(2000001)) / 1e6 - 1.0))
        .cast("float")
    }
    spark.range(0, n)
      .withColumn("cl", cluster)
      .select(col("id"), array(comps: _*).as("vec"))
      .write.mode("overwrite").parquet(path)
  }

  private def uniformKnn(spark: SparkSession, base: String): Unit = {
    val n = 1000000L
    val nLists = 4096
    val k = 4
    val nProbe = 1
    val path = s"$base/vec_uniform"
    timed(s"knn: land $n dim-16 vectors in parquet")(
      writeVectors(spark, path, n, nLists, hot = false))
    val corpus = spark.read.parquet(path)
    val index = timed(s"knn: buildIndex nLists=$nLists")(
      IvfKnnOps.buildIndex(corpus, "id", "vec", nLists, maxIter = 3))
    // predicted candidate volume: Σ_l |list_l| · |probers_l|; with
    // nProbe=1 probers_l == |list_l|, so this is Σ |list_l|²
    val sizes = index.assigned.groupBy("list_id").count()
      .agg(sum(col("count") * col("count")).as("pred"), max("count").as("maxList"),
        count(lit(1)).as("lists"))
      .head()
    println(s"[r14probe] knn: predicted candidates=${sizes.getLong(0)} " +
      s"maxList=${sizes.getLong(1)} realizedLists=${sizes.getLong(2)}")
    val g = timed(s"knn: knnGraph k=$k nProbe=$nProbe") {
      val df = IvfKnnOps.knnGraph(index, "id", "vec", k, nProbe)
      println(s"[r14probe] knn: graph rows = ${df.count()}")
      df
    }
    val skewSplit = g.queryExecution.executedPlan.toString.contains("isSkew=true")
    println(s"[r14probe] knn: AQE skew-split in final plan: $skewSplit")
    timed("knn: mutualKnnClusters end-to-end (reusing nothing — full pipeline)") {
      val c = IvfKnnOps.mutualKnnClusters(corpus, "id", "vec", k, 0.8, nLists,
        nProbe, maxIter = 3)
      println(s"[r14probe] knn: mutual-cluster members = ${c.count()}")
    }
  }

  private def skewedKnn(spark: SparkSession, base: String): Unit = {
    // hot cluster at ~10%: hot candidate block is (n/10)² — at 250k
    // vectors that is 6.25e8 of ~8.5e8 total, a 3.6× skew over the
    // uniform shape with identical n
    val n = 250000L
    val nLists = 256
    val path = s"$base/vec_hot"
    timed(s"knnskew: land $n vectors (10% hot cluster)")(
      writeVectors(spark, path, n, nLists, hot = true))
    val corpus = spark.read.parquet(path)
    val index = timed(s"knnskew: buildIndex nLists=$nLists")(
      IvfKnnOps.buildIndex(corpus, "id", "vec", nLists, maxIter = 3))
    val sizes = index.assigned.groupBy("list_id").count()
      .agg(sum(col("count") * col("count")).as("pred"), max("count").as("maxList"))
      .head()
    println(s"[r14probe] knnskew: predicted candidates=${sizes.getLong(0)} " +
      s"maxList=${sizes.getLong(1)}")
    val g = timed("knnskew: knnGraph k=4 nProbe=1") {
      val df = IvfKnnOps.knnGraph(index, "id", "vec", 4, 1)
      println(s"[r14probe] knnskew: graph rows = ${df.count()}")
      df
    }
    val plan = g.queryExecution.executedPlan.toString
    println(s"[r14probe] knnskew: AQE skew-split in final plan: " +
      s"${plan.contains("isSkew=true")}")
    // uniform control at the same n for the wall-ratio
    val upath = s"$base/vec_ctrl"
    timed(s"knnskew: land $n uniform control vectors")(
      writeVectors(spark, upath, n, nLists, hot = false))
    val uc = spark.read.parquet(upath)
    val ui = timed("knnskew: control buildIndex")(
      IvfKnnOps.buildIndex(uc, "id", "vec", nLists, maxIter = 3))
    timed("knnskew: control knnGraph k=4 nProbe=1") {
      println(s"[r14probe] knnskew: control rows = " +
        s"${IvfKnnOps.knnGraph(ui, "id", "vec", 4, 1).count()}")
    }
  }

  /** 1M docs, ~130 hashed-vocab tokens each; seed bands create the
    * dup structure (any two ids sharing a seed render IDENTICAL
    * text; the near band appends one id-unique token to a shared
    * seed's text so jaccard ≈ (L-1)/L ≈ 0.96 > 0.7).
    */
  private def docPipeline(spark: SparkSession, base: String): Unit = {
    val n = 1000000L
    val path = s"$base/docs"
    timed(s"docs: land $n synthetic docs in parquet") {
      val band = pmod(xxhash64(col("id"), lit(1)), lit(1000))
      // seed: 0-79 exact-dup band (8%, seeds drawn from a 40k pool →
      // ~2 copies each), 999 hot template (0.1% → ~1000 exact copies
      // of seed -1, the hot-key stressor), others unique
      val seed = when(band < 80, pmod(xxhash64(col("id"), lit(2)), lit(40000)))
        .when(band === 999, lit(-1L))
        .otherwise(col("id") + 1000000L)
      val near = band.between(80, 129) // 5%: shared seed + 1 unique token
      val nearSeed = pmod(xxhash64(col("id"), lit(3)), lit(40000))
      val eff = when(near, nearSeed).otherwise(seed)
      val len = (pmod(xxhash64(eff, lit(4)), lit(120)) + lit(60)).cast("int")
      val toks = transform(sequence(lit(1), len), i =>
        concat(lit("w"), pmod(xxhash64(eff, i.cast("long")), lit(50000))))
      val withTail = when(near,
        concat(toks, array(concat(lit("u"), col("id"))))).otherwise(toks)
      spark.range(0, n)
        .select(col("id"), concat_ws(" ", withTail).as("text"))
        .write.mode("overwrite").parquet(path)
    }
    val docs = spark.read.parquet(path)
    val survivors = timed("docs: dedupAll (exact + minhash-LSH)") {
      val s = DedupOps.dedupAll(docs, "id", "text").localCheckpoint()
      println(s"[r14probe] docs: survivors = ${s.count()} of $n")
      s
    }
    val cleaned = timed("docs: removeRepeatedNgrams(n=5)") {
      val c = DedupOps.removeRepeatedNgrams(survivors, "id", "text")
        .localCheckpoint()
      c.count()
      c
    }
    timed("docs: BM25 index build (saveIndex, 64 buckets)") {
      RetrievalOps.saveIndex(cleaned.withColumnRenamed("text_clean", "body"),
        "body", "id", s"$base/bm25")
    }
  }
}
