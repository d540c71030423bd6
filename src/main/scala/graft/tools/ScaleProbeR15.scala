package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{DedupOps, GraphOps, IvfKnnOps, RetrievalOps}

/** r15 scale probes (the r14 verdict's "push the two scale-critical
  * families one order of magnitude" + the scrub attach-stage
  * attribution):
  *
  *  1. `scrubab` — removeRepeatedNgrams at 1M docs, instrumented to
  *     split covered-index BUILD from kept-token ATTACH, with the
  *     pre-r15 per-token `array_contains` formulation replayed
  *     inline as the A side (the committed operator is the B side:
  *     window-collected covered sets + one `array_except`).
  *  2. `knn10m` — kNN graph + mutual clusters at 10M vectors
  *     (nLists=16384, nProbe=1, k=4: designed candidate volume
  *     n²/nLists ≈ 6.1e9), with per-round CC telemetry
  *     (spark.graft.graph.ccLog) over the ~n·k-edge mutual close —
  *     the r14-flagged bottleneck, measured at 10× its r14 size.
  *  3. `docs10m` — the doc pipeline at 10M docs with a ZIPFIAN
  *     vocabulary (token rank ∝ exp(u·ln V): p(r) ∝ 1/r), dedupAll →
  *     removeRepeatedNgrams → hot-term report → gated BM25 index
  *     build (maxDfFrac=0.5 — Zipf head terms are exactly the
  *     stopword-grade postings the gate exists for).
  *
  * Run: `SPARK_DRIVER_MEM=48g sbt "runMain graft.tools.ScaleProbeR15 [scrubab knn10m docs10m]"`
  */
object ScaleProbeR15 {

  def main(args: Array[String]): Unit = {
    val which = if (args.isEmpty) Set("scrubab", "knn10m", "docs10m") else args.toSet
    val spark = GraftSession.getOrCreate()
    val base = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR", "/root/repo/tmp/probe_r15")
    if (which("scrubab")) scrubAb(spark, base)
    if (which("knn10m")) knn10m(spark, base)
    if (which("docs10m")) docs10m(spark, base)
    spark.stop()
  }

  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[r15probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  /** The r14 synthetic doc corpus (hashed 50k vocab, 8% exact-dup
    * band, 0.1% hot template, 5% near band) — byte-compatible with
    * SCALEPROBE_r14 §3 so stage walls compare across rounds.
    */
  private def landR14Docs(spark: SparkSession, path: String, n: Long): Unit = {
    val band = pmod(xxhash64(col("id"), lit(1)), lit(1000))
    val seed = when(band < 80, pmod(xxhash64(col("id"), lit(2)), lit(40000)))
      .when(band === 999, lit(-1L))
      .otherwise(col("id") + 1000000L)
    val near = band.between(80, 129)
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

  /** Pre-r15 removeRepeatedNgrams, replayed inline: groupBy
    * collect_set covered build + per-token array_contains filter —
    * the A side of the attach-stage A/B.
    */
  private def oldScrub(df: DataFrame, n: Int): DataFrame = {
    val sep = "\u0001"
    val base = df.withColumn("__tk",
      split(trim(coalesce(col("text"), lit(""))), "\\s+"))
    val sites = base
      .select(col("id"), posexplode(
        when(size(col("__tk")) >= n,
          transform(sequence(lit(0), size(col("__tk")) - n),
            p => xxhash64(concat_ws(sep, slice(col("__tk"), p + lit(1), lit(n))))))
          .otherwise(array().cast("array<bigint>"))))
      .withColumnRenamed("pos", "__pos")
      .withColumnRenamed("col", "__h")
    val dupWins = sites
      .groupBy(col("__h"))
      .agg(count(lit(1)).as("__c"),
        min(struct(col("id").as("d"), col("__pos").as("p"))).as("__f"))
      .filter(col("__c") > 1)
      .select(col("__h"), col("__f"))
    val dupSites = sites.join(dupWins, Seq("__h"))
      .filter(!(col("id") === col("__f.d") && col("__pos") === col("__f.p")))
    val covered = dupSites
      .select(col("id"), explode(sequence(col("__pos"), col("__pos") + lit(n - 1))).as("__i"))
      .groupBy(col("id"))
      .agg(collect_set(col("__i")).as("__cov"))
    base.join(covered, Seq("id"), "left")
      .withColumn("text_clean",
        concat_ws(" ", filter(col("__tk"),
          (_, i) => col("__cov").isNull || !array_contains(col("__cov"), i))))
      .withColumn("removed_tokens",
        when(col("__cov").isNull, lit(0)).otherwise(size(col("__cov"))))
      .drop("__tk", "__cov")
  }

  private def scrubAb(spark: SparkSession, base: String): Unit = {
    val n = 1000000L
    val path = s"$base/docs_ab"
    timed(s"scrubab: land $n r14-shape docs")(landR14Docs(spark, path, n))
    val docs = spark.read.parquet(path)
    // covered-build stage in isolation (shared by both sides up to
    // the aggregation style): rows with a non-null covered set
    def coveredOnly(): Long = {
      val sep = "\u0001"
      val sites = docs
        .withColumn("__tk", split(trim(coalesce(col("text"), lit(""))), "\\s+"))
        .select(col("id"), posexplode(
          when(size(col("__tk")) >= 5,
            transform(sequence(lit(0), size(col("__tk")) - 5),
              p => xxhash64(concat_ws(sep, slice(col("__tk"), p + lit(1), lit(5))))))
            .otherwise(array().cast("array<bigint>"))))
        .withColumnRenamed("pos", "__pos").withColumnRenamed("col", "__h")
      val dupWins = sites.groupBy(col("__h"))
        .agg(count(lit(1)).as("__c"),
          min(struct(col("id").as("d"), col("__pos").as("p"))).as("__f"))
        .filter(col("__c") > 1).select(col("__h"), col("__f"))
      sites.join(dupWins, Seq("__h"))
        .filter(!(col("id") === col("__f.d") && col("__pos") === col("__f.p")))
        .select(col("id"),
          explode(sequence(col("__pos"), col("__pos") + lit(4))).as("__i"))
        .groupBy(col("id")).agg(collect_set(col("__i")).as("__cov"))
        .count()
    }
    // interleave A/B/A/B so host drift cancels
    (1 to 2).foreach { round =>
      timed(s"scrubab: covered-build only (round $round)") {
        println(s"[r15probe] scrubab: covered docs = ${coveredOnly()}")
      }
      timed(s"scrubab: OLD full scrub — array_contains attach (round $round)") {
        println(s"[r15probe] scrubab: old removed tokens = " +
          s"${oldScrub(docs, 5).agg(sum(col("removed_tokens"))).head().getLong(0)}")
      }
      timed(s"scrubab: NEW full scrub — window covered + array_except attach (round $round)") {
        println(s"[r15probe] scrubab: new removed tokens = " +
          s"${DedupOps.removeRepeatedNgrams(docs, "id", "text")
            .agg(sum(col("removed_tokens"))).head().getLong(0)}")
      }
    }
  }

  private def knn10m(spark: SparkSession, base: String): Unit = {
    val n = 10000000L
    val nLists = 16384
    val k = 4
    val nProbe = 1
    val dim = 16
    val path = s"$base/vec10m"
    timed(s"knn10m: land $n dim-$dim vectors in parquet") {
      val cluster = pmod(xxhash64(col("id"), lit(11)), lit(nLists))
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
    val corpus = spark.read.parquet(path)
    val index = timed(s"knn10m: buildIndex nLists=$nLists (driver Lloyd's on 65k sample)")(
      IvfKnnOps.buildIndex(corpus, "id", "vec", nLists, maxIter = 3))
    val sizes = index.assigned.groupBy("list_id").count()
      .agg(sum(col("count") * col("count")).as("pred"), max("count").as("maxList"),
        count(lit(1)).as("lists"))
      .head()
    println(s"[r15probe] knn10m: predicted candidates=${sizes.getLong(0)} " +
      s"(ideal ${n * n / nLists}) maxList=${sizes.getLong(1)} lists=${sizes.getLong(2)}")
    val g = timed(s"knn10m: knnGraph k=$k nProbe=$nProbe") {
      val df = IvfKnnOps.knnGraph(index, "id", "vec", k, nProbe).localCheckpoint()
      println(s"[r15probe] knn10m: graph rows = ${df.count()}")
      df
    }
    // mutual close on the materialized graph (isolates CC from the
    // graph build; mutualKnnClusters wires the same stages together)
    val mutual = timed("knn10m: mutual edge close (cosine >= 0.8)") {
      val m = g.filter(col("cosine") >= 0.8)
        .select(least(col("query_id"), col("neighbor_id")).as("lo"),
          greatest(col("query_id"), col("neighbor_id")).as("hi"))
        .groupBy(col("lo"), col("hi"))
        .agg(count(lit(1)).as("__dir"))
        .filter(col("__dir") >= 2)
        .select(col("lo").as("src"), col("hi").as("dst"))
        .localCheckpoint()
      println(s"[r15probe] knn10m: mutual edges = ${m.count()}")
      m
    }
    spark.conf.set("spark.graft.graph.ccLog", "true")
    timed("knn10m: connectedComponents over the mutual graph (per-round ccLog)") {
      val c = GraphOps.connectedComponents(mutual)
      println(s"[r15probe] knn10m: CC members = ${c.count()}")
    }
    spark.conf.set("spark.graft.graph.ccLog", "false")
  }

  private def docs10m(spark: SparkSession, base: String): Unit = {
    // the 10M scrub needs ~90 GB of concurrent shuffle scratch
    // (measured: exhausted this box's 75 GB twice); the env knob
    // lets the pipeline probe run at the largest size that fits
    val n = sys.env.getOrElse("SPARK_GRAFT_DOCS_N", "10000000").toLong
    val vocab = 50000
    val path = s"$base/docs10m_$n"
    timed(s"docs10m: land $n ZIPFIAN docs in parquet") {
      // same band structure as r14 (8% exact dups from a 400k-seed
      // pool, 0.1% hot template, 5% near dups), but token ranks are
      // Zipf(1): rank = exp(u·ln V) → p(r) ∝ 1/r, so the head token
      // appears in ~every doc — the hot-posting / hot-ngram regime
      val band = pmod(xxhash64(col("id"), lit(1)), lit(1000))
      val seed = when(band < 80, pmod(xxhash64(col("id"), lit(2)), lit(400000)))
        .when(band === 999, lit(-1L))
        .otherwise(col("id") + 100000000L)
      val near = band.between(80, 129)
      val nearSeed = pmod(xxhash64(col("id"), lit(3)), lit(400000))
      val eff = when(near, nearSeed).otherwise(seed)
      val len = (pmod(xxhash64(eff, lit(4)), lit(120)) + lit(60)).cast("int")
      val toks = transform(sequence(lit(1), len), i =>
        concat(lit("w"), least(lit(vocab), greatest(lit(1),
          ceil(exp((pmod(xxhash64(eff, (i + 10).cast("long")), lit(1000000)) + 1)
            / 1000000.0 * math.log(vocab))))).cast("long")))
      val withTail = when(near,
        concat(toks, array(concat(lit("u"), col("id"))))).otherwise(toks)
      spark.range(0, n)
        .select(col("id"), concat_ws(" ", withTail).as("text"))
        .write.mode("overwrite").parquet(path)
    }
    val docs = spark.read.parquet(path)
    // stage outputs land in parquet, not checkpoint blocks: the 10M
    // run spills tens of GB of shuffle per stage, and pinned block
    // storage on top of that exhausted the box's disk on the first
    // attempt — parquet is compressed, freed-by-stage, and resumable
    val survPath = s"$base/docs10m_surv_$n"
    if (!new java.io.File(s"$survPath/_SUCCESS").exists()) {
      timed("docs10m: dedupAll (exact + minhash-LSH)") {
        DedupOps.dedupAll(docs, "id", "text")
          .write.mode("overwrite").parquet(survPath)
      }
    }
    val survivors = spark.read.parquet(survPath)
    println(s"[r15probe] docs10m: survivors = ${survivors.count()} of $n")
    val cleanPath = s"$base/docs10m_clean_$n"
    if (!new java.io.File(s"$cleanPath/_SUCCESS").exists()) {
      timed("docs10m: removeRepeatedNgrams(n=5)") {
        DedupOps.removeRepeatedNgrams(survivors, "id", "text")
          .write.mode("overwrite").parquet(cleanPath)
      }
    }
    val cleaned = spark.read.parquet(cleanPath)
    println(s"[r15probe] docs10m: removed tokens total = " +
      s"${cleaned.agg(sum(col("removed_tokens"))).head().getLong(0)}")
    timed("docs10m: hotTermReport (df >= 5% of corpus)") {
      val nDocs = cleaned.count()
      val rep = RetrievalOps.hotTermReport(
        RetrievalOps.postings(cleaned.withColumnRenamed("text_clean", "body"), "body", "id"),
        nDocs, nBuckets = 64, minDfFrac = 0.05)
      rep.show(10, truncate = false)
    }
    timed("docs10m: BM25 saveIndex with maxDfFrac=0.5 (gated Zipf head)") {
      RetrievalOps.saveIndex(cleaned.withColumnRenamed("text_clean", "body"),
        "body", "id", s"$base/bm25_$n", nBuckets = 64, maxDfFrac = 0.5)
      println(s"[r15probe] docs10m: gated terms = " +
        s"${spark.read.parquet(s"$base/bm25_$n/dropped_terms").count()}")
    }
  }
}
