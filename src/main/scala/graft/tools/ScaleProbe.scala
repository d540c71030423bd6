package graft.tools

import graft.GraftSession
import graft.operators.{DedupOps, KnnOps}
import org.apache.spark.sql.functions._

/** Engineering probe (not part of the driver contract): replicate
  * the documents/embeddings tables N× with shifted ids and time the
  * candidate-generation dedup operators — a cheap check that their
  * cost curves stay near-linear before real scale testing.
  *
  *   sbt "runMain graft.tools.ScaleProbe /root/testdata/sf0.1 20"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 20
    val spark = GraftSession.getOrCreate()
    import spark.implicits._

    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
    val n0 = docs0.count()
    // replicate with perturbed ids; texts repeat → worst-case dup density
    val docs = docs0
      .crossJoin(spark.range(mult).toDF("rep"))
      .select((col("doc_id") + col("rep") * lit(n0)).as("doc_id"), col("text"))
    docs.cache().count()
    println(s"[probe] docs: ${n0 * mult}")

    def time[T](name: String)(f: => T): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    time("dedupAll")(DedupOps.dedupAll(docs, "doc_id", "text", shingleSize = 3).count())
    time("minhashLsh")(DedupOps.minhashLsh(docs, "doc_id", "text", shingleSize = 3).count())
    time("simhash")(DedupOps.simhash(docs, "doc_id", "text", maxHamming = 3).count())
    time("ngramJaccard")(DedupOps.ngramJaccard(docs, "doc_id", "text", threshold = 0.7).count())
    println(f"[probe] ngram collision ratio (20x corpus): ${DedupOps.ngramPrefixCollisionRatio(docs, "text")}%.3f")
    println(f"[probe] ngram collision ratio (base corpus): ${DedupOps.ngramPrefixCollisionRatio(docs0.select(col("doc_id"), col("text")), "text")}%.3f")
    time("ngramJaccardAuto")(DedupOps.ngramJaccardAuto(docs, "doc_id", "text", threshold = 0.7).count())

    val emb0 = spark.read.parquet(s"$dir/embeddings.parquet")
    val ne = emb0.count()
    val emb = emb0.crossJoin(spark.range(mult).toDF("rep"))
      .select((col("vec_id") + col("rep") * lit(ne)).as("vec_id"), col("embedding"))
    emb.cache().count()
    println(s"[probe] vectors: ${ne * mult}")
    time("embeddingDedup")(DedupOps.embeddingDedup(emb, "vec_id", "embedding", threshold = 0.99, nBits = 12).count())
    val queries = emb.filter(col("vec_id") < 10)
    time("lshTopK")(KnnOps.lshTopK(queries, emb, "vec_id", "embedding", 5, nBits = 10).count())
    time("bruteForceTopK")(KnnOps.bruteForceTopK(queries, emb, "vec_id", "embedding", 5).count())
    var index: graft.operators.IvfKnnOps.IvfIndex = null
    time("ivfBuild") { index = graft.operators.IvfKnnOps.buildIndex(emb, "vec_id", "embedding", nLists = 64, maxIter = 5) }
    time("ivfTopK")(graft.operators.IvfKnnOps.topK(queries, index, "vec_id", "embedding", 5, nProbe = 8).count())
    // PQ ADC: many-query batch so the per-candidate arithmetic, not
    // the fit, dominates — the LUT-vs-direct delta is the signal
    var pqIndex: graft.operators.IvfKnnOps.PqIndex = null
    time("pqBuild") { pqIndex = graft.operators.IvfKnnOps.buildPqIndex(emb, "vec_id", "embedding", nLists = 64, m = 8, maxIter = 5) }
    pqIndex = pqIndex.copy(encoded = pqIndex.encoded.cache())
    pqIndex.encoded.count()
    val pqQueries = emb.filter(col("vec_id") < 500)
    time("pqTopK direct")(graft.operators.IvfKnnOps.pqTopK(pqQueries, pqIndex, "vec_id", "embedding", 5, nProbe = 8, lut = false).count())
    time("pqTopK lut")(graft.operators.IvfKnnOps.pqTopK(pqQueries, pqIndex, "vec_id", "embedding", 5, nProbe = 8, lut = true).count())

    // r5 operators: range join density stress, BPE train+encode
    // throughput, heavy hitters far past summary capacity
    val nPts = n0 * mult * 10
    val pts = spark.range(nPts).select(col("id").as("p_id"),
      (pmod(col("id") * 7919L, lit(200000L)).cast("double") / 10.0).as("p_x"))
    val ivs = spark.range(2000).select(col("id").as("iv_id"),
      (pmod(col("id") * 104729L, lit(190000L)).cast("double") / 10.0).as("lo"))
      .withColumn("hi", col("lo") + lit(40.0))
    time(s"rangeJoin ($nPts pts x 2000 ivs)")(
      graft.operators.RangeJoinOps.pointInInterval(pts, "p_x", ivs, "lo", "hi", binWidth = 50.0).count())
    var codec: graft.operators.TokenizerOps.BpeCodec = null
    time("bpeTrain (20x corpus)") { codec = graft.operators.TokenizerOps.trainBpe(docs, "text", vocabSize = 512) }
    time("bpeEncode (20x corpus)")(
      docs.select(sum(size(graft.operators.TokenizerOps.encode(col("text"), codec)))).head())
    // capacity 256 << ~2k distinct tokens → constant eviction, the
    // worst case for the summary heap
    time("heavyHitters (evicting, 20x corpus)")(
      docs.select(explode(split(lower(col("text")), "\\s+")).as("tok"))
        .agg(graft.functions.HeavyHittersAggregate.heavyHitters(col("tok"), 256, 20).as("hh"))
        .head())
    spark.stop()
  }
}
