package graft.tools

import graft.GraftSession
import graft.operators.{GraphOps, KMeansOps, LayoutOps, LmOps, RetrievalOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-7 probe, part 2 (engineering tool, not driver contract):
  * push the NEW r7 operators 20-2000× past their driver-query scale
  * and print the numbers that say whether the cost curves hold —
  * BM25 index build/search/append at 100k docs, bigram-LM train +
  * score at 100k docs, k-means at 100k×64 vectors, connected
  * components on 500k nodes with diameter-5000 chains, z-order
  * write at 10M rows.
  *
  *   sbt "runMain graft.tools.ScaleProbeR7b /root/testdata/sf0.1"
  */
object ScaleProbeR7b {

  private def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.getOrCreate()
    bm25Probe(spark, dir, replicate = 20)
    lmProbe(spark, dir, replicate = 20)
    kmeansProbe(spark, dir, replicate = 20, k = 64, iters = 5)
    ccProbe(spark, nNodes = 500000L, chainLen = 5000L)
    zorderProbe(spark, nRows = 10000000L)
    spark.stop()
  }

  private def replicatedDocs(spark: SparkSession, dir: String, replicate: Int) = {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    spark.range(replicate.toLong).crossJoin(docs)
      .select((col("doc_id") + col("id") * 10000000L).as("doc_id"), col("text"))
  }

  def bm25Probe(spark: SparkSession, dir: String, replicate: Int): Unit = {
    val docs = replicatedDocs(spark, dir, replicate).cache()
    val n = docs.count()
    val path = java.nio.file.Files.createTempDirectory("probe-bm25").toString + "/idx"
    time(s"bm25 saveIndex ($n docs)") {
      RetrievalOps.saveIndex(docs, "text", "doc_id", path, nBuckets = 64)
    }
    val postings = spark.read.parquet(s"$path/postings")
    println(s"[probe] bm25 postings rows: ${postings.count()}")
    val q = Seq("vector", "hash", "stream", "window")
    for (round <- 1 to 3) time(s"bm25 searchIndex round $round") {
      assert(RetrievalOps.searchIndex(spark, path, q, 20).collect().length == 20)
    }
    for (i <- 1 to 5) {
      val batch = docs.sample(withReplacement = false, 0.01, seed = i)
        .select((col("doc_id") + 900000000L + i * 1000000L).as("doc_id"), col("text"))
      time(s"bm25 append batch $i") {
        RetrievalOps.appendToIndex(spark, batch, "text", "doc_id", path)
      }
    }
    time("bm25 searchIndex after 5 appends") {
      assert(RetrievalOps.searchIndex(spark, path, q, 20).collect().length == 20)
    }
    docs.unpersist()
  }

  def lmProbe(spark: SparkSession, dir: String, replicate: Int): Unit = {
    val docs = replicatedDocs(spark, dir, replicate).cache()
    val n = docs.count()
    val lm = time(s"lm trainBigramLm ($n docs)") {
      LmOps.trainBigramLm(docs, "text", "doc_id").cache()
    }
    println(s"[probe] lm distinct bigrams: ${lm.count()}")
    time(s"lm nllScore ($n docs)") {
      val scored = LmOps.nllScore(docs, lm, "text", "doc_id")
      println(s"[probe] lm scored rows: ${scored.count()}")
    }
    lm.unpersist(); docs.unpersist()
  }

  def kmeansProbe(spark: SparkSession, dir: String, replicate: Int, k: Int, iters: Int): Unit = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").select("vec_id", "embedding")
    val big = spark.range(replicate.toLong).crossJoin(emb)
      .select((col("vec_id") + col("id") * 10000000L).as("vec_id"), col("embedding"))
      .cache()
    val n = big.count()
    val model = time(s"kmeans fit ($n vectors, k=$k, $iters iters)") {
      KMeansOps.fit(big, "embedding", "vec_id", k, iters)
    }
    time("kmeans transform") {
      val sizes = KMeansOps.transform(big, "embedding", "vec_id", model)
        .groupBy("cluster").count().collect()
      println(s"[probe] kmeans clusters populated: ${sizes.length}/$k, " +
        s"largest ${sizes.map(_.getLong(1)).max}")
    }
    big.unpersist()
  }

  def ccProbe(spark: SparkSession, nNodes: Long, chainLen: Long): Unit = {
    val edges = spark.range(nNodes)
      .filter(col("id") % chainLen =!= (chainLen - 1))
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    time(s"connectedComponents ($nNodes nodes, diameter $chainLen)") {
      val cc = GraphOps.connectedComponents(edges)
      val bad = cc.filter(col("component") =!= col("id") - col("id") % chainLen).count()
      println(s"[probe] cc labeled ${cc.count()} nodes, mislabeled $bad")
    }
  }

  def zorderProbe(spark: SparkSession, nRows: Long): Unit = {
    val df = spark.range(nRows).select(
      col("id"),
      pmod(hash(col("id")), lit(100000)).cast("long").as("a"),
      pmod(hash(col("id") + 7), lit(100000)).cast("long").as("b"))
    val out = java.nio.file.Files.createTempDirectory("probe-z").toString + "/z"
    time(s"zorderWrite ($nRows rows, 64 files)") {
      LayoutOps.zorderWrite(df, Seq("a", "b"), out, numFiles = 64, bits = 16)
    }
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    val spans = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(max("a") - min("a"), max("b") - min("b")).head()
      (r.getLong(0), r.getLong(1))
    }
    println(s"[probe] zorder ${files.length} files, mean a-span ${spans.map(_._1).sum / spans.length}" +
      s" / 100000, mean b-span ${spans.map(_._2).sum / spans.length} / 100000")
  }
}
