package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** BM25 full-text retrieval over a document corpus — the retrieval
  * primitive a training-data pipeline needs for
  * decontamination-by-retrieval, quality mining, and near-duplicate
  * triage beyond hash-based methods (reference semantics: the corpus
  * query surface of `biosets`' text search utilities; scoring is the
  * standard Robertson BM25 with Lucene's non-negative idf variant
  * `ln(1 + (N − df + 0.5)/(df + 0.5))`).
  *
  * Scale design (the part that must survive 100 TB):
  *
  *   - '''Query-time scoring''' never materializes full postings: the
  *     tokenizer output is filtered to the query's terms BEFORE the
  *     first shuffle, so the one `groupBy(doc, term)` aggregation
  *     shuffles only rows that can contribute to the score —
  *     O(docs containing a query term), not O(total tokens).
  *   - '''Corpus stats''' (N, avgdl) are a scalar aggregate attached
  *     as a 1-row broadcast cross join (same pattern as the quantile
  *     gates); document frequency per query term is a ≤|q|-row
  *     broadcast.
  *   - '''Top-k''' is `orderBy(...).limit(k)` — Spark plans
  *     TakeOrderedAndProject: per-partition heaps, only k rows per
  *     partition reach the driver-side merge. No global sort, no
  *     single-partition window over the corpus.
  *   - '''Persisted index''': [[saveIndex]] writes postings
  *     partitioned by a stable term-hash bucket, so [[searchIndex]]
  *     prunes to |query terms| buckets at planning time — the scan
  *     cost of a query is independent of corpus vocabulary size, and
  *     the layout is append-friendly (new shards land in the same
  *     bucket dirs).
  *
  * Determinism for the oracle: scores are rounded to the 1e-6 grid
  * BEFORE ranking, and ties break by doc id, so the top-k cut is
  * stable across engines and summation orders.
  */
object RetrievalOps {

  /** Postings list: one row per (term, doc) with term frequency and
    * the doc's token length. One projection + explode + ONE shuffle.
    */
  def postings(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), TF.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), size(col("__toks")).as("dl"), explode(col("__toks")).as("term"))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))

  /** Corpus-level scalars the BM25 formula needs: doc count and
    * average token length (plus the EXACT integer token-length sum,
    * which is what makes incremental stats merges in
    * [[appendToIndex]] bit-identical to a fresh build — merged
    * avgdl is the same one division `dl_sum / n_docs`).
    * A single cheap column-pruned scan.
    */
  def corpusStats(df: DataFrame, textCol: String): DataFrame =
    df.select(size(TF.tokens(col(textCol))).as("__dl"))
      .agg(
        count(lit(1)).cast("double").as("n_docs"),
        avg(col("__dl")).as("avgdl"),
        sum(col("__dl")).cast("long").as("dl_sum"))

  /** Score every document containing at least one query term and
    * keep the top k by BM25. `k1` saturates term frequency, `b`
    * controls length normalization (standard defaults).
    */
  def bm25TopK(
      df: DataFrame,
      textCol: String,
      idCol: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k > 0, s"k must be positive, got $k")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val post = df
      .select(col(idCol).as("doc_id"), TF.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), size(col("__toks")).as("dl"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(terms: _*)) // selectivity BEFORE the shuffle
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    scoreAndRank(post, corpusStats(df, textCol), k, k1, b)
  }

  /** Hot-term telemetry for a postings frame — the D12-style
    * overflow report for the inverted-index layout. A stopword-grade
    * term (df ≈ n_docs) makes its posting list corpus-sized: the
    * bucket holding it is no longer prunable to "small", and ANY
    * query containing the term scans df rows at score time. This
    * report makes that skew queryable data instead of a latent
    * cliff: one row per term whose document frequency exceeds
    * `minDfFrac` of the corpus, with its share of total postings and
    * of its hash bucket.
    *
    * Scale shape: df is ONE map-side-combinable `groupBy(term)` over
    * the postings (the same aggregate every BM25 build already
    * runs); bucket totals are a second tiny aggregate over the
    * per-term frame (vocabulary-sized, not corpus-sized). Fractions
    * snap to the 1e-6 grid.
    *
    * @return (term, df, df_frac, postings_share, bkt,
    *         bucket_postings, bucket_share) sorted by df desc, term
    */
  def hotTermReport(
      post: DataFrame,
      nDocs: Long,
      nBuckets: Int = 64,
      minDfFrac: Double = 0.05
  ): DataFrame = {
    require(nDocs > 0, s"nDocs must be positive, got $nDocs")
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    require(minDfFrac > 0 && minDfFrac <= 1, s"minDfFrac must be in (0,1], got $minDfFrac")
    val snap6 = (c: org.apache.spark.sql.Column) => floor(c * lit(1e6) + lit(0.5)) / 1e6
    val perTerm = post.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("bkt", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
    val perBucket = perTerm.groupBy("bkt").agg(sum(col("df")).as("bucket_postings"))
    val total = perTerm.agg(sum(col("df")).as("total_postings"))
    perTerm
      .filter(col("df") >= lit(minDfFrac) * lit(nDocs.toDouble))
      .join(broadcast(perBucket), Seq("bkt"))
      .crossJoin(broadcast(total))
      .select(
        col("term"), col("df"),
        snap6(col("df") / lit(nDocs.toDouble)).as("df_frac"),
        snap6(col("df") / col("total_postings")).as("postings_share"),
        col("bkt"), col("bucket_postings"),
        snap6(col("df") / col("bucket_postings")).as("bucket_share"))
      .orderBy(col("df").desc, col("term"))
  }

  /** [[hotTermReport]] over a persisted index — reads only the
    * postings' (term) column (column-pruned scan) plus the 1-row
    * stats sidecar. */
  def indexHotTermReport(
      spark: SparkSession,
      path: String,
      minDfFrac: Double = 0.05
  ): DataFrame = {
    val stats = spark.read.parquet(s"$path/stats").select("n_docs", "n_buckets").head()
    hotTermReport(
      spark.read.parquet(s"$path/postings"),
      stats.getDouble(0).toLong, stats.getInt(1), minDfFrac)
  }

  /** Build and persist an inverted index: postings partitioned by a
    * stable term-hash bucket (query-time partition pruning), plus a
    * 1-row corpus-stats sidecar. Layout:
    * `path/postings/bkt=N/...parquet`, `path/stats/...parquet`.
    *
    * `maxDfFrac < 1` gates stopword-grade terms OUT of the postings
    * at build time (the Lucene stopword discipline applied by
    * MEASURED df, not a fixed word list): a term in more than
    * `maxDfFrac` of documents carries ~zero BM25 idf yet dominates
    * both index size and query-time scan cost — its posting list is
    * corpus-sized. Gated terms are never silent: they land in a
    * `path/dropped_terms` sidecar (term, df), so "what did the gate
    * eat" is a query, not a guess ([[hotTermReport]] is the
    * pre-build advisory form). Contract: [[searchIndex]] scores a
    * gated query term as ABSENT (contributes 0 to every doc's
    * score), exactly as if the query had omitted it; `stats`
    * (n_docs, avgdl) keep the full corpus so ungated terms score
    * identically to an ungated build.
    */
  def saveIndex(
      df: DataFrame,
      textCol: String,
      idCol: String,
      path: String,
      nBuckets: Int = 64,
      maxDfFrac: Double = 1.0
  ): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    require(maxDfFrac > 0 && maxDfFrac <= 1, s"maxDfFrac must be in (0,1], got $maxDfFrac")
    val post = postings(df, textCol, idCol)
      .withColumn("bkt", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
    val gated =
      if (maxDfFrac >= 1.0) {
        // an UNGATED build must still overwrite the sidecar: a
        // rebuild at a path that previously held a gated index would
        // otherwise leave a stale dropped_terms misdescribing the new
        // postings (the sidecar's contract is "what is absent from
        // the postings on disk", which for an ungated build is empty)
        val spark = df.sparkSession
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("term", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("df", org.apache.spark.sql.types.LongType))))
          .coalesce(1).write.mode("overwrite").parquet(s"$path/dropped_terms")
        post
      } else {
        val nDocs = df.count()
        val dropped = post.groupBy("term").agg(count(lit(1)).as("df"))
          .filter(col("df") > lit(maxDfFrac) * lit(nDocs.toDouble))
        dropped.write.mode("overwrite").parquet(s"$path/dropped_terms")
        // broadcast anti join: Σ df = total postings bounds the
        // dropped set at (avg distinct terms per doc)/maxDfFrac
        // terms — doc-vocabulary-sized, never corpus-sized
        post.join(broadcast(dropped.select("term")), Seq("term"), "left_anti")
      }
    gated.write.partitionBy("bkt").mode("overwrite").parquet(s"$path/postings")
    corpusStats(df, textCol)
      .withColumn("n_buckets", lit(nBuckets))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Append new documents to a persisted index: their postings land
    * in the same term-hash bucket directories (the layout is
    * append-friendly by construction — no existing file is touched),
    * and the stats sidecar is re-derived from exact integer sums, so
    * a search after N appends scores identically to an index built
    * fresh over the whole corpus. Doc ids must be new — re-appending
    * an existing doc would double its postings.
    */
  def appendToIndex(
      spark: SparkSession,
      df: DataFrame,
      textCol: String,
      idCol: String,
      path: String
  ): Unit = {
    val old = spark.read.parquet(s"$path/stats")
      .select("n_docs", "dl_sum", "n_buckets").head()
    val nBuckets = old.getInt(2)
    postings(df, textCol, idCol)
      .withColumn("bkt", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
      .write.partitionBy("bkt").mode("append").parquet(s"$path/postings")
    val add = df.select(size(TF.tokens(col(textCol))).as("__dl"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        coalesce(sum(col("__dl")), lit(0L)).cast("long").as("s")) // empty batch → 0
      .head()
    val nDocs = old.getDouble(0) + add.getDouble(0)
    val dlSum = old.getLong(1) + add.getLong(1)
    import spark.implicits._
    Seq((nDocs, dlSum / nDocs, dlSum, nBuckets))
      .toDF("n_docs", "avgdl", "dl_sum", "n_buckets")
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Re-apply the measured-df stopword gate over a GROWN index —
    * the maintenance pass [[appendToIndex]] makes necessary: appends
    * are deliberately gate-free (an incremental batch cannot know
    * corpus-wide df), so a term can cross `maxDfFrac` AFTER build
    * and its corpus-sized posting list re-enters the index through
    * the back door. Compaction measures df over the postings
    * actually on disk, drops every term past the gate, and rewrites
    * the inverted file via the same staged swap the PQ index
    * compaction uses (write to `postings_staging`, rename-swap, the
    * live index stays readable until the instant of the swap).
    *
    * The `dropped_terms` sidecar stays a LEDGER of what the gate has
    * eaten: rows from prior gated builds/compactions are kept and
    * df sums per term (append-only doc ids mean a term re-dropped
    * after an append contributes disjoint postings each time), so
    * `Σ df` over the sidecar is the total posting count ever removed.
    *
    * Contract: compacting an index that was built AND appended
    * ungated yields bit-identical scores to a fresh
    * `saveIndex(..., maxDfFrac)` over the union corpus (df measured
    * on full postings = corpus df; `stats` keep the full corpus
    * either way). A gated BUILD followed by appends then compact can
    * only drop MORE than the fresh build (build-dropped postings are
    * unrecoverable) — the gate is one-directional by design.
    */
  def compactIndex(spark: SparkSession, path: String, maxDfFrac: Double): Unit = {
    require(maxDfFrac > 0 && maxDfFrac < 1, s"maxDfFrac must be in (0,1), got $maxDfFrac")
    val nDocs = spark.read.parquet(s"$path/stats").select("n_docs").head().getDouble(0)
    val post = spark.read.parquet(s"$path/postings")
    val dropped = post.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") > lit(maxDfFrac) * lit(nDocs))
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val droppedPath = new org.apache.hadoop.fs.Path(s"$path/dropped_terms")
    // merge the ledger FIRST (both inputs still read live data) into
    // a staging dir — writing postings below must not re-evaluate it
    val ledger =
      if (fs.exists(droppedPath))
        spark.read.parquet(s"$path/dropped_terms").unionByName(dropped)
          .groupBy("term").agg(sum(col("df")).as("df"))
      else dropped
    ledger.coalesce(1).write.mode("overwrite").parquet(s"$path/dropped_terms_staging")
    // rewrite the inverted file without the gated terms, same
    // bucket-partitioned layout (bkt rides each row already)
    post.join(broadcast(dropped.select("term")), Seq("term"), "left_anti")
      .write.partitionBy("bkt").mode("overwrite").parquet(s"$path/postings_staging")
    stageSwap(fs, path, "postings")
    stageSwap(fs, path, "dropped_terms")
  }

  /** Swap `$path/${name}_staging` into `$path/$name` with rollback —
    * the index stays readable up to the rename instant. */
  private def stageSwap(fs: org.apache.hadoop.fs.FileSystem, path: String, name: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(s"$path/$name")
    val staging = new org.apache.hadoop.fs.Path(s"$path/${name}_staging")
    val old = new org.apache.hadoop.fs.Path(s"$path/${name}_old")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(live) && !fs.rename(live, old)) {
      fs.delete(staging, true)
      throw new java.io.IOException(s"compact swap: cannot stage out $live")
    }
    if (!fs.rename(staging, live)) { // roll back, keep the index usable
      if (fs.exists(old)) fs.rename(old, live)
      fs.delete(staging, true)
      throw new java.io.IOException(s"compact swap: cannot swap $staging into place")
    }
    fs.delete(old, true)
  }

  /** Query a persisted index. The `bkt` predicate prunes partitions
    * at planning time — only the query terms' bucket directories are
    * read; document frequency is recomputed from the pruned postings
    * (exact: a bucket holds every posting of its terms).
    */
  def searchIndex(
      spark: SparkSession,
      path: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val statsRow = spark.read.parquet(s"$path/stats")
    val nBuckets = statsRow.select("n_buckets").head().getInt(0)
    // Stable bucket ids for the query terms, computed with the same
    // xxhash64 the writer used (evaluated on a tiny local frame so
    // writer and reader can never disagree on the hash).
    val bktIds = spark
      .createDataFrame(terms.map(Tuple1(_))).toDF("term")
      .select(pmod(xxhash64(col("term")), lit(nBuckets.toLong)).as("bkt"))
      .collect().map(_.getLong(0)).distinct.toSeq
    val post = spark.read.parquet(s"$path/postings")
      .filter(col("bkt").isin(bktIds: _*) && col("term").isin(terms: _*))
      .select(col("doc_id"), col("dl"), col("term"), col("tf").cast("double").as("tf"))
    scoreAndRank(post, statsRow.select("n_docs", "avgdl"), k, k1, b)
  }

  /** Reciprocal-rank fusion of N rankings (Cormack et al. 2009,
    * public method): `score(d) = Σ_lists 1/(c + rank_list(d))` over
    * the union of the lists — the standard way to combine lexical
    * (BM25) and dense (kNN) retrieval without score calibration.
    *
    * Inputs are (id, rank) frames — typically already top-k-sized,
    * so the fuse is a union + ONE tiny groupBy; the plan stays
    * fully distributed for full-corpus rankings too. Scores are
    * rounded to the 1e-6 grid before ranking and ties break by id,
    * so the fused cut is engine-stable (same discipline as
    * [[bm25TopK]]).
    *
    * @param rankings frames each holding `idCol` and `rankCol`
    *                 (1-based ranks)
    * @param c        the RRF damping constant (60 in the paper)
    */
  def rrfFuse(
      rankings: Seq[DataFrame],
      idCol: String,
      rankCol: String,
      k: Int,
      c: Int = 60
  ): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    require(k > 0, s"k must be positive, got $k")
    require(c >= 0, s"c must be non-negative, got $c")
    val parts = rankings.map(_.select(
      col(idCol).as("doc_id"),
      (lit(1.0) / (lit(c.toDouble) + col(rankCol).cast("double"))).as("__rr")))
    parts.reduce(_.unionByName(_))
      .groupBy("doc_id")
      .agg((floor(sum(col("__rr")) * 1e6 + lit(0.5)) / 1e6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
  }

  /** Shared scoring tail: idf per term (broadcast), per-doc score
    * sum, rounded-then-ranked top-k via TakeOrderedAndProject.
    */
  /** Sublinear TF-IDF retrieval — the classic lexical baseline next
    * to [[bm25TopK]] (no length normalization / saturation knobs;
    * useful as the second scorer in an RRF fusion). Weight per
    * (doc, query term): `(1 + ln tf) · (ln((N+1)/(df+1)) + 1)` —
    * the smoothed-idf variant that never goes negative.
    *
    * Identical scale shape to BM25: postings filtered to query
    * terms BEFORE the one shuffle, df as a ≤|q|-row broadcast,
    * N as a 1-row broadcast, top-k via TakeOrderedAndProject.
    * Scores snap to the 1e-6 grid before ranking, ties by doc id.
    */
  def tfidfTopK(
      df: DataFrame,
      textCol: String,
      idCol: String,
      queryTerms: Seq[String],
      k: Int
  ): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k > 0, s"k must be positive, got $k")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val post = df
      .select(col(idCol).as("doc_id"), TF.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = post.groupBy("term").agg(count(lit(1)).cast("double").as("dfreq"))
    val nDocs = df.select(count(lit(1)).cast("double").as("n_docs"))
    val scored = post
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("w",
        (lit(1.0) + log(col("tf"))) *
          (log((col("n_docs") + lit(1.0)) / (col("dfreq") + lit(1.0))) + lit(1.0)))
      .groupBy("doc_id")
      .agg((floor(sum(col("w")) * 1e6 + lit(0.5)) / 1e6).as("score"))
    scored
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
  }

  private def scoreAndRank(
      post: DataFrame,
      stats: DataFrame,
      k: Int,
      k1: Double,
      b: Double
  ): DataFrame = {
    val dfreq = post.groupBy("term").agg(count(lit(1)).cast("double").as("dfreq"))
    val scored = post
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn(
        "idf",
        log(lit(1.0) + (col("n_docs") - col("dfreq") + lit(0.5)) / (col("dfreq") + lit(0.5))))
      .withColumn(
        "contrib",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg((floor(sum(col("contrib")) * 1e6 + lit(0.5)) / 1e6).as("score"))
    scored
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
  }
}
