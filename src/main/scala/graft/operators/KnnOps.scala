package graft.operators

import graft.functions.{HashExpressions => HE, TopKAggregate => TK, VectorFunctions => VF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate & exact nearest-neighbor search over embedding
  * columns.
  *
  * Scale design: the query set is broadcast (top-k search is
  * queries≪corpus); the corpus streams through codegen'd cosine
  * into the bounded [[TK.TopK]] aggregate — map-side partial top-k
  * per query, so the exchange carries |Q|·k entries per map task
  * instead of every scored row, and nothing is globally sorted
  * (the window formulation it replaces shuffles + sorts the whole
  * scored table). The LSH variant prunes the corpus to
  * hamming-adjacent buckets first, turning O(|Q|·n) into
  * O(|Q|·n/2^b · buckets_probed).
  */
object KnnOps {

  /** (query_id, neighbor_id, cosine, rank) from a scored frame via
    * the bounded top-k aggregate; ordering (cosine desc, id asc)
    * matches the window formulation row-for-row.
    */
  private[operators] def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy("query_id")
      .agg(TK.topK(col("cosine"), col("neighbor_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("query_id"), col("e.id").as("neighbor_id"), col("e.score").as("cosine"),
        (col("pos") + 1).as("rank"))

  /** Exact top-k cosine neighbors of each query row.
    * `queries`/`corpus`: (id: long, vec). Ranks on cosine rounded
    * to 6 decimals with id tiebreak → fully deterministic output.
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VF.hround(HE.cosineSim(col("qv"), col("cv")), 6))
    rankTopK(scored, k)
  }

  /** LSH-bucketed ANN: corpus is pre-bucketed by hyperplane bits;
    * a query probes its own bucket plus all buckets within hamming
    * distance `probes` of it (multi-probe LSH). Recall rises with
    * probes; cost is corpus/2^nBits per probed bucket.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nBits: Int = 12,
      probes: Int = 1
  ): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      HE.hyperplaneLsh(col(vecCol), nBits).as("bkt"))
    // multi-probe: query bucket ⊕ each single bit (probes=1 → nBits+1 probes)
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      HE.hyperplaneLsh(col(vecCol), nBits).as("qbkt"))
    val probeBkts =
      if (probes <= 0) array(col("qbkt"))
      else
        array((col("qbkt") +: (0 until nBits).map(i => col("qbkt").bitwiseXOR(shiftleft(lit(1L), i)))): _*)
    val q = q0.withColumn("bkt", explode(probeBkts)).drop("qbkt")
    val scored = c
      .join(broadcast(q), Seq("bkt"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VF.hround(HE.cosineSim(col("qv"), col("cv")), 6))
    // distinct first: multi-probe can surface the same pair from
    // several buckets, and duplicates must not occupy top-k slots
    rankTopK(scored.select("query_id", "neighbor_id", "cosine").distinct(), k)
  }

  /** Recall@k of an approximate retrieval against an exact one —
    * the tuning harness for nBits/probes/nProbe: both inputs are
    * (query_id, neighbor_id[, rank]) frames (any of the topK
    * variants here or in IvfKnnOps); rows past rank k are ignored
    * when a rank column is present. Per query:
    * (n_hit, n_exact, recall). One semi join on the pair key + two
    * partial-agg groupBys — linear in the result sets, never in
    * the corpus.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    def top(df: DataFrame): DataFrame = {
      val d = if (df.columns.contains("rank")) df.filter(col("rank") <= k) else df
      d.select("query_id", "neighbor_id")
    }
    val hits = top(exact).join(top(approx), Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
    top(exact).groupBy("query_id").agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"), col("n_exact"),
        (coalesce(col("n_hit"), lit(0L)) / col("n_exact")).as("recall"))
  }
}
