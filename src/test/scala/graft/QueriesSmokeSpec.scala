package graft

/** Runs every driver query against sf0.001 — catches regressions in
  * any `SparkEntry.queries` entry without waiting for the driver's
  * verify round. Every query must plan, execute, and return rows.
  */
class QueriesSmokeSpec extends SparkSpec {

  /** Queries whose DESIGNED plan contains a BroadcastNestedLoopJoin
    * against a provably tiny broadcast side: the knn family scores
    * every query row against broadcast centroids / the broadcast
    * brute-force candidate set, and the gate/packing operators cross
    * in a 1-row broadcast scalar threshold. A BNLJ there is the
    * right plan; anywhere else it's a scale bug.
    */
  private val tinyBroadcastBnlj = Set(
    "q_knn_brute", "q_knn_ivf", "q_knn_opq", "q_knn_pq", "q_knn_pq_rerank",
    "q_pq_persist", "q_pack", "q_prevalence", "q_quantile_filter",
    // compose bruteForceTopK — the same broadcast-queries scoring BNLJ
    "q_knn_recall", "q_rrf_fusion",
    // pair-frame theta join (s_a < s_b) over broadcast per-sample
    // totals: inherently nested-loop, side bounded by the cohort size
    "q_bray_curtis",
    // pair-frame theta join (g_a < g_b) over the per-group bottom-k
    // sketch arrays: groups are a bounded dimension, each side ≤ k
    // hashes — the raw value frames never meet
    "q_kmv_jaccard",
    // 1-row broadcast scalars: BM25/TF-IDF corpus stats, collocation
    // totals, keyword doc count, target-encoding prior, LM vocab
    // size, z-order column min/max
    "q_bm25", "q_bm25_persist", "q_bm25_append", "q_tfidf", "q_collocations",
    "q_keywords", "q_target_encode", "q_lm_score", "q_zorder",
    // ungrouped kappa: the total/diagonal/expected-agreement frames
    // are each ONE row (global aggregates) — their constant join key
    // folds away and the 1-row joins become BNLJ by construction
    "q_kappa",
    // 1-row broadcast scalars: backoff-LM corpus totals (N, V) and
    // association-rule basket totals
    "q_lm_backoff", "q_rules",
    // 1-row broadcast scalars: RFM quintile thresholds, G² bigram total
    "q_rfm", "q_llr_collocations",
    // 1-row broadcast scalar: corpus-end timestamp for censoring
    "q_survival",
    // 1-row broadcast scalar: the graph's edge count m
    "q_modularity",
    // 1-row broadcast scalar: the exact percentile time cutoff
    "q_temporal_split",
    // inherits q_quantile_filter's 1-row broadcast threshold stage
    "q_curation_pipeline")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sfDir)
      // global scale guard: no cartesian anywhere; nested-loop joins
      // only in the allowlisted tiny-broadcast patterns
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!plan.contains("CartesianProduct"), s"$name plans a CartesianProduct")
      if (!tinyBroadcastBnlj.contains(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name plans a BroadcastNestedLoopJoin")
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query key has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val stale = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"oracles without queries: $stale")
  }
}
