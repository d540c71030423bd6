package graft

/** Runs every driver query against sf0.001 — catches regressions in
  * any `SparkEntry.queries` entry without waiting for the driver's
  * verify round. Every query must plan, execute, and return rows.
  */
class QueriesSmokeSpec extends SparkSpec {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query key has an oracle or is a documented rows-only op") {
    val rowsOnly = Set(
      "q_dedup_minhash", "q_dedup_simhash", "q_ngram_jaccard", "q_embed_dedup",
      "q_knn_lsh", "q_knn_ivf", "q_langid", "q_multimodal"
    )
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle or rows-only classification: $missing")
    val stale = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"oracles without queries: $stale")
  }
}
