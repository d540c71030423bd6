package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S17: filtered ANN on the PERSISTED index path — the serving flow
  * (saveIndex → loadIndex → topKFiltered) must be correct AND carry
  * the two scan-side optimizations the layout exists for: the corpus
  * predicate PUSHED into the parquet reader, and the probed lists
  * pruning `list_id=` partitions (dynamic partition pruning via the
  * broadcast probe side).
  */
class IvfKnnPersistSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id", "embedding")
    val queries = emb.filter($"vec_id" < 8)
    val tagged = emb.withColumn("tag", when($"vec_id" % 2 === 0, "en").otherwise("de"))
    val twinDe = queries.select(($"vec_id" + 100000L).as("vec_id"), $"embedding", lit("de").as("tag"))
    val twinEn = queries.select(($"vec_id" + 200000L).as("vec_id"), $"embedding", lit("en").as("tag"))
    (queries, tagged.union(twinDe).union(twinEn))
  }

  test("save → load → filtered probe: the predicate-passing twin wins") {
    val (queries, corpus) = fixture
    val path = java.nio.file.Files.createTempDirectory("ivfpersist").toString + "/idx"
    IvfKnnOps.saveIndex(
      IvfKnnOps.buildIndex(corpus, "vec_id", "embedding", nLists = 8, maxIter = 5), path)
    val got = IvfKnnOps.topKFiltered(queries, IvfKnnOps.loadIndex(spark, path),
      "vec_id", "embedding", 5, nProbe = 4, predicate = $"tag" === "en")
      .filter($"rank" === 1)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toList
    // a broken/no-op filter would return the 'de' twin at +100000
    // (same cosine 1.0, lower id wins the tiebreak)
    assert(got == (0L until 8L).map(i => (i, i + 200000L, 1.0)).toList, got.toString)
  }

  test("plan guard: pushed predicate and list_id partition pruning reach the scan") {
    val (queries, corpus) = fixture
    val path = java.nio.file.Files.createTempDirectory("ivfpersistplan").toString + "/idx"
    IvfKnnOps.saveIndex(
      IvfKnnOps.buildIndex(corpus, "vec_id", "embedding", nLists = 8, maxIter = 5), path)
    val probe = IvfKnnOps.topKFiltered(queries, IvfKnnOps.loadIndex(spark, path),
      "vec_id", "embedding", 5, nProbe = 4, predicate = $"tag" === "en")
    val plan = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // predicate pushdown: the tag filter reaches the parquet reader
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(tag,en)"), plan)
    // partition pruning: the lists scan is constrained on list_id by
    // the probe side (dynamic pruning — only probed lists are read)
    assert(plan.contains("dynamicpruning"), plan)
  }
}
