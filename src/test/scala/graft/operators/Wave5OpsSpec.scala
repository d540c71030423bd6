package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 wave-5 operators: clustering coefficient, item-item
  * cosine similarity, nDCG@k (q_zipf is a pure composition of
  * already-specced tokenization + linearTrend).
  */
class Wave5OpsSpec extends SparkSpec {
  import spark.implicits._

  private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  test("clusteringCoefficient: triangle-with-tail has the textbook values") {
    // triangle a-b-c plus pendant d on a
    val e = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")).toDF("src", "dst")
    val r = GraphOps.clusteringCoefficient(e).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) Double.NaN else x.getDouble(3))).toMap
    assert(r("a") == ((3L, 1L, snap9(2.0 * 1 / 6))))   // 1 of 3 neighbor pairs closed
    assert(r("b") == ((2L, 1L, 1.0)))
    assert(r("c") == ((2L, 1L, 1.0)))
    assert(r("d")._1 == 1L && r("d")._2 == 0L && r("d")._3.isNaN) // degree-1 → null
  }

  test("itemCosineSimilarity: perfect co-occurrence scores 1, partial is damped") {
    // items 1,2 always together (3 baskets); item 3 joins once
    val rows = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L), (12L, 3L), (13L, 3L))
    val df = rows.toDF("basket", "item")
    val r = MiningOps.itemCosineSimilarity(df, "basket", "item", minCo = 1L)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5))).toMap
    assert(r((1L, 2L)) == ((3L, 3L, 3L, 1.0)))
    // cos(1,3) = 1/sqrt(3*2)
    assert(r((1L, 3L)) == ((3L, 2L, 1L, snap9(1.0 / math.sqrt(6.0)))))
    // minCo prunes the single-co pairs
    val pruned = MiningOps.itemCosineSimilarity(df, "basket", "item", minCo = 2L)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(pruned == Set((1L, 2L)))
  }

  test("ndcgAtK: perfect ranking is 1, inverted ranking is below it") {
    // rels 3,2,1,0 — ranking "good" lists them best-first
    val good = Seq(("q", 1, 3.0), ("q", 2, 2.0), ("q", 3, 1.0), ("q", 4, 0.0))
      .toDF("g", "pos", "rel")
    val rg = EvalOps.ndcgAtK(good, Seq("g"), Seq("pos"), "rel", k = 4).collect().head
    assert(rg.getLong(1) == 4 && rg.getDouble(4) == 1.0)
    val bad = Seq(("q", 1, 0.0), ("q", 2, 1.0), ("q", 3, 2.0), ("q", 4, 3.0))
      .toDF("g", "pos", "rel")
    val rb = EvalOps.ndcgAtK(bad, Seq("g"), Seq("pos"), "rel", k = 4).collect().head
    assert(rb.getDouble(4) < 1.0 && rb.getDouble(4) > 0.0)
    // dcg of the inverted list is the known closed form
    val ln2 = math.log(2.0)
    val dcgBad = snap9(0.0 + 1.0 / (math.log(3.0) / ln2) +
      2.0 / (math.log(4.0) / ln2) + 3.0 / (math.log(5.0) / ln2))
    assert(math.abs(rb.getDouble(2) - dcgBad) < 1e-9)
  }

  test("ndcgAtK: k truncates the given ranking but the ideal too; zero rel → null") {
    val df = Seq(("q", 1, 0.0), ("q", 2, 3.0)).toDF("g", "pos", "rel")
    // k=1: dcg sees only pos 1 (rel 0), idcg sees rel 3 at slot 1
    val r = EvalOps.ndcgAtK(df, Seq("g"), Seq("pos"), "rel", k = 1).collect().head
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 3.0 && r.getDouble(4) == 0.0)
    val none = Seq(("q", 1, 0.0), ("q", 2, 0.0)).toDF("g", "pos", "rel")
    assert(EvalOps.ndcgAtK(none, Seq("g"), Seq("pos"), "rel", k = 2)
      .collect().head.isNullAt(4))
  }
}
