package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Synchronous Louvain local moves (D7o): bridged cliques separate,
  * the integer score argmax is deterministic, and the result scores
  * at least as much modularity as LPA on the same graph.
  */
class LouvainSpec extends SparkSpec {
  import spark.implicits._

  private def clique(ids: Seq[Long]) =
    for (a <- ids; b <- ids if a < b) yield (a, b)

  test("two bridged K5s resolve to two communities labeled by their min nodes") {
    val edges = (clique(1L to 5L) ++ clique(11L to 15L) :+ (5L, 11L))
      .toDF("src", "dst")
    val got = GraphOps.louvainMoves(edges, rounds = 3)
      .as[(Long, Long)].collect().toMap
    // each clique collapses to ONE community, and the two differ
    // (the exact surviving label depends on the synchronous round-1
    // moves under the bridge's degree heterogeneity)
    val left = (1L to 5L).map(got).toSet
    val right = (11L to 15L).map(got).toSet
    assert(left.size == 1 && right.size == 1 && left != right,
      s"partition: $got")
  }

  test("modularity of Louvain communities >= LPA communities on the co-order graph") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val edges = GraphOps.coOccurrenceEdges(li, "l_orderkey", "l_partkey", maxGroupSize = 64)
    def q(labels: org.apache.spark.sql.DataFrame, labelCol: String): Double =
      GraphOps.modularity(edges,
        labels.select(col("node"), col(labelCol).as("label")))
        .agg(sum("q_contrib")).head().getDouble(0)
    val lou = q(GraphOps.louvainMoves(edges, rounds = 2), "community")
    val lpa = q(GraphOps.labelPropagation(edges, iters = 2), "label")
    assert(lou >= lpa - 1e-9, s"louvain $lou vs lpa $lpa")
  }

  test("deterministic across runs and repartitionings") {
    val edges = (clique(1L to 4L) ++ clique(21L to 24L) ++ Seq((4L, 21L), (2L, 23L)))
      .toDF("src", "dst")
    val a = GraphOps.louvainMoves(edges, rounds = 2).as[(Long, Long)].collect().toSet
    val b = GraphOps.louvainMoves(edges.repartition(7), rounds = 2).as[(Long, Long)].collect().toSet
    assert(a == b)
  }
}
