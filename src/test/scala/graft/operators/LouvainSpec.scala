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

  test("contraction: every node keeps a community and Q >= local-moves-only") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val edges = GraphOps.coOccurrenceEdges(li, "l_orderkey", "l_partkey", maxGroupSize = 64)
    val r = GraphOps.louvain(edges, level0Rounds = 1, level1Rounds = 2)
    val nNodes = edges.select(explode(array(col("src"), col("dst"))).as("n"))
      .filter(col("src") =!= col("dst")).select("n").distinct().count()
    assert(r.labels.count() == nNodes, "contraction dropped nodes")
    def q(labels: org.apache.spark.sql.DataFrame): Double =
      GraphOps.modularity(edges, labels.select(col("node"), col("community").as("label")))
        .agg(sum("q_contrib")).head().getDouble(0)
    val contracted = q(r.labels)
    val movesOnly = q(GraphOps.louvainMoves(edges, rounds = 2))
    assert(contracted >= movesOnly - 1e-9,
      s"contracted Q $contracted < moves-only Q $movesOnly")
  }

  test("modularityOfLouvain equals node-level modularity scoring exactly") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val edges = GraphOps.coOccurrenceEdges(li, "l_orderkey", "l_partkey", maxGroupSize = 64)
    val r = GraphOps.louvain(edges, level0Rounds = 1, level1Rounds = 2)
    val fromContraction = GraphOps.modularityOfLouvain(r)
      .as[(Long, Long, Long, Double)].collect().toSet
    val fromNodes = GraphOps.modularity(edges,
        r.labels.select(col("node"), col("community").as("label")))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(fromContraction == fromNodes)
  }

  test("isolated super-node (single clique) keeps its community through level 1") {
    // one K4 plus one disconnected K3: after round 1 each collapses
    // to a community with NO external edges — level-1 moves must
    // retain them via the coalesce, not drop them
    val edges = (clique(1L to 4L) ++ clique(10L to 12L)).toDF("src", "dst")
    val r = GraphOps.louvain(edges, level0Rounds = 1, level1Rounds = 2)
    val got = r.labels.as[(Long, Long)].collect().toMap
    assert(got.keySet == (1L to 4L).toSet ++ (10L to 12L).toSet, s"nodes lost: $got")
    assert((1L to 4L).map(got).toSet.size == 1)
    assert((10L to 12L).map(got).toSet.size == 1)
    assert(got(1L) != got(10L))
  }

  test("LPA-seeded refinement only improves the seed's modularity (registry path)") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val g = GraphOps.canonicalize(
      GraphOps.coOccurrenceEdges(li, "l_orderkey", "l_partkey", maxGroupSize = 64))
    val lpa = GraphOps.labelPropagation(g, iters = 3)
    val refined = GraphOps.louvainRefine(g, lpa, level1Rounds = 4, "node", "label")
    def q(labels: org.apache.spark.sql.DataFrame, labelCol: String): Double =
      GraphOps.modularity(g.und.select(col("u").as("src"), col("v").as("dst")),
          labels.select(col("node"), col(labelCol).as("label")))
        .agg(sum("q_contrib")).head().getDouble(0)
    val qSeed = q(lpa, "label")
    val qRef = q(refined.labels, "community")
    assert(qRef >= qSeed - 1e-9, s"refined $qRef < seed $qSeed")
    // and the contraction-side scoring agrees with node-level scoring
    val viaContraction = GraphOps.modularityOfLouvain(refined)
      .agg(sum("q_contrib")).head().getDouble(0)
    assert(math.abs(viaContraction - qRef) < 1e-9)
  }

  test("louvain contraction deterministic across repartitionings") {
    val edges = (clique(1L to 4L) ++ clique(21L to 24L) ++ Seq((4L, 21L), (2L, 23L)))
      .toDF("src", "dst")
    val a = GraphOps.louvain(edges, 1, 2).labels.as[(Long, Long)].collect().toSet
    val b = GraphOps.louvain(edges.repartition(7), 1, 2).labels.as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("deterministic across runs and repartitionings") {
    val edges = (clique(1L to 4L) ++ clique(21L to 24L) ++ Seq((4L, 21L), (2L, 23L)))
      .toDF("src", "dst")
    val a = GraphOps.louvainMoves(edges, rounds = 2).as[(Long, Long)].collect().toSet
    val b = GraphOps.louvainMoves(edges.repartition(7), rounds = 2).as[(Long, Long)].collect().toSet
    assert(a == b)
  }
}
