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

  // ---- multi-level (r11): loop-until-no-gain contraction ----

  /** Ring of 10 triangles bridged by single edges — the classic
    * resolution-limit fixture (Fortunato–Barthélemy 2007): for a
    * ring of m K3-cliques, Q(single cliques) = 3/4 − 1/m and
    * Q(adjacent pairs) = 7/8 − 2/m, so past m = 8 cliques PAIRING
    * scores strictly more modularity than the per-clique partition —
    * a correct level-2 contraction must climb past level-1's
    * plateau.
    */
  private def cliqueRing: Seq[(Long, Long)] = {
    val k = 10
    val cliques = (0 until k).flatMap(c => clique((c * 10 + 1L) to (c * 10 + 3L)))
    val bridges = (0 until k).map(c =>
      (c * 10 + 3L, ((c + 1) % k) * 10 + 1L))
    cliques ++ bridges
  }

  test("louvainLevels: level 2 strictly improves modularity over level 1") {
    val g = GraphOps.canonicalize(cliqueRing.toDF("src", "dst"))
    // identity seed: level 1's contracted rounds resolve the cliques;
    // the ring of clique super-nodes then needs ANOTHER contraction
    // to pair them — the multi-level loop's reason to exist
    val seed = g.deg.select(col("node"), col("node").as("community"))
    val one = GraphOps.louvainRefine(g, seed, level1Rounds = 4,
      nodeCol = "node", labelCol = "community")
    val multi = GraphOps.louvainLevels(g, seed, roundsPerLevel = 4, maxLevels = 5)
    val q1 = GraphOps.modularityTotal(one)
    val qN = GraphOps.modularityTotal(multi)
    assert(qN > q1, s"multi-level Q $qN must beat single-level $q1")
    // the final partition still covers every node exactly once
    val labs = multi.labels.as[(Long, Long)].collect()
    assert(labs.map(_._1).toSet.size === 30)
    assert(labs.length === 30)
    // and communities grew past single cliques
    val sizes = labs.groupBy(_._2).map(_._2.length)
    assert(sizes.max >= 6, s"expected paired cliques, sizes: ${sizes.toSeq.sorted}")
  }

  test("louvainLevels: optimal partition stops at level 1 (no-gain termination)") {
    // two K5s + bridge, seeded with the KNOWN optimal partition
    // (clique membership, Q = 2·(10/21 − (21/42)²) = 0.452380952):
    // no contraction level can improve, so the loop must terminate
    // after one rejected candidate with the seed's own result
    val edges = (clique(1L to 5L) ++ clique(101L to 105L) :+ (5L, 101L)).toDF("src", "dst")
    val g = GraphOps.canonicalize(edges)
    val seed = g.deg.select(col("node"),
      when(col("node") <= 5L, lit(1L)).otherwise(lit(101L)).as("community"))
    val one = GraphOps.louvainRefine(g, seed, 4, "node", "community")
    val multi = GraphOps.louvainLevels(g, seed, roundsPerLevel = 4, maxLevels = 5)
    val qOne = GraphOps.modularityTotal(one)
    assert(qOne === 0.452380952)
    assert(GraphOps.modularityTotal(multi) === qOne)
    assert(multi.labels.as[(Long, Long)].collect().toSet ===
      one.labels.as[(Long, Long)].collect().toSet)
  }

  test("louvainLevels deterministic across repartitionings") {
    val df = cliqueRing.toDF("src", "dst")
    val a = GraphOps.louvainLevels(df, roundsPerLevel = 2, maxLevels = 3)
      .labels.as[(Long, Long)].collect().toSet
    val b = GraphOps.louvainLevels(df.repartition(7), roundsPerLevel = 2, maxLevels = 3)
      .labels.as[(Long, Long)].collect().toSet
    assert(a === b)
  }
}
