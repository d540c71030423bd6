package graft.operators

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Local union-find ground truth with min-id component labels. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(id => id -> find(id)).toMap
  }

  private def cc(edges: Seq[(Long, Long)], maxIter: Int = 50): Map[Long, Long] =
    GraphOps.connectedComponents(edges.toDF("src", "dst"), maxIter)
      .as[(Long, Long)].collect().toMap

  test("chain converges in O(log n) rounds, not O(length)") {
    // a 64-node chain: min-label propagation would need 63 rounds;
    // large-star/small-star must finish within 10
    val chain = (0L until 63L).map(i => (i, i + 1))
    assert(cc(chain, maxIter = 10) == (0L to 63L).map(_ -> 0L).toMap)
  }

  test("star, triangle, disjoint components, reversed/duplicate edges") {
    val edges = Seq(
      (5L, 1L), (1L, 9L), (9L, 5L),       // triangle with dup coverage
      (20L, 21L), (21L, 20L), (20L, 21L), // reversed + duplicate
      (30L, 31L), (30L, 32L), (30L, 33L)  // star
    )
    assert(cc(edges) == unionFind(edges))
  }

  test("self-loops are dropped") {
    val got = cc(Seq((7L, 7L), (1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("empty edge set") {
    assert(cc(Nil).isEmpty)
  }

  test("string ids: lexicographic component min") {
    val got = GraphOps.connectedComponents(
      Seq(("b", "c"), ("c", "a"), ("x", "y")).toDF("src", "dst"))
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("randomized graphs match union-find") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 8) {
      val n = 40 + rnd.nextInt(40)
      val nEdges = 20 + rnd.nextInt(80)
      val edges = Seq.fill(nEdges)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      assert(cc(edges) == unionFind(edges), s"trial $trial: n=$n edges=$edges")
    }
  }

  /** Local power-method replay with the same 1e-9 snapping. */
  private def localPageRank(
      edges: Seq[(String, String)], iters: Int, d: Double = 0.85): Map[String, Double] = {
    val dedup = edges.distinct
    val nodes = dedup.flatMap(e => Seq(e._1, e._2)).distinct
    val n = nodes.size.toDouble
    val out = dedup.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    def snap(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    var r = nodes.map(_ -> snap(1.0 / n)).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map[String, Double]().withDefaultValue(0.0)
      dedup.foreach { case (s, t) => contrib(t) += r(s) / out(s) }
      val dm = nodes.filterNot(out.contains).map(r).sum
      r = nodes.map(nd => nd -> snap((1.0 - d) / n + d * (contrib(nd) + dm / n))).toMap
    }
    r
  }

  test("pageRank matches a local power-method replay (with dangling mass)") {
    // b and d have no out-edges → dangling path exercised
    val edges = Seq(("a", "b"), ("a", "c"), ("c", "b"), ("c", "d"), ("e", "a"))
    val got = GraphOps.pageRank(edges.toDF("src", "dst"), iters = 4)
      .as[(String, Double)].collect().toMap
    val want = localPageRank(edges, iters = 4)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 2e-9, s"$k: $v vs ${want(k)}") }
    // probability mass conserved up to grid rounding
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
  }

  test("pageRank: star hub out-ranks leaves; duplicate edges collapse") {
    val star = Seq(("l1", "hub"), ("l2", "hub"), ("l3", "hub"), ("l1", "hub"))
    val r = GraphOps.pageRank(star.toDF("src", "dst"), iters = 3)
      .as[(String, Double)].collect().toMap
    assert(r("hub") > r("l1") && r("l1") == r("l2") && r("l2") == r("l3"))
    intercept[IllegalArgumentException](GraphOps.pageRank(star.toDF("src", "dst"), 0))
    intercept[IllegalArgumentException](GraphOps.pageRank(star.toDF("src", "dst"), 1, 1.5))
  }

  test("coOccurrenceEdges: pairs, dedup across groups, null skip, heavy-group cap") {
    val rows = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (1L, 11L), (1L, 12L),             // basket 1 → 3 pairs
      (2L, 10L), (2L, 11L),                        // basket 2 repeats (10,11)
      (2L, 10L),                                   // duplicate item row
      (3L, 50L),                                   // singleton → no pairs
      (4L, null), (null, 60L)                      // nulls skip
    ) ++ (0L until 10L).map(i => (java.lang.Long.valueOf(9L), java.lang.Long.valueOf(100L + i))) // heavy basket
    val df = rows.toDF("g", "item")
    val edges = GraphOps.coOccurrenceEdges(df, "g", "item", maxGroupSize = 5)
      .as[(Long, Long)].collect().toSet
    // heavy basket 9 (10 distinct items > 5) contributes nothing;
    // (10,11) appears in baskets 1 and 2 but emits once
    assert(edges == Set((10L, 11L), (10L, 12L), (11L, 12L)))
    val report = GraphOps.coOccurrenceOverflowReport(df, "g", "item", maxGroupSize = 5)
      .as[(Long, Long, Long)].collect().toList
    assert(report == List((9L, 10L, 45L)))
    intercept[IllegalArgumentException](GraphOps.coOccurrenceEdges(df, "g", "item", 1))
  }

  test("coOccurrenceEdges uncapped result matches the join shape; cap sentinel is exact") {
    // random baskets, compare against the naive self-join edge set
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(40).toLong))
    val df = rows.toDF("g", "item")
    val want = rows.distinct.groupBy(_._1).values.flatMap { basket =>
      val items = basket.map(_._2).distinct
      for (a <- items; b <- items if a < b) yield (a, b)
    }.toSet
    val got = GraphOps.coOccurrenceEdges(df, "g", "item", maxGroupSize = 40)
      .as[(Long, Long)].collect().toSet
    assert(got == want)
    // with a cap of 3, exactly the <=3-distinct-item baskets survive
    val small = rows.distinct.groupBy(_._1).collect {
      case (_, b) if b.map(_._2).distinct.size <= 3 => b.map(_._2).distinct
    }.flatMap(items => for (a <- items; b <- items if a < b) yield (a, b)).toSet
    val capped = GraphOps.coOccurrenceEdges(df, "g", "item", maxGroupSize = 3)
      .as[(Long, Long)].collect().toSet
    assert(capped == small)
  }

  test("labelPropagation: bridge-joined cliques keep two communities where CC merges them") {
    // two 4-cliques joined by one bridge edge 3-10
    def clique(ids: Seq[Long]) = for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = clique(Seq(0L, 1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L, 13L)) ++ Seq((3L, 10L))
    val labels = GraphOps.labelPropagation(edges.toDF("src", "dst"), iters = 4)
      .as[(Long, Long)].collect().toMap
    val commA = Set(0L, 1L, 2L, 3L).map(labels)
    val commB = Set(10L, 11L, 12L, 13L).map(labels)
    assert(commA.size == 1 && commB.size == 1, s"cliques not uniform: $labels")
    assert(commA != commB, "bridge should not merge the communities")
    // CC on the same graph merges everything — the contrast LPA exists for
    val cc0 = GraphOps.connectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(cc0.values.toSet.size == 1)
    intercept[IllegalArgumentException](
      GraphOps.labelPropagation(edges.toDF("src", "dst"), 0))
  }

  test("labelPropagation matches a local synchronous replay on random graphs") {
    val rnd = new scala.util.Random(3)
    val edges = (0 until 120).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(e => e._1 != e._2).distinct
    val got = GraphOps.labelPropagation(edges.toDF("src", "dst"), iters = 3)
      .as[(Long, Long)].collect().toMap
    // local sync replay: most frequent neighbor label, ties to min
    val und = (edges ++ edges.map(_.swap)).distinct
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      labels = adj.map { case (n, nbrs) =>
        val counts = nbrs.map(labels).groupBy(identity).view.mapValues(_.size)
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    assert(got == labels)
  }

  test("shortestHops: multi-source min hops, horizon bound, early frontier drain") {
    // path 0-1-2-3-4-5 plus isolated-from-sources node pair 100-101
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (100L, 101L))
    val sources = Seq(0L, 3L).toDF("node")
    val got = GraphOps.shortestHops(edges.toDF("src", "dst"), sources, maxHops = 2)
      .as[(Long, Int)].collect().toMap
    // min over both sources, capped at 2 hops; 100/101 unreachable
    assert(got == Map(0L -> 0, 3L -> 0, 1L -> 1, 2L -> 1, 4L -> 1, 5L -> 2))
    // drained frontier stops early: full reach needs no extra rounds
    val full = GraphOps.shortestHops(edges.toDF("src", "dst"), Seq(0L).toDF("node"), maxHops = 50)
      .as[(Long, Int)].collect().toMap
    assert(full == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4, 5L -> 5))
    intercept[IllegalArgumentException](
      GraphOps.shortestHops(edges.toDF("src", "dst"), sources, 0))
  }

  test("personalizedPageRank: mass conserved, seeds dominate, unreachable nodes at zero") {
    // two disjoint chains; seeds only in the first
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("x", "y"), ("y", "x"))
    val r = GraphOps.personalizedPageRank(
      edges.toDF("src", "dst"), Seq("a").toDF("node"), iters = 4)
      .as[(String, Double)].collect().toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-6, s"mass ${r.values.sum}")
    assert(r("x") == 0.0 && r("y") == 0.0, "unreachable component must hold zero rank")
    assert(r("a") > r("b") && r("b") > r("c") == false || r("a") > 0.2) // seed holds restart mass
    // local replay: p = (1,0,0,...), 4 damped iterations with snapping
    def snap(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    val nodes = Seq("a", "b", "c", "x", "y")
    val out = Map("a" -> Seq("b"), "b" -> Seq("c"), "c" -> Seq("a"),
      "x" -> Seq("y"), "y" -> Seq("x"))
    val p = nodes.map(n => n -> (if (n == "a") 1.0 else 0.0)).toMap
    var rank = p
    for (_ <- 1 to 4) {
      val contrib = nodes.map(n => n ->
        nodes.filter(m => out(m).contains(n)).map(m => rank(m) / out(m).size).sum).toMap
      rank = nodes.map(n => n -> snap(0.15 * p(n) + 0.85 * contrib(n))).toMap
    }
    nodes.foreach(n => assert(r(n) == rank(n), s"$n: ${r(n)} vs ${rank(n)}"))
    intercept[IllegalArgumentException](GraphOps.personalizedPageRank(
      edges.toDF("src", "dst"), Seq.empty[String].toDF("node"), 2))
  }

  test("pageRankWithPersonalizedOn: both columns bit-equal to the separate runs") {
    // asymmetric graph with a dangling sink (d) and an unreachable
    // island (x,y) — exercises dangling mass and the zero-rank path
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"),
      ("x", "y"), ("y", "x")).toDF("src", "dst")
    val em = GraphOps.degreeEdgeFrame(edges)
    try {
      val seeds = Seq("a").toDF("node")
      val fused = GraphOps.pageRankWithPersonalizedOn(em, seeds, iters = 4)
        .as[(String, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
      val global = GraphOps.pageRankOn(em, iters = 4)
        .as[(String, Double)].collect().toMap
      val seeded = GraphOps.personalizedPageRankOn(em, seeds, iters = 4)
        .as[(String, Double)].collect().toMap
      assert(fused.keySet === global.keySet)
      fused.foreach { case (n, (g, s)) =>
        assert(g === global(n), s"global rank of $n")
        assert(s === seeded(n), s"personalized rank of $n")
      }
    } finally em.unpersist()
  }

  test("linkPrediction: known wedge scores, existing edges excluded, hub gate") {
    // square 1-2-3-4-1 plus a spoke 5-1: diagonals (1,3),(2,4) have
    // 2 common neighbors; (2,5),(4,5) share neighbor 1; (3,5) shares none
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (5L, 1L))
    val got = GraphOps.linkPrediction(edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    def aa(degs: Seq[Int]) =
      math.floor(degs.map(d => 1.0 / math.log(d)).sum * 1e9 + 0.5) / 1e9
    // deg: 1 -> 3, 2 -> 2, 3 -> 2, 4 -> 2, 5 -> 1 (excluded: deg < 2 middles fine)
    assert(got == Map(
      (1L, 3L) -> (2L, aa(Seq(2, 2))),   // via 2 and 4
      (2L, 4L) -> (2L, aa(Seq(3, 2))),   // via 1 and 3
      (2L, 5L) -> (1L, aa(Seq(3))),      // via 1
      (4L, 5L) -> (1L, aa(Seq(3)))))     // via 1
    // hub gate: middles over maxDegree contribute nothing
    val star = (1L to 10L).map(i => (0L, i))
    assert(GraphOps.linkPrediction(star.toDF("src", "dst"), maxDegree = 5).count() == 0)
    intercept[IllegalArgumentException](GraphOps.linkPrediction(star.toDF("src", "dst"), 1))
  }

  test("kCore: a clique survives, pendant chains peel off in cascade") {
    // 4-clique {1,2,3,4} + chain 4-5-6: k=3 keeps exactly the clique
    val clique = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val edges = (clique ++ Seq((4L, 5L), (5L, 6L))).toDF("src", "dst")
    val got = GraphOps.kCore(edges, k = 3).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $got")
  }

  test("kCore: a tree has no 2-core; a cycle is its own 2-core") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    assert(GraphOps.kCore(path, k = 2).count() == 0)
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = GraphOps.kCore(cycle, k = 2).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: round cap beyond convergence is idempotent; dup/reversed edges normalize") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L),
      (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val a = GraphOps.kCore(messy, k = 2, maxRounds = 3).as[(Long, Long)].collect().toSet
    val b = GraphOps.kCore(messy, k = 2, maxRounds = 40).as[(Long, Long)].collect().toSet
    assert(a == b && a == Set((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("dupClusters distributed path (threshold 0) agrees with the driver path") {
    val pairs = Seq((10L, 11L), (11L, 12L), (40L, 41L)).toDF("id_a", "id_b")
    val driver = DedupOps.dupClusters(pairs).as[(Long, Long)].collect().toMap
    val dist = DedupOps.dupClusters(pairs, driverEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(driver == dist)
    assert(dist == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 40L -> 40L, 41L -> 40L))
  }
}
