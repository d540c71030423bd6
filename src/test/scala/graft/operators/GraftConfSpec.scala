package graft.operators

import org.apache.spark.sql.functions._

import graft.{GraftConf, SparkSpec}

/** `spark.graft.*` conf plumbing: every embedded scale ceiling must
  * (a) honor a session override and (b) produce IDENTICAL results on
  * both sides of the ceiling — the conf moves the plan, never the
  * answer. Runs each guarded operator at the default setting and at
  * a forced-fallback setting (r12 verdict item: the ceilings were
  * hard-coded for the 128 GiB reference box; a 4–8 GB-executor
  * deployment must be able to lower them without recompiling).
  */
class GraftConfSpec extends SparkSpec {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private lazy val edges = {
    import spark.implicits._
    // K6 plus a pendant: 20 triangles on the clique, deterministic
    val clique = for (a <- 0L to 5L; b <- (a + 1) to 5L) yield (a, b)
    (clique :+ (5L, 6L)).toDF("src", "dst")
  }

  test("triangle broadcast ceiling: conf override flips the plan, not the answer") {
    def counts(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val broadcastSide = GraphOps.triangleCounts(edges)
    val pDefault = broadcastSide.queryExecution.executedPlan.toString
    assert(pDefault.contains("BroadcastHashJoin"),
      s"default ceiling (16M) must broadcast a 16-edge close join:\n${pDefault.take(2000)}")

    val (fallback, pFallback) = withConf(GraftConf.TriangleBroadcastMaxEdges -> "4") {
      val df = GraphOps.triangleCounts(edges)
      (counts(df), df.queryExecution.executedPlan.toString)
    }
    assert(pFallback.contains("ShuffledHashJoin"),
      s"past the ceiling the close join must be shuffled-hash (never sort-merge):\n${pFallback.take(2000)}")
    // the r12 pathology: sort-merge on the packed close key sorts the
    // O(m^1.5) wedge frame (18 min of spill at sf1). SMJ on the m-row
    // wedge SELF-join key (src) is fine; SMJ on __bc never is.
    assert(!pFallback.replaceAll("\\s+", " ").matches(".*SortMergeJoin \\[__bc.*"),
      pFallback.take(2000))
    assert(fallback == counts(broadcastSide), "ceiling must not change results")
  }

  test("degree broadcast ceiling honors the conf") {
    val dfDefault = GraphOps.pageRank(edges, iters = 2)
    val defaultRanks = dfDefault.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val small = withConf(GraftConf.DegreeBroadcastMaxNodes -> "2") {
      GraphOps.pageRank(edges, iters = 2)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    assert(small.keySet == defaultRanks.keySet)
    small.foreach { case (k, v) => assert(math.abs(v - defaultRanks(k)) < 1e-12) }
  }

  test("dedup driver union-find threshold reads the conf when defaulted") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val viaDriver = DedupOps.dupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // conf = 0 disables the driver path → distributed star-contraction
    val viaDistributed = withConf(GraftConf.DedupDriverEdgeThreshold -> "0") {
      DedupOps.dupClusters(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(viaDriver == viaDistributed)
    assert(viaDriver(3L) == 1L && viaDriver(11L) == 10L)
    // explicit parameter still wins over the conf
    val explicit = withConf(GraftConf.DedupDriverEdgeThreshold -> "0") {
      DedupOps.dupClusters(pairs, driverEdgeThreshold = 100L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(explicit == viaDriver)
  }

  test("ANN fit sample cap reads the conf when defaulted") {
    import spark.implicits._
    val vecs = (0 until 40)
      .map(i => (i.toLong, Array(i.toDouble, (i * 7 % 11).toDouble)))
      .toDF("id", "vec")
    val capped = withConf(GraftConf.AnnFitMaxSample -> "8") {
      IvfKnnOps.sampleVectors(vecs, "vec", -1)
    }
    assert(capped.length == 8, s"conf cap 8 must bound the fit sample, got ${capped.length}")
    // explicit parameter still wins
    val explicit = withConf(GraftConf.AnnFitMaxSample -> "8") {
      IvfKnnOps.sampleVectors(vecs, "vec", 20)
    }
    assert(explicit.length == 20)
    // malformed conf fails loudly
    val e = intercept[IllegalArgumentException] {
      withConf(GraftConf.AnnFitMaxSample -> "lots") {
        IvfKnnOps.sampleVectors(vecs, "vec", -1)
      }
    }
    assert(e.getMessage.contains(GraftConf.AnnFitMaxSample), e.getMessage)
  }
}
