package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S13 kNN graph: all-rows top-k neighbors through the IVF probe
  * plan. Correctness = exact agreement with brute force on a
  * well-separated geometry; scale = plan guards (no cartesian, no
  * broadcast of the n-row probe side, close join is shuffled-hash).
  */
class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 6

  /** 4 tight clusters around axes e0..e3: within-cluster cosine
    * ≈ 1, cross-cluster ≈ 0 — every vector's true top-k lives in its
    * own cluster, so IVF with one probe list per cluster is exact.
    */
  private def clusterVec(axis: Int, i: Long): Seq[Float] = {
    val v = Array.fill(dim)(0.0f)
    v(axis) = 1.0f
    v(4) = 0.03f * ((i % 7).toInt - 3)
    v(5) = 0.02f * ((i % 5).toInt - 2)
    v.toSeq
  }

  private lazy val corpus = (0L until 80L)
    .map(i => (i, clusterVec((i % 4).toInt, i / 4)))
    .toDF("id", "vec")

  test("knnGraph matches brute force on separated clusters") {
    val k = 3
    val g = IvfKnnOps.knnGraph(corpus, "id", "vec", k = k, nLists = 4,
      nProbe = 2, maxIter = 8)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val bf = KnnOps.bruteForceTopK(corpus, corpus, "id", "vec", k)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(g.size == 80 * k, s"every vector needs $k ranked neighbors, got ${g.size}")
    assert(g == bf, {
      val diff = (bf.keySet ++ g.keySet).filter(kk => g.get(kk) != bf.get(kk)).take(5)
      s"IVF graph disagrees with brute force at ${diff.map(kk => s"$kk: ivf=${g.get(kk)} bf=${bf.get(kk)}")}"
    })
  }

  test("planted twins are mutual rank-1 at cosine 1.0") {
    val twins = corpus.filter(col("id") < 8)
      .select((col("id") + 1000L).as("id"), col("vec"))
    val all = corpus.union(twins)
    val g = IvfKnnOps.knnGraph(all, "id", "vec", k = 2, nLists = 4,
      nProbe = 2, maxIter = 8)
      .filter(col("rank") === 1)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    (0L until 8L).foreach { i =>
      assert(g(i) == (i + 1000L, 1.0), s"query $i rank-1 should be its twin, got ${g(i)}")
      assert(g(i + 1000L) == (i, 1.0), s"twin ${i + 1000L} rank-1 should be $i, got ${g(i + 1000L)}")
    }
  }

  test("plan: shuffle-hash candidate join, no cartesian, no n-row broadcast") {
    val df = IvfKnnOps.knnGraph(corpus, "id", "vec", k = 2, nLists = 4,
      nProbe = 2, maxIter = 8)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"),
      s"candidate generation must be a shuffled-hash equi-join on list_id:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    assert(!p.contains("BroadcastHashJoin"),
      s"neither side may broadcast — the probe side is the full corpus:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("null vectors drop out; k bounds the per-query fan-out") {
    val withNulls = corpus.union(
      Seq((900L, null.asInstanceOf[Seq[Float]])).toDF("id", "vec"))
    val g = IvfKnnOps.knnGraph(withNulls, "id", "vec", k = 2, nLists = 4,
      nProbe = 2, maxIter = 8)
    val byQuery = g.groupBy("query_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!byQuery.contains(900L), "null-vector rows must not emit edges")
    assert(byQuery.values.forall(_ <= 2), "per-query fan-out must be <= k")
    assert(byQuery.size == 80)
  }
}
