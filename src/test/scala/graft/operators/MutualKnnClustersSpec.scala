package graft.operators

import graft.SparkSpec

/** S14 mutual-kNN clusters: edges survive only when both endpoints
  * name each other in their top-k at cosine ≥ minCosine, then the
  * mutual set closes under connected components.
  */
class MutualKnnClustersSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 6

  private def vec(parts: (Int, Float)*): Seq[Float] = {
    val v = Array.fill(dim)(0.0f)
    parts.foreach { case (i, x) => v(i) = x }
    v.toSeq
  }

  test("twin pairs form isolated 2-clusters labeled by the min id") {
    // 4 well-separated twin pairs + 4 lone background vectors
    val rows =
      (0 until 4).flatMap { a =>
        Seq((a.toLong, vec(a -> 1.0f)), (100L + a, vec(a -> 1.0f)))
      } ++ (0 until 4).map { a =>
        (200L + a, vec(a -> 0.7f, ((a + 1) % 4) -> 0.714f))
      }
    val out = IvfKnnOps.mutualKnnClusters(rows.toDF("id", "vec"), "id", "vec",
        k = 2, minCosine = 0.999, nLists = 4, nProbe = 4, maxIter = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (0 until 4).flatMap(a => Seq(a.toLong -> a.toLong, (100L + a) -> a.toLong)).toMap
    assert(out == want, s"got $out")
  }

  test("one-way edges are filtered: a fan pointing at a twin pair stays out") {
    // y and z are exact twins; x sits at cosine ~0.98 from both. With
    // k = 1, x's rank-1 is y (or z) but their rank-1 is each other —
    // x's edge is never reciprocated.
    val rows = Seq(
      (1L, vec(0 -> 1.0f)),
      (2L, vec(0 -> 1.0f)),
      (3L, vec(0 -> 0.98f, 1 -> 0.19899748f)),
      (10L, vec(2 -> 1.0f)), (11L, vec(2 -> 1.0f)))
    val out = IvfKnnOps.mutualKnnClusters(rows.toDF("id", "vec"), "id", "vec",
        k = 1, minCosine = 0.9, nLists = 2, nProbe = 2, maxIter = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L), s"got $out")
  }

  test("mutual chains close transitively into one cluster") {
    // u—v and v—w both mutual at k=2; u—w only through v. CC must
    // put all three in one cluster labeled min id.
    val a = math.toRadians(12).toFloat
    val rows = Seq(
      (5L, vec(0 -> 1.0f)),
      (6L, vec(0 -> math.cos(a).toFloat, 1 -> math.sin(a).toFloat)),
      (7L, vec(0 -> math.cos(2 * a).toFloat, 1 -> math.sin(2 * a).toFloat)),
      (30L, vec(3 -> 1.0f)))
    val out = IvfKnnOps.mutualKnnClusters(rows.toDF("id", "vec"), "id", "vec",
        k = 2, minCosine = 0.97, nLists = 2, nProbe = 2, maxIter = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(5L -> 5L, 6L -> 5L, 7L -> 5L), s"got $out")
  }

  test("minCosine gate: below-threshold mutual pairs drop") {
    val a = math.toRadians(25).toFloat // cosine ~0.906
    val rows = Seq(
      (1L, vec(0 -> 1.0f)),
      (2L, vec(0 -> math.cos(a).toFloat, 1 -> math.sin(a).toFloat)))
    val strict = IvfKnnOps.mutualKnnClusters(rows.toDF("id", "vec"), "id", "vec",
        k = 1, minCosine = 0.95, nLists = 2, nProbe = 2, maxIter = 8).collect()
    assert(strict.isEmpty)
    val loose = IvfKnnOps.mutualKnnClusters(rows.toDF("id", "vec"), "id", "vec",
        k = 1, minCosine = 0.9, nLists = 2, nProbe = 2, maxIter = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(loose == Map(1L -> 1L, 2L -> 1L))
  }
}
