package graft.operators

import graft.SparkSpec

class KMeansOpsSpec extends SparkSpec {
  import spark.implicits._

  private def pts = Seq(
    (0L, Array(0f, 0f)), (1L, Array(10f, 10f)),
    (2L, Array(1f, 0f)), (3L, Array(0f, 1f)),
    (4L, Array(9f, 10f)), (5L, Array(10f, 9f))
  ).toDF("vec_id", "embedding")

  test("fit: deterministic init from the k smallest ids, Lloyd's update") {
    val m = KMeansOps.fit(pts, "embedding", "vec_id", k = 2, iters = 1)
    // cluster 0 captures {0,2,3} → centroid (1/3, 1/3); cluster 1 {1,4,5} → (29/3, 29/3)
    val c0 = m.centroids(0)
    val c1 = m.centroids(1)
    assert(math.abs(c0(0) - 1.0 / 3) < 1e-9 && math.abs(c0(1) - 1.0 / 3) < 1e-9)
    assert(math.abs(c1(0) - 29.0 / 3) < 1e-9 && math.abs(c1(1) - 29.0 / 3) < 1e-9)
  }

  test("transform: assignments and rounded L2² distances") {
    val out = KMeansOps.fitTransform(pts, "embedding", "vec_id", k = 2, iters = 1)
      .as[(Long, Int, Double)].collect().sortBy(_._1).toList
    assert(out.map(_._2) == List(0, 1, 0, 0, 1, 1))
    // dist2 of point (0,0) to centroid (1/3,1/3) = 2/9, snapped to 1e-6
    val want = math.floor((2.0 / 9) * 1e6 + 0.5) / 1e6
    assert(out.head._3 == want)
    assert(out.forall(_._3 >= 0.0))
  }

  test("iters=0 assigns against the raw init points") {
    val out = KMeansOps.fitTransform(pts, "embedding", "vec_id", k = 2, iters = 0)
      .as[(Long, Int, Double)].collect().sortBy(_._1).toList
    assert(out.map(_._2) == List(0, 1, 0, 0, 1, 1))
    assert(out.head._3 == 0.0) // point 0 IS centroid 0
  }

  test("empty cluster keeps its previous centroid; argmin ties take the lower id") {
    // ids 0 and 1 are the same point → both init centroids identical →
    // every point ties to cluster 0, cluster 1 never captures a point
    val dup = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0f, 0f)), (2L, Array(4f, 0f))
    ).toDF("vec_id", "embedding")
    val m = KMeansOps.fit(dup, "embedding", "vec_id", k = 2, iters = 1)
    // every point tied to cluster 0 (lower id wins), so cluster 0
    // moved to the global mean and cluster 1 kept its init centroid
    assert(m.centroids(0)(0) == math.floor((4.0 / 3) * 1e9 + 0.5) / 1e9)
    assert(m.centroids(0)(1) == 0.0)
    assert(m.centroids(1).toList == List(0.0, 0.0))
    // argmin tie-break under identical centroids: all → cluster 0
    val clusters = KMeansOps.fitTransform(dup, "embedding", "vec_id", k = 2, iters = 0)
      .as[(Long, Int, Double)].collect().map(_._2).toSet
    assert(clusters == Set(0))
  }

  test("input validation") {
    intercept[IllegalArgumentException](KMeansOps.fit(pts, "embedding", "vec_id", 0, 1))
    intercept[IllegalArgumentException](KMeansOps.fit(pts, "embedding", "vec_id", 2, -1))
    intercept[IllegalArgumentException](KMeansOps.fit(pts, "embedding", "vec_id", 100, 1))
  }
}
