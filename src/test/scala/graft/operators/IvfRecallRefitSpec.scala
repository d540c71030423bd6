package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Recall-triggered IVF refit (S11 follow-on): a drifted stream
  * degrades recall@k below threshold, the in-stream trigger fires an
  * offline refit + atomic swap, and post-refit recall recovers.
  *
  * Geometry: the initial corpus sits in 4 tight clusters around
  * axis directions e1..e4 (dim 5), so the fitted coarse quantizer
  * puts one centroid per axis. The drifted stream lands on the
  * e1/e2 BOUNDARY — points near (e1+e2)/2 jittered ±d along
  * (e1-e2), so the frozen quantizer splits the drifted cluster
  * across lists 1 and 2 by jitter sign. A boundary query with
  * nProbe=1 then sees only half its true neighbors (recall ~0.5).
  * A refit over the current corpus gives the drifted cluster its
  * own centroid, reuniting it in one list.
  */
class IvfRecallRefitSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 5

  private def axisVec(axis: Int, i: Long): Seq[Float] = {
    val v = Array.fill(dim)(0.0f)
    v(axis) = 1.0f
    v((axis + 1) % dim) = 0.02f * ((i % 5).toInt - 2) // deterministic jitter
    v.toSeq
  }

  /** Boundary point: (e1+e2)/2 jittered along (e1-e2) — sign by
    * parity (the frozen quantizer's split axis), magnitude cycling
    * 0.002..0.05 so a near-center query's true top-k MIXES both
    * signs (nearest = smallest |jitter|, either sign) while the
    * frozen e1/e2 centroids file the signs into different lists.
    */
  private def boundaryVec(i: Long): Seq[Float] = {
    val mag = 0.002f * (1 + (i % 25))
    val s = if (i % 2 == 0) mag else -mag
    Seq(0.5f + s, 0.5f - s, 0.0f, 0.0f, 0.0f)
  }

  /** Near-center probe query, slight +side bias for a deterministic
    * single-list assignment under the frozen quantizer.
    */
  private def boundaryQuery(i: Long): Seq[Float] =
    Seq(0.501f + 0.0001f * (i % 4), 0.499f, 0.0f, 0.0f, 0.0f)

  test("drifted stream degrades recall, trigger refits, recall recovers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpusA = (0L until 160L).map(i => (i, axisVec((i % 4).toInt, i)))
      .toDF("vec_id", "embedding")
    val index = IvfKnnOps.buildIndex(corpusA, "vec_id", "embedding", nLists = 4, maxIter = 8)
    val tmp = java.nio.file.Files.createTempDirectory("graft-refit-spec").toString
    IvfKnnOps.saveIndex(index, s"$tmp/idx")

    val drifted = (0L until 100L).map(i => (1000L + i, boundaryVec(i)))
    val probeQueries = (0L until 8L).map(i => (9000L + i, boundaryQuery(i)))
      .toDF("vec_id", "embedding")

    // 1. stream the drift in WITHOUT the trigger: recall must sink
    val ms = MemoryStream[(Long, Seq[Float])](spark)
    val mq = IvfKnnOps.maintainSavedIndexStream(
      spark, s"$tmp/idx", ms.toDF().toDF("vec_id", "embedding"), "embedding", s"$tmp/ckpt")
    try {
      ms.addData(drifted: _*)
      mq.processAllAvailable()
    } finally mq.stop()
    val degraded = IvfKnnOps.savedIndexRecall(
      spark, s"$tmp/idx", probeQueries, "vec_id", "embedding", k = 10, nProbe = 1)
    assert(degraded < 0.75, f"boundary split should halve recall, got $degraded%.3f")

    // 2. the trigger observes the degradation and refits + swaps
    val (before, fired, after) = IvfKnnOps.refitSavedIndexIfRecallBelow(
      spark, s"$tmp/idx", probeQueries, "vec_id", "embedding",
      k = 10, nProbe = 1, minRecall = 0.9, nLists = 5)
    assert(fired, s"trigger must fire below threshold (recall $before)")
    assert(before == degraded, "probe is deterministic")
    assert(after > 0.9, f"post-refit recall must recover, got $after%.3f")

    // 3. refit preserved every stored vector (no row lost in the swap)
    val stored = IvfKnnOps.loadIndex(spark, s"$tmp/idx").assigned
    assert(stored.count() == 260L)
    assert(stored.select("vec_id").distinct().count() == 260L)

    // 4. above threshold now: trigger is a no-op
    val (b2, f2, a2) = IvfKnnOps.refitSavedIndexIfRecallBelow(
      spark, s"$tmp/idx", probeQueries, "vec_id", "embedding",
      k = 10, nProbe = 1, minRecall = 0.9, nLists = 5)
    assert(!f2 && b2 == a2 && b2 > 0.9)
  }

  test("in-stream trigger: probeEvery batches, refit fires inside the maintenance loop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpusA = (0L until 160L).map(i => (i, axisVec((i % 4).toInt, i)))
      .toDF("vec_id", "embedding")
    val index = IvfKnnOps.buildIndex(corpusA, "vec_id", "embedding", nLists = 4, maxIter = 8)
    val tmp = java.nio.file.Files.createTempDirectory("graft-refit-stream").toString
    IvfKnnOps.saveIndex(index, s"$tmp/idx")

    val drifted = (0L until 100L).map(i => (1000L + i, boundaryVec(i)))
    val probeQueries = (0L until 8L).map(i => (9000L + i, boundaryQuery(i)))
      .toDF("vec_id", "embedding")
    val refits = new java.util.concurrent.CopyOnWriteArrayList[(Double, Double)]()

    val ms = MemoryStream[(Long, Seq[Float])](spark)
    val mq = IvfKnnOps.maintainSavedIndexStreamWithRefit(
      spark, s"$tmp/idx", ms.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", s"$tmp/ckpt",
      probeQueries, k = 10, nProbe = 1, minRecall = 0.9, nLists = 5,
      probeEvery = 2, onRefit = (b, a) => refits.add((b, a)))
    try {
      ms.addData(drifted.take(50): _*)
      mq.processAllAvailable() // batch 1: append only
      ms.addData(drifted.drop(50): _*)
      mq.processAllAvailable() // batch 2: probe -> degraded -> refit
    } finally mq.stop()

    assert(refits.size == 1, s"exactly one refit expected, got ${refits.size}")
    val (b, a) = refits.get(0)
    assert(b < 0.9 && a > 0.9, f"refit $b%.3f -> $a%.3f")
    // post-swap maintenance kept all rows and the probe agrees
    val recallNow = IvfKnnOps.savedIndexRecall(
      spark, s"$tmp/idx", probeQueries, "vec_id", "embedding", k = 10, nProbe = 1)
    assert(recallNow > 0.9)
    assert(IvfKnnOps.loadIndex(spark, s"$tmp/idx").assigned.count() == 260L)
  }
}
