package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S16 filtered ANN + the r13-ADVICE classify contract: the
  * predicate must constrain the candidate set BEFORE ranking (not
  * post-filter an already-ranked top-k), and classify must keep
  * queries visible when their neighbors carry no labels.
  */
class FilteredAnnSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 6

  private def clusterVec(axis: Int, i: Long): Seq[Float] = {
    val v = Array.fill(dim)(0.0f)
    v(axis) = 1.0f
    v(4) = 0.03f * ((i % 7).toInt - 3)
    v(5) = 0.02f * ((i % 5).toInt - 2)
    v.toSeq
  }

  // tag alternates WITHIN each cluster (by within-cluster position
  // i/4), so every query's own probe list keeps >= k predicate
  // survivors — the regime where pre-filtered IVF is exact. Tagging
  // by raw id parity instead empties entire clusters (cluster 1 is
  // all-odd) and measures the documented probe-width recall trade,
  // not correctness.
  private lazy val corpus = (0L until 80L)
    .map(i => (i, clusterVec((i % 4).toInt, i / 4), if ((i / 4) % 2 == 0) "en" else "de"))
    .toDF("id", "vec", "tag")

  test("topKFiltered equals brute force over the pre-filtered corpus") {
    val queries = corpus.filter(col("id") < 8).select("id", "vec")
    val index = IvfKnnOps.buildIndex(corpus, "id", "vec", nLists = 4, maxIter = 8)
    val filtered = IvfKnnOps.topKFiltered(queries, index, "id", "vec",
      k = 3, nProbe = 2, predicate = col("tag") === "en")
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val bf = KnnOps.bruteForceTopK(queries,
      corpus.filter(col("tag") === "en").select("id", "vec"), "id", "vec", 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(filtered == bf, {
      val diff = (bf.keySet ++ filtered.keySet)
        .filter(k => filtered.get(k) != bf.get(k)).take(5)
      s"filtered IVF disagrees with filtered brute force at " +
        diff.map(k => s"$k: ivf=${filtered.get(k)} bf=${bf.get(k)}").mkString(", ")
    })
    // every survivor must satisfy the predicate ((i/4) parity rule)
    assert(filtered.keySet.nonEmpty && filtered.forall { case (_, (nid, _)) => (nid / 4) % 2 == 0 },
      "a predicate-failing row leaked into the filtered top-k")
  }

  test("the excluded exact twin never outranks the included one") {
    // two exact twins per query: excluded 'de' at +100 (wins the
    // id-asc tiebreak if the filter is a no-op), included 'en' at
    // +200 — rank-1 must be +200 at cosine 1.0
    val queries = corpus.filter(col("id") < 4).select("id", "vec")
    val twinDe = queries.select((col("id") + 100L).as("id"), col("vec"), lit("de").as("tag"))
    val twinEn = queries.select((col("id") + 200L).as("id"), col("vec"), lit("en").as("tag"))
    val all = corpus.union(twinDe).union(twinEn)
    val index = IvfKnnOps.buildIndex(all, "id", "vec", nLists = 4, maxIter = 8)
    val r1 = IvfKnnOps.topKFiltered(queries, index, "id", "vec",
      k = 2, nProbe = 2, predicate = col("tag") === "en")
      .filter(col("rank") === 1)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    (0L until 4L).foreach { i =>
      assert(r1(i) == (i + 200L, 1.0), s"query $i rank-1 = ${r1(i)}, want (${i + 200L}, 1.0)")
    }
  }

  test("adaptive widening recovers survivors the fixed probe width provably misses") {
    // all 'rare' survivors live on axis 7 — the LAST list in every
    // query's probe order — so a fixed nProbe=4 of 8 returns ZERO
    // rows while the measured selectivity widens to the nLists cap
    // and must find each query's own signature twin (cos θ match)
    val nQ = 6
    val queries = (0 until nQ).map { i =>
      val th = i * math.Pi / 40
      (i.toLong, Seq(10f, math.cos(th).toFloat, math.sin(th).toFloat, 0f, 0f, 0f, 0f, 0f))
    }.toDF("id", "vec")
    val common = (0L until 400L).map { i =>
      (i + 1000L, Seq.tabulate(8)(j => if (j == (i % 7).toInt) 10f else 0f), (i % 7).toInt, "common")
    }.toDF("id", "vec", "list_id", "tag")
    val rare = (0 until nQ).map { i =>
      val th = i * math.Pi / 40
      (i + 300000L, Seq(0f, math.cos(th).toFloat, math.sin(th).toFloat, 0f, 0f, 0f, 0f, 10f), 7, "rare")
    }.toDF("id", "vec", "list_id", "tag")
    val index = IvfKnnOps.IvfIndex(
      Array.tabulate(8)(j => (j, Array.tabulate(8)(i => if (i == j) 10.0 else 0.0))),
      common.union(rare))
    val pred = col("tag") === "rare"
    val fixed = IvfKnnOps.topKFiltered(queries, index, "id", "vec",
      k = 3, nProbe = 4, predicate = pred)
    assert(fixed.count() == 0L, "fixed probe width must miss the axis-7 survivors")
    val adaptive = IvfKnnOps.topKFilteredAdaptive(queries, index, "id", "vec",
      k = 3, nProbe = 4, predicate = pred)
      .filter(col("rank") === 1)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    (0 until nQ).foreach { i =>
      assert(adaptive(i.toLong) == (i + 300000L, 0.009901),
        s"query $i rank-1 = ${adaptive.get(i.toLong)}, want (${i + 300000L}, 0.009901)")
    }
    // empty survivor set degenerates to the full (empty) scan, not a crash
    val none = IvfKnnOps.topKFilteredAdaptive(queries, index, "id", "vec",
      k = 3, nProbe = 4, predicate = col("tag") === "absent")
    assert(none.count() == 0L)
  }

  test("classify keeps queries whose neighbors are all unlabeled") {
    // labels cover cluster-0 ids only; a cluster-1 query's neighbors
    // are unlabeled → it must emit (null, 0, 0), not vanish
    val queries = corpus.filter(col("id") === 0L || col("id") === 1L).select("id", "vec")
    val index = IvfKnnOps.buildIndex(corpus, "id", "vec", nLists = 4, maxIter = 8)
    val labels = corpus.filter(col("id") % 4 === 0)
      .select(col("id"), lit("c0").as("lab"))
    val out = IvfKnnOps.classify(queries, index, "id", "vec", labels, "lab",
      k = 3, nProbe = 1)
      .collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.contains(0L) && out.contains(1L),
      s"both queries must appear, got ${out.keySet}")
    assert(out(0L) == (Some("c0"), 3L, 3L), s"labeled query: ${out(0L)}")
    assert(out(1L) == (None, 0L, 0L),
      s"unlabeled-neighborhood query must surface as (null,0,0), got ${out(1L)}")
  }
}
