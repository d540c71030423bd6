package graft.operators

import graft.SparkSpec

class IntervalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def merged(rows: Seq[(String, Long, Long)], closedEnds: Boolean = true) =
    IntervalOps.mergeIntervals(rows.toDF("k", "s", "e"), "k", "s", "e", closedEnds)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

  test("mergeIntervals: overlap, touch, and gap behave per the closed-ends contract") {
    val out = merged(Seq(
      ("a", 0L, 10L), ("a", 5L, 12L),   // overlap -> one island
      ("a", 12L, 20L),                  // touches 12 == pmax -> merges (closed ends)
      ("a", 25L, 30L),                  // gap -> new island
      ("b", 0L, 1L)))
    assert(out == Set(
      ("a", 0L, 20L, 3L, 20L),
      ("a", 25L, 30L, 1L, 5L),
      ("b", 0L, 1L, 1L, 1L)))
  }

  test("mergeIntervals: half-open reading splits touching intervals") {
    val out = merged(Seq(("a", 0L, 10L), ("a", 10L, 20L)), closedEnds = false)
    assert(out == Set(("a", 0L, 10L, 1L, 10L), ("a", 10L, 20L, 1L, 10L)))
  }

  test("mergeIntervals: containment and duplicate intervals collapse") {
    val out = merged(Seq(("a", 0L, 100L), ("a", 10L, 20L), ("a", 10L, 20L), ("a", 30L, 40L)))
    assert(out == Set(("a", 0L, 100L, 4L, 100L)))
  }

  test("mergeIntervals: null key/start/end rows drop; inverted interval fails loudly") {
    val df = Seq(
      (Some("a"), Some(1L), Some(2L)),
      (None, Some(1L), Some(2L)),
      (Some("a"), None, Some(2L)),
      (Some("a"), Some(1L), None)
    ).toDF("k", "s", "e")
    val out = IntervalOps.mergeIntervals(df, "k", "s", "e").collect()
    assert(out.length == 1 && out.head.getLong(3) == 1L)

    val bad = Seq(("a", 5L, 3L)).toDF("k", "s", "e")
    val ex = intercept[Exception] {
      IntervalOps.mergeIntervals(bad, "k", "s", "e").collect()
    }
    assert(ex.getMessage != null)
  }

  test("mergeIntervals: equals a brute-force sweep on random per-key interval sets") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      val k = s"k${i % 7}"
      val s = rnd.nextInt(200).toLong
      (k, s, s + 1 + rnd.nextInt(15))
    }
    val got = merged(rows)
    // driver-side sweep per key
    val want = rows.groupBy(_._1).flatMap { case (k, ivs) =>
      val sorted = ivs.map(t => (t._2, t._3)).sortBy(identity)
      val islands = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      for ((s, e) <- sorted) {
        if (islands.nonEmpty && s <= islands.last._2)
          islands(islands.length - 1) =
            (islands.last._1, math.max(islands.last._2, e), islands.last._3 + 1)
        else islands.append((s, e, 1L))
      }
      islands.map(t => (k, t._1, t._2, t._3, t._2 - t._1))
    }.toSet
    assert(got == want)
  }

  test("coverageStats: islands, totals, and span per key") {
    val df = Seq(("a", 0L, 10L), ("a", 5L, 12L), ("a", 20L, 25L), ("b", 1L, 2L))
      .toDF("k", "s", "e")
    val out = IntervalOps.coverageStats(df, "k", "s", "e")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("a") == ((2L, 3L, 17L, 0L, 25L)))
    assert(out("b") == ((1L, 1L, 1L, 1L, 2L)))
  }

  test("mergeIntervals: plan keeps one exchange for windows + groupBy") {
    val df = Seq(("a", 0L, 10L), ("b", 5L, 12L)).toDF("k", "s", "e")
    val plan = IntervalOps.mergeIntervals(df, "k", "s", "e")
      .queryExecution.executedPlan.toString()
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected a single hash exchange, got $exchanges:\n$plan")
  }
}
