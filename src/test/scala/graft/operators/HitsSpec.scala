package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HitsSpec extends SparkSpec {
  import spark.implicits._

  test("hits: star authority dominates, spokes share hub mass equally") {
    // h1..h4 all point at one popular authority plus a private page
    val edges = (1 to 4).flatMap(h => Seq((s"h$h", "star"), (s"h$h", s"p$h")))
      .toDF("src", "dst")
    val out = GraphOps.hits(edges, iters = 2).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // authority: star gets 4 of 8 endpoint hits each round; privates 1 each
    assert(out("star")._2 > out("p1")._2 * 3.5, s"star auth ${out("star")}")
    // hubs are symmetric
    assert((1 to 4).map(h => out(s"h$h")._1).distinct.size == 1)
    // pure sources have auth 0; pure sinks have hub 0
    assert(out("h1")._2 == 0.0 && out("star")._1 == 0.0)
  }

  test("hits: L1 normalization — hub and auth columns each sum to ~1") {
    val edges = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("c", "z"), ("x", "z"))
      .toDF("src", "dst")
    val sums = GraphOps.hits(edges, iters = 3)
      .agg(sum("hub"), sum("auth")).head()
    assert(math.abs(sums.getDouble(0) - 1.0) < 1e-6, s"hub sum ${sums.getDouble(0)}")
    assert(math.abs(sums.getDouble(1) - 1.0) < 1e-6, s"auth sum ${sums.getDouble(1)}")
  }

  test("hits: duplicate edges collapse — scores match the deduped graph") {
    val base = Seq(("a", "x"), ("b", "x"), ("b", "y"))
    val dup = (base ++ base ++ base).toDF("src", "dst")
    val a = GraphOps.hits(base.toDF("src", "dst"), 2).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    val b = GraphOps.hits(dup, 2).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("containmentPairs: snippet inside a long doc found; jaccard would miss it") {
    val long = (1 to 60).map(i => s"word$i").mkString(" ")
    val snippet = (10 to 20).map(i => s"word$i").mkString(" ")
    val other = (100 to 160).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, long), (2L, snippet), (3L, other)).toDF("id", "body")
    val out = DedupOps.containmentPairs(df, "id", "body", 3, 0.8)
      .select("id_a", "id_b", "containment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((2L, 1L, 1.0)), s"got ${out.toSeq}")
  }

  test("containmentPairs: below-threshold overlap excluded; orientation is shorter→longer") {
    // half of A's shingles in B -> containment 0.5 < 0.8
    val a = (1 to 20).map(i => s"w$i").mkString(" ")
    val b = ((1 to 10).map(i => s"w$i") ++ (100 to 140).map(i => s"z$i")).mkString(" ")
    val df = Seq((1L, a), (2L, b)).toDF("id", "body")
    assert(DedupOps.containmentPairs(df, "id", "body", 3, 0.8).count() == 0)
  }

  test("cmsSketchWindowed (batch twin): cell sums match cmsSketch within each window") {
    val ev = Seq(
      ("2024-01-01 01:00:00", "a", 7L), ("2024-01-01 02:00:00", "a", 7L),
      ("2024-01-01 03:00:00", "a", 9L), ("2024-01-05 01:00:00", "a", 7L))
      .toDF("ts", "g", "v").withColumn("ts", col("ts").cast("timestamp"))
    val cells = SketchOps.cmsSketchWindowed(ev, "ts", Seq("g"), "v", "1 day", d = 2, w = 64)
    // window 1 holds three events (7,7,9); window of Jan 5 holds one
    val w1 = cells.filter(col("window_start") === lit("2024-01-01").cast("timestamp"))
    assert(w1.agg(sum("cnt")).head().getLong(0) == 6L) // 3 events x d=2
    assert(w1.agg(max("cnt")).head().getLong(0) == 2L) // the 7-cell pair
    val w5 = cells.filter(col("window_start") === lit("2024-01-05").cast("timestamp"))
    assert(w5.agg(sum("cnt")).head().getLong(0) == 2L)
  }
}
