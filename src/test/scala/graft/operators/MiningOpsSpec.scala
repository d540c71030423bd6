package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MiningOpsSpec extends SparkSpec {
  import spark.implicits._

  test("associationRules: textbook supports, confidence and lift") {
    // baskets: {1,2} x3, {1} x1, {2} x1, {1,3} x1
    // supp(1)=5, supp(2)=4, supp(1,2)=3, N=6
    // conf(1→2)=3/5=.6  conf(2→1)=3/4=.75  lift=3*6/(5*4)=.9
    val rows = Seq(
      ("b1", 1L), ("b1", 2L), ("b2", 1L), ("b2", 2L), ("b3", 1L), ("b3", 2L),
      ("b4", 1L), ("b5", 2L), ("b6", 1L), ("b6", 3L))
    val out = MiningOps.associationRules(rows.toDF("b", "i"), "b", "i",
        minSupport = 2L, minConfidence = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(5), r.getDouble(6))).toMap
    assert(out((1L, 2L)) == ((3L, 0.6, 0.9)))
    assert(out((2L, 1L)) == ((3L, 0.75, 0.9)))
    assert(!out.contains((1L, 3L)), "supp(1,3)=1 < minSupport")
  }

  test("associationRules: duplicate item rows in one basket count once") {
    val rows = Seq(("b1", 1L), ("b1", 1L), ("b1", 2L), ("b2", 1L), ("b2", 2L))
    val out = MiningOps.associationRules(rows.toDF("b", "i"), "b", "i", 2L, 0.1)
      .filter(col("antecedent") === 1L).head()
    assert(out.getLong(2) == 2L && out.getLong(3) == 2L) // n_pair, n_ante
    assert(out.getDouble(5) == 1.0)
  }

  test("associationRules: over-cap baskets contribute no pairs but keep item supports") {
    val big = (1L to 50L).map(i => ("huge", i))
    val rows = big ++ Seq(("b1", 1L), ("b1", 2L), ("b2", 1L), ("b2", 2L))
    val out = MiningOps.associationRules(rows.toDF("b", "i"), "b", "i",
      minSupport = 2L, minConfidence = 0.1, maxBasketSize = 10)
    val r = out.filter(col("antecedent") === 1L && col("consequent") === 2L).head()
    // pair only from b1/b2; supports include the capped basket's rows
    assert(r.getLong(2) == 2L && r.getLong(3) == 3L && r.getLong(4) == 3L)
  }

  test("topEventNgrams: counts every consecutive run with deterministic ties") {
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "b"), (1L, 5L, "c"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c"))
      .toDF("user", "seq", "t")
    val out = SequenceOps.topEventNgrams(ev, "user", Seq("seq"), "t", n = 3, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a>b>c") == 2L)
    assert(out("b>c>b") == 1L && out("c>b>c") == 1L)
    assert(out.size == 3)
  }

  test("histogram: clamp-to-edge binning with exact counts and edges") {
    val df = Seq(("g", -5.0), ("g", 0.0), ("g", 24.9), ("g", 25.0), ("g", 999.0))
      .toDF("grp", "v")
    val out = StatsOps.histogram(df, Seq("grp"), "v", 0.0, 100.0, 4)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(0L) == ((3L, 0.0, 25.0)))   // -5 clamps in, 0, 24.9
    assert(out(1L) == ((1L, 25.0, 50.0)))  // 25.0 is the next bin's closed edge
    assert(out(3L) == ((1L, 75.0, 100.0))) // 999 clamps to the top bin
  }
}
