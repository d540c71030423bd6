package graft.operators

import graft.SparkSpec

class GiniSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)]) =
    StatsOps.giniConcentration(rows.toDF("g", "v", "id"), Seq("g"), "v", "id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap

  test("gini: equal shares score 0, total concentration scores (n-1)/n") {
    val out = run(Seq(
      ("eq", 10L, 1L), ("eq", 10L, 2L), ("eq", 10L, 3L), ("eq", 10L, 4L),
      ("one", 0L, 1L), ("one", 0L, 2L), ("one", 0L, 3L), ("one", 100L, 4L)))
    assert(out("eq")._3 == 0.0)
    assert(math.abs(out("one")._3 - 0.75) < 1e-9)
  }

  test("gini: the 1,2,3,4 textbook value is 0.25 and counts/totals are exact") {
    val out = run(Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L), ("g", 4L, 4L)))
    assert(out("g") == ((4L, 10L, 0.25)))
  }

  test("gini: zero-total group yields null, tie order does not change the value") {
    val out = run(Seq(("z", 0L, 1L), ("z", 0L, 2L)))
    assert(out("z")._3.isNaN)
    val a = run(Seq(("t", 5L, 1L), ("t", 5L, 2L), ("t", 10L, 3L)))
    val b = run(Seq(("t", 5L, 2L), ("t", 5L, 1L), ("t", 10L, 3L)))
    assert(a("t") == b("t"))
  }
}
