package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class EwmaTriangleSpec extends SparkSpec {
  import spark.implicits._

  private def snap9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9

  test("ewma window aggregate matches the snapped sequential recurrence") {
    val xs = Seq(10.0, 12.0, 11.0, 13.0, 12.0, 11.5, 50.0)
    val df = xs.zipWithIndex.map { case (x, i) => (1L, i, x) }.toDF("k", "i", "x")
    val w = Window.partitionBy("k").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = df
      .withColumn("e", graft.functions.EwmaAggregate.ewma(col("x"), 0.25).over(w))
      .orderBy("i").select("e").as[Double].collect()
    var b = 0.0; var ww = 1.0
    val want = xs.map { x =>
      b = snap9(0.25 * x + 0.75 * b); ww *= 0.75; b / (1.0 - ww)
    }
    got.zip(want).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12, s"$g vs $e") }
    // first value: adjusted EWMA of one point is the point itself
    assert(math.abs(got.head - 10.0) < 1e-12)
  }

  test("ewma: nulls skip without touching the state; all-null prefix gives null") {
    val df = Seq(
      (1L, 1, Some(10.0)), (1L, 2, None), (1L, 3, Some(20.0)),
      (2L, 1, None)
    ).toDF("k", "i", "x")
    val w = Window.partitionBy("k").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = df
      .withColumn("e", graft.functions.EwmaAggregate.ewma(col("x"), 0.25).over(w))
      .orderBy("k", "i").select("e").as[Option[Double]].collect()
    assert(got(0).contains(10.0))
    assert(got(1).contains(10.0)) // null row: state unchanged
    // third row: second non-null value
    val b2 = snap9(0.25 * 20.0 + 0.75 * snap9(0.25 * 10.0))
    assert(math.abs(got(2).get - b2 / (1.0 - 0.75 * 0.75)) < 1e-12)
    assert(got(3).isEmpty) // never saw a value
  }

  test("ewma merge law: composing two segments equals the one-pass scan (groupBy on 1 partition)") {
    // single ordered partition → update path; manual two-segment
    // compose must agree with the algebra b = b_r + w_r·b_l
    val xs = Seq(3.0, 7.0, 5.0, 9.0)
    def seg(vals: Seq[Double]) = {
      var b = 0.0; var w = 1.0
      vals.foreach { x => b = snap9(0.25 * x + 0.75 * b); w *= 0.75 }
      (b, w)
    }
    val (bl, wl) = seg(xs.take(2))
    val (br, wr) = seg(xs.drop(2))
    val (bAll, wAll) = seg(xs)
    // merge is exact apart from the per-step snap the one-pass scan
    // applies across the boundary — equality within a grid cell
    assert(math.abs((br + wr * bl) - bAll) < 2e-9)
    assert(wl * wr == wAll)
  }

  test("ewmaChart flags a planted spike against the prior band, never its own value") {
    val base = (1 to 20).map(i => (1L, i, 10.0 + (i % 3))) :+ ((1L, 21, 500.0))
    val out = DriftOps.ewmaChart(base.toDF("k", "i", "x"), Seq("k"), Seq("i"), "x")
      .orderBy("i").collect()
    val spike = out.last
    assert(spike.getAs[Boolean]("is_anomaly"))
    // the spike's own magnitude must not inflate the sigma that judges it
    assert(spike.getAs[Double]("sigma_prev") < 2.0)
    val calm = out.dropRight(1).drop(5)
    assert(calm.forall(r => !r.getAs[Boolean]("is_anomaly")))
    // warm-up rows: no verdict before minPrior prior values
    assert(out.take(5).forall(r => r.isNullAt(r.fieldIndex("is_anomaly"))))
  }

  test("triangleCounts: hand-checked graph; self-loops, dups, reversed edges normalized") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), // triangle {1,2,3}
      (3L, 4L), (4L, 5L), (5L, 3L), // triangle {3,4,5}
      (9L, 9L),                     // self-loop: dropped
      (2L, 1L), (1L, 2L)            // reversed + duplicate: one edge
    ).toDF("src", "dst")
    val got = GraphOps.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("triangleCounts matches brute force on a random graph (hubs included)") {
    val rng = new scala.util.Random(13)
    val edges = (1 to 300).map(_ => (rng.nextInt(25).toLong, rng.nextInt(25).toLong))
    val norm = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2).distinct.toSet
    val nodes = norm.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val expect = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      Seq(a, b, c) <- nodes.combinations(3)
      if norm((a, b)) && norm((b, c)) && norm((a, c))
      n <- Seq(a, b, c)
    } expect(n) += 1
    val got = GraphOps.triangleCounts(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect.toMap)
  }

  test("triangleCounts: triangle-free (bipartite) graph emits nothing") {
    val edges = (for (a <- 1 to 5; b <- 10 to 14) yield (a.toLong, b.toLong)).toDF("src", "dst")
    assert(GraphOps.triangleCounts(edges).count() == 0)
  }

  test("triangleCounts: packed and two-column close-key branches agree") {
    // K4 minus edge (3,4): triangles {1,2,3} and {1,2,4}
    val base = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4))
    val want = Map("1" -> 2L, "2" -> 2L, "3" -> 1L, "4" -> 1L)
    // small non-negative ints → packed single-long close key
    val packed = GraphOps.triangleCounts(base.toDF("src", "dst"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(packed == want)
    // string ids → two-column fallback
    val str = GraphOps.triangleCounts(
      base.map { case (a, b) => (s"n$a", s"n$b") }.toDF("src", "dst"))
      .collect().map(r => r.getString(0).stripPrefix("n") -> r.getLong(1)).toMap
    assert(str == want)
    // negative ids: integral but below the packable range → fallback
    val neg = GraphOps.triangleCounts(
      base.map { case (a, b) => (a - 10, b - 10) }.toDF("src", "dst"))
      .collect().map(r => (r.getInt(0) + 10).toString -> r.getLong(1)).toMap
    assert(neg == want)
    // ids straddling the 2^31 packing bound → fallback, same counts
    val off = (1L << 31) - 5L
    val big = GraphOps.triangleCounts(
      base.map { case (a, b) => (a + off, b + off) }.toDF("src", "dst"))
      .collect().map(r => (r.getLong(0) - off).toString -> r.getLong(1)).toMap
    assert(big == want)
  }
}
