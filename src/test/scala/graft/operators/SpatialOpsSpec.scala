package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpatialOpsSpec extends SparkSpec {
  import spark.implicits._

  private def pts(rows: Seq[(Long, Double, Double)], key: String) =
    rows.toDF(key, "x", "y")

  test("radiusJoin: finds pairs across cell boundaries, excludes beyond-radius") {
    val left = pts(Seq((1L, 9.9, 0.0), (2L, 50.0, 50.0)), "lid")
    val right = pts(Seq((10L, 10.1, 0.0), (20L, 75.0, 50.0)), "rid")
    val out = SpatialOps.radiusJoin(left, right, "x", "y", 10.0, Seq("lid"), Seq("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // (9.9, 0) and (10.1, 0) sit in different cells but 0.2 apart
    assert(out.map(p => (p._1, p._2)) == Set((1L, 10L)))
    assert(math.abs(out.head._3 - 0.04) < 1e-12)
  }

  test("radiusJoin: the boundary pair at exactly r is inclusive") {
    val left = pts(Seq((1L, 0.0, 0.0)), "lid")
    val right = pts(Seq((10L, 5.0, 0.0), (20L, 5.0000001, 0.0)), "rid")
    val out = SpatialOps.radiusJoin(left, right, "x", "y", 5.0, Seq("lid"), Seq("rid"))
      .collect().map(_.getLong(1)).toSet
    assert(out == Set(10L))
  }

  test("radiusJoin: matches the brute-force join on a random cloud") {
    val rnd = new scala.util.Random(7)
    val l = (1L to 200L).map(i => (i, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
    val r = (1L to 200L).map(i => (i + 1000L, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
    val got = SpatialOps.radiusJoin(pts(l, "lid"), pts(r, "rid"), "x", "y", 7.5,
      Seq("lid"), Seq("rid")).collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = (for {
      (a, ax, ay) <- l; (b, bx, by) <- r
      if (ax - bx) * (ax - bx) + (ay - by) * (ay - by) <= 7.5 * 7.5
    } yield (a, b)).toSet
    assert(got == want, s"grid join diverged: missing ${want -- got}, extra ${got -- want}")
  }

  test("radiusJoin: negative coordinates bucket correctly, nulls drop") {
    val left = Seq((Some(1L), Some(-0.1), Some(0.0)), (Some(2L), None, Some(1.0)))
      .toDF("lid", "x", "y")
    val right = Seq((Some(10L), Some(0.1), Some(0.0))).toDF("rid", "x", "y")
    val out = SpatialOps.radiusJoin(left, right, "x", "y", 1.0, Seq("lid"), Seq("rid"))
      .collect()
    assert(out.length == 1 && out.head.getLong(0) == 1L)
  }

  test("radiusJoin: plans a hash equi-join, never a cartesian/BNLJ") {
    val left = pts(Seq((1L, 0.0, 0.0)), "lid")
    val right = pts(Seq((10L, 5.0, 0.0)), "rid")
    val p = SpatialOps.radiusJoin(left, right, "x", "y", 5.0, Seq("lid"), Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
