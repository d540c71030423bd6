package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CmsSpec extends SparkSpec {
  import spark.implicits._

  private val items = (1 to 2000).map(i => ("g", s"item${i % 50}")) // 50 items × 40 each
  private def sketchOf(rows: Seq[(String, String)]) =
    SketchOps.cmsSketch(rows.toDF("g", "x"), Seq("g"), "x", d = 4, w = 2048)

  test("cms estimates are exact in the no-collision regime and always >= truth") {
    val est = SketchOps.cmsEstimate(sketchOf(items), Seq("g"),
      items.toDF("g", "x").groupBy("g", "x").agg(count(lit(1)).as("n_true")), "x")
    val rows = est.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("n_true"))
    }
    // 50 items into 4×2048 cells: overwhelmingly collision-free → exact
    assert(rows.count(r => r.getAs[Long]("cms_est") == r.getAs[Long]("n_true")) >= 48)
  }

  test("absent items estimate near zero; sketch frame is bounded by d*w") {
    val sk = sketchOf(items)
    assert(sk.count() <= 4L * 2048)
    val ghost = Seq(("g", "never_seen_item")).toDF("g", "x")
    val est = SketchOps.cmsEstimate(sk, Seq("g"), ghost, "x").collect().head
    assert(est.getAs[Long]("cms_est") <= 40L) // at worst one colliding bucket per row
  }

  test("sketches merge by summing cells: halves re-summed equal the whole") {
    val (a, b) = items.splitAt(1000)
    val merged = sketchOf(a).unionByName(sketchOf(b))
      .groupBy("g", "row_j", "bucket").agg(sum("cnt").as("cnt"))
    val whole = sketchOf(items)
    assert(merged.collect().map(_.toSeq).toSet == whole.collect().map(_.toSeq).toSet)
  }

  test("map-side combine: the sketch plan has a partial aggregate below the shuffle") {
    val plan = sketchOf(items).queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"), plan)
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"expected a single shuffle, got $exchanges:\n$plan")
  }
}
