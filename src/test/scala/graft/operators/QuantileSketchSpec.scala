package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mergeable hash-sample quantile sketch (N43/M24): the semilattice
  * merge law, the sampling-error bound, and the streaming twin.
  */
class QuantileSketchSpec extends SparkSpec {

  private def events = spark.read.parquet(s"$sfDir/events.parquet")
    .filter(col("value").isNotNull)

  test("merge of shard sketches is bit-identical to the global build") {
    val ev = events
    val global = SketchOps.quantileSampleSketch(
      ev, Seq("event_type"), "event_id", "value", k = 128)
    // 7 shards with skewed sizes — worst case for a wrong merge
    val shards = SketchOps.quantileSampleSketch(
      ev.withColumn("__shard", (col("event_id") % 7).cast("int")),
      Seq("event_type", "__shard"), "event_id", "value", k = 128)
    val merged = SketchOps.quantileSampleMerge(shards, Seq("event_type"), k = 128)
    val g = global.orderBy("event_type").collect()
    val m = merged.orderBy("event_type").collect()
    assert(g.length == m.length && g.length > 0)
    g.zip(m).foreach { case (a, b) =>
      assert(a.getAs[String]("event_type") == b.getAs[String]("event_type"))
      assert(a.getAs[Long]("n") == b.getAs[Long]("n"))
      assert(a.getSeq[Any](1) == b.getSeq[Any](1), s"sample arrays differ for ${a.get(0)}")
    }
  }

  test("quantile estimates land within the uniform-sampling rank-error bound") {
    val ev = events.filter(col("event_type") === "view")
    val k = 512
    val sk = SketchOps.quantileSampleSketch(ev, Seq("event_type"), "event_id", "value", k = k)
    val est = SketchOps.quantileSampleQuantiles(sk, Seq("event_type"), Seq(0.1, 0.5, 0.9))
      .collect().map(r => r.getAs[Double]("p") -> r.getAs[Double]("q")).toMap
    val vals = ev.select(col("value").cast("double")).collect().map(_.getDouble(0)).sorted
    // rank of the estimate in the TRUE distribution must be within
    // ~4/sqrt(k) of p (4 sigma of the sampling bound)
    val tol = 4.0 / math.sqrt(k.toDouble)
    est.foreach { case (p, q) =>
      val rank = vals.count(_ <= q).toDouble / vals.length
      assert(math.abs(rank - p) <= tol, s"p=$p est=$q achieved-rank=$rank tol=$tol")
    }
  }

  test("empty-group and small-group edges: sample smaller than k reads exactly") {
    import spark.implicits._
    val tiny = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0))
      .toDF("g", "id", "v")
    val sk = SketchOps.quantileSampleSketch(tiny, Seq("g"), "id", "v", k = 64)
    val qs = SketchOps.quantileSampleQuantiles(sk, Seq("g"), Seq(0.0, 0.5, 1.0))
      .collect().map(r => r.getAs[Double]("p") -> r.getAs[Double]("q")).toMap
    // sample IS the data: type-7 over (10,20,30)
    assert(qs(0.0) == 10.0 && qs(0.5) == 20.0 && qs(1.0) == 30.0, s"got $qs")
  }

  test("quantileSampleKs: identical distributions score ~0, shifted ones score the true gap") {
    import spark.implicits._
    val rnd = new scala.util.Random(91)
    // same distribution on both sides → D within sampling noise of 0;
    // side b shifted by +100 on half its mass → true D = 0.5
    val same = (1 to 4000).map(i => (i.toLong, "g", rnd.nextDouble() * 10))
    val a = SketchOps.quantileSampleSketch(same.toDF("id", "g", "v"), Seq("g"), "id", "v", k = 512)
    val b = SketchOps.quantileSampleSketch(
      same.map { case (i, g, v) => (i + 100000L, g, v) }.toDF("id", "g", "v"),
      Seq("g"), "id", "v", k = 512)
    val dSame = SketchOps.quantileSampleKs(a, b, Seq("g")).head().getAs[Double]("d_stat")
    assert(dSame < 0.15, s"same-dist D $dSame")
    val shifted = same.map { case (i, g, v) => (i + 200000L, g, if (i % 2 == 0) v + 100 else v) }
    val c = SketchOps.quantileSampleSketch(shifted.toDF("id", "g", "v"), Seq("g"), "id", "v", k = 512)
    val dShift = SketchOps.quantileSampleKs(a, c, Seq("g")).head().getAs[Double]("d_stat")
    assert(math.abs(dShift - 0.5) < 0.1, s"shifted D $dShift")
  }

  test("streaming windowed sketch equals the batch twin row-for-row") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val base = 1700000000000L
    val rows = (0 until 300).map { i =>
      (i.toLong, new java.sql.Timestamp(base + i * 60000L), if (i % 2 == 0) "a" else "b",
        math.pow(1.07, (i * 37) % 100)) // heavy-tailed values, unknown range
    }
    val batch = rows.toDF("event_id", "ts", "event_type", "value")
    val want = SketchOps.quantileSampleWindowed(
      batch, "ts", Seq("event_type"), "event_id", "value",
      k = 32, windowLen = "1 hour")
      .orderBy("window_start", "event_type").collect()

    val ms = MemoryStream[(Long, java.sql.Timestamp, String, Double)](spark)
    val out = SketchOps.quantileSampleWindowed(
      ms.toDF().toDF("event_id", "ts", "event_type", "value"),
      "ts", Seq("event_type"), "event_id", "value",
      k = 32, windowLen = "1 hour", watermark = "10 seconds")
    val q = out.writeStream.format("memory").queryName("qs_win")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      ms.addData(rows: _*)
      q.processAllAvailable()
      ms.addData((9999L, new java.sql.Timestamp(base + 86400000L), "zz", 0.0))
      q.processAllAvailable()
      val got = spark.table("qs_win").filter(col("event_type") =!= "zz")
        .orderBy("window_start", "event_type").collect()
      assert(got.length == want.length, s"${got.length} vs ${want.length}")
      got.zip(want).foreach { case (g, w) =>
        assert(g.getAs[java.sql.Timestamp]("window_start") == w.getAs[java.sql.Timestamp]("window_start"))
        assert(g.getAs[String]("event_type") == w.getAs[String]("event_type"))
        assert(g.getAs[Long]("n") == w.getAs[Long]("n"))
        assert(g.getSeq[Any](2) == w.getSeq[Any](2), "sample arrays differ")
      }
    } finally q.stop()
  }
}
