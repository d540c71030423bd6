package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 wave-12 operators: Spearman matrix, PR curve, streaming
  * quality monitor.
  */
class Wave12OpsSpec extends SparkSpec {
  import spark.implicits._

  private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  test("spearmanMatrix: monotone nonlinear relation scores 1.0 where Pearson does not") {
    // y = x^3 — perfectly monotone, not linear
    val rows = (1 to 12).flatMap(e =>
      Seq((e.toLong, "x", e.toDouble), (e.toLong, "y", math.pow(e.toDouble, 3))))
    val df = rows.toDF("ent", "feat", "v")
    val sp = StatsOps.spearmanMatrix(df, "ent", "feat", "v").collect().head
    assert(sp.getDouble(3) == 1.0, s"spearman: $sp")
    val pe = StatsOps.correlationMatrix(df, "ent", "feat", "v").collect().head
    assert(pe.getDouble(3) < 0.95, s"pearson should be < 1 on x^3: $pe")
    // anti-monotone → −1
    val anti = (1 to 8).flatMap(e =>
      Seq((e.toLong, "x", e.toDouble), (e.toLong, "y", -math.exp(e.toDouble))))
    val sa = StatsOps.spearmanMatrix(anti.toDF("ent", "feat", "v"), "ent", "feat", "v")
      .collect().head
    assert(sa.getDouble(3) == -1.0)
  }

  test("spearmanMatrix: ties share the average rank") {
    // x: 1,1,2 → ranks 1.5,1.5,3 — verify via a hand Pearson on ranks
    val df = Seq((1L, "x", 1.0), (2L, "x", 1.0), (3L, "x", 2.0),
      (1L, "y", 5.0), (2L, "y", 6.0), (3L, "y", 7.0)).toDF("ent", "feat", "v")
    val r = StatsOps.spearmanMatrix(df, "ent", "feat", "v").collect().head
    // normalized fractional ranks: x → (1.5,1.5,3)/3, y → (1,2,3)/3
    val xr = Seq(1.5 / 3, 1.5 / 3, 3.0 / 3); val yr = Seq(1.0 / 3, 2.0 / 3, 3.0 / 3)
    val mx = snap9(xr.sum / 3); val my = snap9(yr.sum / 3)
    val mxx = snap9(xr.map(a => a * a).sum / 3); val myy = snap9(yr.map(a => a * a).sum / 3)
    val mxy = snap9(xr.zip(yr).map(p => p._1 * p._2).sum / 3)
    val cov = snap9(mxy - mx * my)
    val vx = snap9(mxx - mx * mx); val vy = snap9(myy - my * my)
    assert(r.getDouble(3) == snap9(cov / math.sqrt(vx * vy)), r.toString)
  }

  test("prCurve: recall falls and precision shifts as the threshold rises") {
    val df = (1 to 100).map { i =>
      val score = i / 100.0
      (i.toLong, score, if (score >= 0.6) 1 else 0) // perfectly separable at 0.6
    }.toDF("id", "score", "lbl")
    val r = EvalOps.prCurve(df, "lbl", "score", Seq(0.3, 0.6, 0.9))
      .collect().map(x => x.getDouble(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4), x.getDouble(5))).toMap
    // t=0.6: exact separation → P=1, R=1
    assert(r(0.6) == ((41L, 0L, 0L, 1.0, 1.0)), r(0.6).toString)
    // t=0.3: all positives caught, precision diluted
    assert(r(0.3)._3 == 0L && r(0.3)._5 == 1.0 && r(0.3)._4 < 1.0)
    // t=0.9: precision 1, recall partial
    assert(r(0.9)._2 == 0L && r(0.9)._4 == 1.0 && r(0.9)._5 < 1.0)
  }

  test("checkWindowed: batch twin counts violations per window; streamed run matches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (ts("2024-01-01 01:00:00"), Some(5.0), "ok"),
      (ts("2024-01-01 02:00:00"), Some(50.0), "bad"),   // range violation
      (ts("2024-01-01 03:00:00"), None, "ok"),          // null violation
      (ts("2024-01-02 01:00:00"), Some(1.0), "ok"))
    val checks = Seq(QualityOps.NotNull("v"),
      QualityOps.InRange("v", 0.0, 10.0), QualityOps.InSet("st", Seq("ok")))
    val batch = QualityOps.checkWindowed(rows.toDF("ts", "v", "st"), "ts", checks, "1 day")
      .collect().map(_.toSeq).toSet
    val day1 = batch.filter(_(0).toString.startsWith("2024-01-01"))
    assert(day1.map(r => (r(1), r(3))) ==
      Set(("not_null(v)", 1L), ("in_range(v,0.0,10.0)", 1L), ("in_set(st)", 1L)))
    val ms = MemoryStream[(java.sql.Timestamp, Option[Double], String)](spark)
    val mon = QualityOps.checkWindowed(ms.toDF().toDF("ts", "v", "st"), "ts", checks,
      "1 day", watermark = "10 days")
    val q = mon.writeStream.format("memory").queryName("w12q")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      ms.addData(rows: _*); q.processAllAvailable()
      ms.addData((ts("2024-06-01 00:00:00"), Some(1.0), "ok")) // pusher
      q.processAllAvailable()
      val got = spark.table("w12q")
        .filter(col("window_start") < lit("2024-05-01")).collect().map(_.toSeq).toSet
      assert(got == batch, s"stream $got vs batch $batch")
    } finally q.stop()
  }

  test("inverseNormalTransform: Blom ranks through the Moro probit hit known quantiles") {
    // 99 distinct values: ranks 1..99, p = (r-.375)/99.25; the median
    // (r=50) maps to p≈0.5 → INT ≈ 0; symmetric tails mirror
    val df = (1 to 99).map(i => ("f", i.toDouble)).toDF("feat", "v")
    val r = NormalizeOps.inverseNormalTransform(df, "feat", "v")
      .collect().map(x => x.getDouble(1) -> x.getDouble(2)).toMap
    assert(math.abs(r(50.0)) < 0.01, s"median INT ${r(50.0)}")
    assert(math.abs(r(25.0) + r(75.0)) < 1e-6, "symmetry")
    // standard normal quartiles: p=0.25 -> -0.6745
    assert(math.abs(r(25.0) - (-0.6745)) < 0.02, s"q1 ${r(25.0)}")
    // extreme tail goes through the ln(-ln) branch and is finite/ordered
    assert(r(1.0) < -2.0 && r(99.0) > 2.0 && r(1.0) == -r(99.0))
    // ties share a rank: two equal values get the same INT
    val t = NormalizeOps.inverseNormalTransform(
      Seq(("f", 1.0), ("f", 2.0), ("f", 2.0), ("f", 3.0)).toDF("feat", "v"), "feat", "v")
      .collect().map(x => (x.getDouble(1), x.getDouble(2)))
    val twos = t.filter(_._1 == 2.0).map(_._2).distinct
    assert(twos.length == 1 && math.abs(twos.head) < 1e-9)
  }
}
