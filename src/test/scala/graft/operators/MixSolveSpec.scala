package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mixture-weight solving (G9/G10): the closed-form waterfill must
  * match an iterative reference solver on randomized instances, and
  * the LP invariants must hold.
  */
class MixSolveSpec extends SparkSpec {

  /** Iterative reference: repeatedly saturate any source whose
    * proportional share exceeds its cap, re-normalize the rest.
    */
  private def referenceWaterfill(
      src: Seq[(String, Double, Double)], budget: Double, maxRate: Double): Map[String, Double] = {
    val wSum = src.map(_._3).sum
    var p = src.map { case (s, _, w) => s -> w / wSum }.toMap
    val cap = src.map { case (s, a, _) => s -> a * maxRate }.toMap
    var sat = Set.empty[String]
    var done = false
    while (!done) {
      val rem = budget - sat.toSeq.map(cap).sum
      val pRem = src.collect { case (s, _, _) if !sat(s) => p(s) }.sum
      val newlySat = src.collect {
        case (s, _, _) if !sat(s) && pRem > 0 && p(s) / pRem * rem >= cap(s) => s
      }
      if (newlySat.isEmpty) done = true else sat ++= newlySat
    }
    val rem = budget - sat.toSeq.map(cap).sum
    val pRem = src.collect { case (s, _, _) if !sat(s) => p(s) }.sum
    src.map { case (s, _, _) =>
      s -> (if (sat(s)) cap(s) else if (pRem > 0) math.min(cap(s), p(s) / pRem * rem) else 0.0)
    }.toMap
  }

  test("closed-form waterfill equals the iterative reference on 25 random instances") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 25).foreach { trial =>
      val n = 2 + rnd.nextInt(8)
      val src = (0 until n).map(i =>
        (s"s$i", 100.0 + rnd.nextInt(10000), 1.0 + rnd.nextInt(9)))
      val budget = 500.0 + rnd.nextInt(20000)
      val maxRate = Seq(0.5, 0.8, 1.0)(rnd.nextInt(3))
      val got = MixOps.solveMixtureBudget(
        src.toDF("source", "avail", "w"), "source", "avail", "w", budget, maxRate)
        .select("source", "take").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val want = referenceWaterfill(src, budget, maxRate)
      src.foreach { case (s, _, _) =>
        assert(math.abs(got(s) - want(s)) < 1e-4,
          s"trial $trial source $s: got ${got(s)} want ${want(s)} (budget $budget rate $maxRate inst $src)")
      }
    }
  }

  test("invariants: budget met when feasible, caps respected, unsaturated ratios exact") {
    import spark.implicits._
    val stats = Seq(("a", 1000.0, 1.0), ("b", 50000.0, 2.0), ("c", 200.0, 3.0), ("d", 30000.0, 4.0))
      .toDF("source", "avail", "w")
    val out = MixOps.solveMixtureBudget(stats, "source", "avail", "w", budget = 20000.0, maxRate = 0.8)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("cap"), r.getAs[Double]("take"), r.getAs[Double]("p"), r.getAs[Int]("saturated"))).toMap
    val total = out.values.map(_._2).sum
    assert(math.abs(total - 20000.0) < 1e-3, s"total $total")
    out.values.foreach { case (cap, take, _, _) => assert(take <= cap + 1e-6) }
    // a (cap 800) and c (cap 160) saturate under these weights
    assert(out("a")._4 == 1 && out("c")._4 == 1 && out("b")._4 == 0 && out("d")._4 == 0)
    // unsaturated takes split the remainder by weight: b:d = 2:4
    val rem = 20000.0 - out("a")._1 - out("c")._1
    assert(math.abs(out("b")._2 - rem * 2.0 / 6.0) < 1e-3)
    assert(math.abs(out("d")._2 - rem * 4.0 / 6.0) < 1e-3)
  }

  test("over-budget: every source saturates, under-delivery visible") {
    import spark.implicits._
    val stats = Seq(("a", 100.0, 1.0), ("b", 200.0, 1.0)).toDF("source", "avail", "w")
    val out = MixOps.solveMixtureBudget(stats, "source", "avail", "w", budget = 1e6, maxRate = 1.0)
      .collect().map(r => r.getAs[String]("source") -> (r.getAs[Double]("take"), r.getAs[Int]("saturated"))).toMap
    assert(out == Map("a" -> (100.0, 1), "b" -> (200.0, 1)))
  }

  test("applyMixture on a STREAM keeps exactly the batch-coin rows") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val stats = Seq(("a", 1000.0, 1.0), ("b", 2000.0, 3.0)).toDF("source", "avail", "w")
    val solved = MixOps.solveMixtureBudget(stats, "source", "avail", "w", budget = 1500.0)
    val rows = (1L to 400L).map(i => (i, if (i % 2 == 0) "a" else "b"))
    val want = MixOps.applyMixture(rows.toDF("id", "source"), solved, "source", "id")
      .select("id").as[Long].collect().toSet
    val ms = MemoryStream[(Long, String)](spark)
    val out = MixOps.applyMixture(ms.toDF().toDF("id", "source"), solved, "source", "id")
    val q = out.writeStream.format("memory").queryName("mix_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      ms.addData(rows.take(200): _*)
      q.processAllAvailable()
      ms.addData(rows.drop(200): _*)
      q.processAllAvailable()
      val got = spark.table("mix_stream").select("id").as[Long].collect().toSet
      assert(got == want, s"${got.diff(want)} extra, ${want.diff(got)} missing")
    } finally q.stop()
  }

  test("solveMixtureMax: exact ratios at the binding source's cap") {
    import spark.implicits._
    val stats = Seq(("a", 1000.0, 1.0), ("b", 10000.0, 1.0)).toDF("source", "avail", "w")
    val out = MixOps.solveMixtureMax(stats, "source", "avail", "w", maxRate = 1.0)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Double]("take")).toMap
    // T* = min(1000/0.5, 10000/0.5) = 2000 → each takes 1000
    assert(out == Map("a" -> 1000.0, "b" -> 1000.0), s"got $out")
  }
}
