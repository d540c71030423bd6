package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
  private val steps = Seq("view", "click", "buy")

  test("funnel resolves the earliest strictly-increasing chain") {
    val ev = Seq(
      // u1 completes: view@10, click@20 (the @5 click is BEFORE the view → ignored), buy@30
      ("u1", "click", ts(5)), ("u1", "view", ts(10)), ("u1", "click", ts(20)), ("u1", "buy", ts(30)),
      // u2 stalls at view: buy precedes the click chain
      ("u2", "view", ts(10)), ("u2", "buy", ts(5)),
      // u3 has only a click → reached 0 (no view)
      ("u3", "click", ts(1)),
      // u4 ties: click at the SAME instant as view is NOT strictly after
      ("u4", "view", ts(10)), ("u4", "click", ts(10))
    ).toDF("user_id", "event_type", "ts")
    val out = FunnelOps.funnel(ev, "user_id", "ts", "event_type", steps)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("u1").getAs[Int]("reached") == 3)
    assert(out("u1").getAs[java.sql.Timestamp]("t_1") == ts(20))
    assert(out("u2").getAs[Int]("reached") == 1)
    assert(out("u2").isNullAt(out("u2").fieldIndex("t_1")))
    assert(out("u3").getAs[Int]("reached") == 0)
    assert(out("u4").getAs[Int]("reached") == 1) // strict > at ties
  }

  test("funnel with a conversion deadline: late steps stop counting") {
    val ev = Seq(
      // u1: full chain inside 100s of t_0
      ("u1", "view", ts(10)), ("u1", "click", ts(50)), ("u1", "buy", ts(100)),
      // u2: click lands AFTER the deadline (t_0=10, deadline 110, click@150)
      ("u2", "view", ts(10)), ("u2", "click", ts(150)), ("u2", "buy", ts(160)),
      // u3: click inside, buy outside → reached 2
      ("u3", "view", ts(0)), ("u3", "click", ts(60)), ("u3", "buy", ts(200))
    ).toDF("user_id", "event_type", "ts")
    val out = FunnelOps.funnel(ev, "user_id", "ts", "event_type", steps,
        maxSpanSeconds = Some(100L))
      .collect().map(r => r.getString(0) -> r.getAs[Int]("reached")).toMap
    assert(out == Map("u1" -> 3, "u2" -> 1, "u3" -> 2), s"got $out")
    // deadline is inclusive: buy exactly at t_0+100 counts (u1)
  }

  test("funnel: non-step events never shuffle; absent users never appear") {
    val ev = Seq(
      ("u1", "view", ts(1)), ("u1", "scroll", ts(2)),
      ("u9", "scroll", ts(3)) // only non-step events
    ).toDF("user_id", "event_type", "ts")
    val out = FunnelOps.funnel(ev, "user_id", "ts", "event_type", steps)
    assert(out.select("user_id").as[String].collect().toSet == Set("u1"))
    // on a file source the step filter must reach the scan (pushed
    // below the aggregate), so non-step events never shuffle
    val filePlan = FunnelOps.funnel(
      spark.read.parquet(s"$sfDir/events.parquet"),
      "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    assert(filePlan.contains("PushedFilters: [In(event_type"), filePlan)
  }

  test("funnel: single-step and duplicate-step validation") {
    val ev = Seq(("u1", "view", ts(1))).toDF("user_id", "event_type", "ts")
    val one = FunnelOps.funnel(ev, "user_id", "ts", "event_type", Seq("view")).collect()
    assert(one.head.getAs[Int]("reached") == 1)
    intercept[IllegalArgumentException] {
      FunnelOps.funnel(ev, "user_id", "ts", "event_type", Seq("view", "view"))
    }
  }

  test("funnel agrees with a brute-force chain replay on random event logs") {
    val rng = new scala.util.Random(11)
    val types = Seq("view", "click", "buy", "other")
    val ev = (1 to 400).map { i =>
      (s"u${rng.nextInt(20)}", types(rng.nextInt(4)), ts(rng.nextInt(1000)))
    }
    val got = FunnelOps.funnel(ev.toDF("user_id", "event_type", "ts"),
        "user_id", "ts", "event_type", steps)
      .collect().map(r => r.getString(0) -> r.getAs[Int]("reached")).toMap
    val byUser = ev.filter(e => steps.contains(e._2)).groupBy(_._1)
    val expect = byUser.map { case (u, rows) =>
      var prev = Long.MinValue
      var reached = 0
      var done = false
      for (s <- steps if !done) {
        val cand = rows.filter(r => r._2 == s && r._3.getTime > prev).map(_._3.getTime)
        if (cand.isEmpty) done = true
        else { prev = cand.min; reached += 1 }
      }
      u -> reached
    }
    assert(got == expect)
  }
}
