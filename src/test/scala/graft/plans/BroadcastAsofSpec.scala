package graft.plans

import graft.SparkSpec
import graft.operators.AsofJoinOps
import graft.sources.BioLoader
import org.apache.spark.sql.functions._

class BroadcastAsofSpec extends SparkSpec {
  import spark.implicits._

  private def events = BioLoader.nanosToTimestamp(
    BioLoader.load(spark, s"$sfDir/events.parquet"), "ts")
    .select($"event_id", $"user_id", $"ts")
  private def orders = BioLoader.load(spark, s"$sfDir/orders.parquet")
    .groupBy($"o_custkey".as("user_id"), $"o_orderdate")
    .agg(max("o_totalprice").as("matched_price"))

  test("asofBroadcast matches the compositional asofBackward on real data") {
    val composed = AsofJoinOps
      .asofBackward(events.withColumnRenamed("ts", "t"), orders, "user_id", "t", "o_orderdate", Seq("o_orderdate", "matched_price"))
      .select($"event_id", $"o_orderdate", $"matched_price")
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2))).toSet
    val custom = BroadcastAsofJoin
      .asofBroadcast(events, orders.withColumnRenamed("o_orderdate", "odate"), "user_id", "ts", "odate", Seq("odate", "matched_price"))
      .select($"event_id", $"odate", $"matched_price")
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2))).toSet
    assert(custom == composed)
    assert(custom.nonEmpty)
  }

  test("asofBroadcast: no match → null payload; equal time matches inclusively") {
    val l = Seq((1L, 100L, 10L), (1L, 200L, 5L), (2L, 9L, 7L)).toDF("k", "t", "v")
      .select($"k", timestamp_micros($"t").as("t"), $"v")
    val r = Seq((1L, 100L, "a"), (1L, 150L, "b"), (3L, 1L, "z")).toDF("k", "rt", "p")
      .select($"k", timestamp_micros($"rt").as("rt"), $"p")
    val out = BroadcastAsofJoin.asofBroadcast(l, r, "k", "t", "rt", Seq("p"))
      .select($"v", $"p").collect().map(x => (x.getLong(0), x.getString(1))).toSet
    assert(out == Set((10L, "a"), (5L, "b"), (7L, null)))
  }

  test("asofBroadcast rejects mixed time-unit families (date vs timestamp)") {
    val l = Seq((1L, 100L, 10L)).toDF("k", "t", "v")
      .select($"k", timestamp_micros($"t").as("t"), $"v")
    val r = Seq((1L, "2024-01-01", "a")).toDF("k", "rt", "p")
      .select($"k", to_date($"rt").as("rt"), $"p")
    val e = intercept[IllegalArgumentException](
      BroadcastAsofJoin.asofBroadcast(l, r, "k", "t", "rt", Seq("p")))
    assert(e.getMessage.contains("unit family"), e.getMessage)
    // the documented escape hatch works: cast the date side up
    val ok = BroadcastAsofJoin.asofBroadcast(
      l, r.withColumn("rt", $"rt".cast("timestamp")), "k", "t", "rt", Seq("p"))
    assert(ok.count() == 1)
  }

  test("two asof joins sharing one build side but different specs get DIFFERENT indexes") {
    // ReuseExchange can hand both AsofExecs the same broadcast id —
    // the executor-side index memo must key on the spec too, or the
    // second join silently reuses an index with the wrong ordinals
    val l = Seq((1L, 100L, "e1"), (1L, 200L, "e2")).toDF("k", "t", "ev")
      .select($"k", timestamp_micros($"t").as("t"), $"ev")
    val r = Seq((1L, 50L, 90L, 10.0, 99.0), (1L, 150L, 160L, 20.0, 88.0))
      .toDF("k", "ta", "tb", "pa", "pb")
      .select($"k", timestamp_micros($"ta").as("ta"), timestamp_micros($"tb").as("tb"), $"pa", $"pb")
    val j1 = BroadcastAsofJoin.asofBroadcast(l, r, "k", "t", "ta", Seq("pa"))
      .select($"ev", $"pa".as("p"))
    val j2 = BroadcastAsofJoin.asofBroadcast(l, r, "k", "t", "tb", Seq("pb"))
      .select($"ev", $"pb".as("p"))
    // one action over BOTH joins so any exchange reuse applies
    val both = j1.withColumn("src", lit("a")).unionByName(j2.withColumn("src", lit("b")))
      .collect().map(x => (x.getString(2), x.getString(0)) -> x.getDouble(1)).toMap
    assert(both(("a", "e1")) == 10.0 && both(("a", "e2")) == 20.0) // asof on ta → pa
    assert(both(("b", "e1")) == 99.0 && both(("b", "e2")) == 88.0) // asof on tb → pb
  }

  test("asofBroadcast plan has no shuffle on the fact side") {
    val q = BroadcastAsofJoin.asofBroadcast(events, orders.withColumnRenamed("o_orderdate", "odate"),
      "user_id", "ts", "odate", Seq("matched_price"))
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("Asof "), physical)
    // fact side streams straight from scan into the custom operator
    assert(!physical.contains("Exchange hashpartitioning(user_id"), physical)
    // build side rides Spark's own BroadcastExchange (AQE-sized,
    // ReuseExchange-dedupable), not a hand-rolled collect+broadcast
    assert(physical.contains("BroadcastExchange"), physical)
  }
}
