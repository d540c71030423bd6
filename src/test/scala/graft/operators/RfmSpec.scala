package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RfmSpec extends SparkSpec {
  import spark.implicits._

  // 5 customers with hand-computable quintiles: one order each except
  // customer 5 (three orders). Amounts ascend so monetary quintiles
  // split the customers cleanly.
  private def fixture = Seq(
    (1L, "2001-01-01", 100.0),
    (2L, "2001-03-01", 200.0),
    (3L, "2001-05-01", 300.0),
    (4L, "2001-07-01", 400.0),
    (5L, "2001-09-01", 250.0),
    (5L, "2001-09-02", 250.0),
    (5L, "2001-09-03", 250.0)
  ).toDF("cust", "d", "amt").withColumn("d", col("d").cast("timestamp"))

  test("rfm: recency/frequency/monetary are exact and scores span the quintiles") {
    val out = FunnelOps.rfm(fixture, "cust", "d", "amt", "2001-12-31")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 5)
    // recency: days from last order to 2001-12-31
    assert(out(1L).getInt(1) == 364)
    assert(out(5L).getInt(1) == 119)
    // frequency: 1 for all but customer 5
    assert(out(1L).getLong(2) == 1L && out(5L).getLong(2) == 3L)
    // monetary: exact cents
    assert(out(5L).getDouble(3) == 750.0 && out(1L).getDouble(3) == 100.0)
    // most recent + most frequent + highest spend customer is the champion
    assert(out(5L).getInt(4) == 5 && out(5L).getInt(5) == 5 && out(5L).getInt(6) == 5)
    assert(out(5L).getString(7) == "champion")
    // the stalest single-order low spender bottoms out
    assert(out(1L).getInt(4) == 1 && out(1L).getInt(6) == 1)
    assert(out(1L).getString(7) == "hibernating")
  }

  test("rfm: ties share a score (threshold semantics, not ntile)") {
    val df = Seq(
      (1L, "2001-06-01", 100.0), (2L, "2001-06-01", 100.0),
      (3L, "2001-06-01", 100.0), (4L, "2001-06-01", 100.0)
    ).toDF("cust", "d", "amt").withColumn("d", col("d").cast("timestamp"))
    val rows = FunnelOps.rfm(df, "cust", "d", "amt", "2001-12-31").collect()
    assert(rows.map(_.getInt(4)).distinct.length == 1, "identical customers, identical r_score")
    assert(rows.map(_.getInt(5)).distinct.length == 1)
    assert(rows.map(_.getInt(6)).distinct.length == 1)
  }

  test("rfm: null customer/date/amount rows are dropped before aggregation") {
    val df = Seq(
      (Some(1L), Some("2001-06-01"), Some(100.0)),
      (None, Some("2001-06-01"), Some(999.0)),
      (Some(2L), None, Some(999.0)),
      (Some(2L), Some("2001-06-01"), None),
      (Some(2L), Some("2001-06-01"), Some(50.0))
    ).toDF("cust", "d", "amt").withColumn("d", col("d").cast("timestamp"))
    val out = FunnelOps.rfm(df, "cust", "d", "amt", "2001-12-31")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out == Map(1L -> 100.0, 2L -> 50.0))
  }
}
