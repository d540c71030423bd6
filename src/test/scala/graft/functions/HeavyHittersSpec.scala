package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def flat(df: DataFrame, capacity: Int, k: Int): DataFrame =
    df.groupBy($"g")
      .agg(HeavyHittersAggregate.heavyHitters($"item", capacity, k).as("hh"))
      .select($"g", posexplode($"hh"))
      .select($"g", ($"pos" + 1).as("rank"), $"col.item".as("item"), $"col.cnt".as("cnt"), $"col.err".as("err"))

  // deterministic zipf-ish stream: item j appears ~ N/j times in each group
  private lazy val stream: DataFrame =
    (1 to 40).flatMap { j =>
      (0 until (2000 / j)).flatMap(r => Seq(("a", f"it$j%03d"), ("b", f"it${41 - j}%03d")))
    }.toDF("g", "item")

  private def exactTopK(k: Int): Set[(String, Long, String, Long)] = {
    val w = Window.partitionBy($"g").orderBy($"cnt".desc, $"item".asc)
    stream.groupBy($"g", $"item").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"g", $"rank".cast("long"), $"item", $"cnt")
      .as[(String, Long, String, Long)].collect().toSet
  }

  test("exact when capacity >= distinct: identical to the count+window formulation, errs all zero") {
    val got = flat(stream.repartition(7), capacity = 64, k = 10)
    assert(got.filter($"err" =!= 0L).count() === 0)
    val gotSet = got.select($"g", $"rank", $"item", $"cnt").as[(String, Long, String, Long)].collect().toSet
    assert(gotSet === exactTopK(10))
  }

  test("SpaceSaving bounds under eviction: estimate >= true >= estimate - err; guaranteed hitters present") {
    // single partition so the classic (un-merged) bounds apply strictly
    val got = flat(stream.filter($"g" === "a").coalesce(1), capacity = 12, k = 12)
      .select($"item", $"cnt", $"err").as[(String, Long, Long)].collect()
    val truth = stream.filter($"g" === "a").groupBy($"item").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    got.foreach { case (it, est, err) =>
      val tc = truth.getOrElse(it, 0L)
      assert(est >= tc, s"$it: est $est < true $tc")
      assert(est - err <= tc, s"$it: est-err ${est - err} > true $tc")
    }
    // any item with true count > N/capacity must be in the summary
    val n = truth.values.sum
    val kept = got.map(_._1).toSet
    truth.filter { case (_, c) => c > n / 12 }.keys.foreach { it =>
      assert(kept.contains(it), s"guaranteed hitter $it missing")
    }
  }

  test("merge across many partitions keeps top items exact while distinct <= capacity") {
    val got = flat(stream.repartition(16), capacity = 64, k = 3)
      .select($"g", $"rank", $"item", $"cnt").as[(String, Long, String, Long)].collect().toSet
    assert(got === exactTopK(3))
  }

  test("plan: partial (map-side) object-hash aggregation — exchange carries summaries, not raw rows") {
    val df = stream.groupBy($"g").agg(HeavyHittersAggregate.heavyHitters($"item", 64, 5).as("hh"))
    val p = planOf(df)
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.split("ObjectHashAggregate").length >= 3, s"no partial phase:\n$p")
  }

  test("nulls are skipped, empty group yields empty array") {
    val df = Seq(("a", "x"), ("a", null.asInstanceOf[String]), ("a", "x")).toDF("g", "item")
    val got = df.groupBy($"g").agg(HeavyHittersAggregate.heavyHitters($"item", 4, 4).as("hh"))
      .select(size($"hh")).as[Int].head()
    assert(got === 1)
  }
}
