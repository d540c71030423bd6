package graft

/** Runs every driver query against sf0.001 — catches regressions in
  * any `SparkEntry.queries` entry without waiting for the driver's
  * verify round. Every query must plan, execute, and return rows.
  *
  * Sharded 4 ways by query-name hash (stable `String.hashCode`, so
  * the shards partition the registry deterministically and their
  * union is exactly the full registry): the single-suite form was
  * the longest-running suite in the tree (~157 s of the 828 s
  * sequential total) and a ScalaTest suite is the unit of the
  * build's parallel test grouping — four shards let four JVMs run
  * it concurrently.
  */
abstract class QueriesSmokeShard(shard: Int, numShards: Int) extends SparkSpec {

  /** BNLJ build sides a query may legitimately broadcast: 1-row
    * scalar gates (thresholds, corpus totals), bounded query/centroid
    * sets (knn family), bounded pair frames (cohort/sketch sizes).
    * Instead of a hand-grown name allowlist, MEASURE each build side:
    * BNLJ cost is streamRows x buildRows, so the plan is scale-safe
    * iff the build side is genuinely tiny — a real frame sneaking
    * into a BNLJ build (the actual 100 TB hazard) fails the cap no
    * matter what the query is called.
    */
  private val BnljBuildRowCap = 4096

  private def flattenPlan(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => flattenPlan(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => p +: flattenPlan(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => p +: flattenPlan(r.child)
    case _ => p +: p.children.flatMap(flattenPlan)
  }

  SparkEntry.queries.toSeq.sortBy(_._1)
    .filter { case (name, _) => math.floorMod(name.hashCode, numShards) == shard }
    .foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!plan.contains("CartesianProduct"), s"$name plans a CartesianProduct")
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
      // global scale guard, structural: every BroadcastNestedLoopJoin
      // in the FINAL adaptive plan must broadcast a measured-tiny
      // build side (checked after execution so AQE-materialized
      // stages are final)
      flattenPlan(df.queryExecution.executedPlan).foreach {
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
          // read the broadcast exchange's RUNTIME row-count metric
          // (populated by the count() above) — no re-execution
          val buildSide = b.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
            case org.apache.spark.sql.catalyst.optimizer.BuildRight => b.right
          }
          val exchanges = flattenPlan(buildSide).collect {
            case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => e
          }
          assert(exchanges.nonEmpty, s"$name: BNLJ build side has no BroadcastExchange")
          exchanges.foreach { e =>
            val buildRows = e.metrics("numOutputRows").value
            assert(buildRows <= BnljBuildRowCap,
              s"$name plans a BroadcastNestedLoopJoin over a build side with $buildRows rows (> $BnljBuildRowCap) — not a tiny-broadcast pattern")
          }
        case _ =>
      }
    }
  }
}

class QueriesSmokeSpec extends QueriesSmokeShard(0, 4) {
  test("every query key has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val stale = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"oracles without queries: $stale")
  }

  test("smoke shards partition the full registry") {
    val shards = (0 until 4).map(s =>
      SparkEntry.queries.keySet.filter(n => math.floorMod(n.hashCode, 4) == s))
    assert(shards.map(_.size).sum == SparkEntry.queries.size)
    assert(shards.reduce(_ ++ _) == SparkEntry.queries.keySet)
  }
}
class QueriesSmokeSpecB extends QueriesSmokeShard(1, 4)
class QueriesSmokeSpecC extends QueriesSmokeShard(2, 4)
class QueriesSmokeSpecD extends QueriesSmokeShard(3, 4)
