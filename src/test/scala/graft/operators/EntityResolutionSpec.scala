package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pipeline spec for the q_entity_resolution composition:
  * jaro-blocked pairs → connected components → canonical min-id. */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  test("entity resolution: variant groups cluster, singletons stay canonical") {
    val rec = Seq(
      (10L, "acme corporation"), (11L, "acme corporatio"), (12L, "acme corporation 2"),
      (20L, "zeta industries"), (21L, "zeta industrie"),
      (30L, "qrs holdings")
    ).toDF("id", "name")
    val pairs = FuzzyJoinOps.fuzzyJoinJaro(
        rec.select(col("id").as("id_a"), col("name").as("name_a")),
        rec.select(col("id").as("id_b"), col("name").as("name_b")),
        "name_a", "name_b", minSim = 0.93, blockPrefix = 2)
      .filter(col("id_a") < col("id_b"))
    val comp = GraphOps.connectedComponents(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      .select(col("id").as("cid"), col("component"))
    val out = rec.join(comp, col("id") === col("cid"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(10L) == 10L && out(11L) == 10L && out(12L) == 10L, s"acme cluster: $out")
    assert(out(20L) == 20L && out(21L) == 20L)
    assert(out(30L) == 30L, "singleton is its own canonical")
  }
}
