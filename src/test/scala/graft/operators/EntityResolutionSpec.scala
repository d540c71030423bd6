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

  test("maxBlockSize: over-cap block drops wholesale, selective blocks keep matching") {
    // hot block: 8 near-identical names under prefix "hh"; selective
    // block: one matching pair under "zz"
    val hot = (0L until 8L).map(i => (100L + i, s"hh entity $i"))
    val rec = (hot ++ Seq((1L, "zz corp alpha"), (2L, "zz corp alphb"))).toDF("id", "name")
    def pairsWith(cap: Int) = FuzzyJoinOps.fuzzyJoinJaro(
        rec.select(col("id").as("id_a"), col("name").as("name_a")),
        rec.select(col("id").as("id_b"), col("name").as("name_b")),
        "name_a", "name_b", minSim = 0.9, blockPrefix = 2, maxBlockSize = cap)
      .filter(col("id_a") < col("id_b"))
    val capped = pairsWith(4).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L)), s"hot-block pairs leaked past the cap: $capped")
    // uncapped default still emits the hot-block pairs
    val uncapped = pairsWith(Int.MaxValue).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((1L, 2L)) && uncapped.exists(_._1 >= 100L))
    // the dropped block is observable, with its lost-pair count
    val report = FuzzyJoinOps.jaroBlockOverflowReport(
        rec.select(col("name").as("name_a")), rec.select(col("name").as("name_b")),
        "name_a", "name_b", blockPrefix = 2, maxBlockSize = 4)
      .as[(String, Long, Long, Long)].collect()
    assert(report.toSeq == Seq(("hh", 8L, 8L, 64L)), s"report: ${report.toSeq}")
  }

  test("maxBlockSize semantics deterministic across repartitionings") {
    val rec = (0L until 40L).map(i => (i, s"pp name ${i % 7}")).toDF("id", "name")
    def run(df: org.apache.spark.sql.DataFrame) = FuzzyJoinOps.fuzzyJoinJaro(
        df.select(col("id").as("id_a"), col("name").as("name_a")),
        df.select(col("id").as("id_b"), col("name").as("name_b")),
        "name_a", "name_b", minSim = 0.9, blockPrefix = 2, maxBlockSize = 50)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(run(rec) == run(rec.repartition(13)))
  }
}
