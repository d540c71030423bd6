package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LeakageSplitSpec extends SparkSpec {
  import spark.implicits._

  test("clusterAwareSplit: all members of a cluster land on the same side") {
    val docs = (1L to 200L).map(i => (i, s"doc $i")).toDF("id", "body")
    // pair up ids (1,2), (3,4), ... as dup clusters
    val clusters = (1L to 200L).map(i => (i, if (i % 2 == 0) i - 1 else i))
      .toDF("member", "cluster_id")
    val out = SplitOps.clusterAwareSplit(docs, "id", clusters,
      "cluster_id", "member", testFraction = 0.4)
    val sides = out.groupBy("split_key")
      .agg(countDistinct("split").as("nsides"), count(lit(1)).as("n")).collect()
    assert(sides.forall(_.getLong(1) == 1L), "a cluster straddled the boundary")
    assert(sides.forall(_.getLong(2) == 2L), "every cluster has exactly 2 members")
    val fracTest = out.filter(col("split") === "test").count().toDouble / 200
    assert(fracTest > 0.1 && fracTest < 0.7, s"degenerate split $fracTest")
  }

  test("clusterAwareSplit: rows absent from the cluster frame split on their own id") {
    val docs = Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("id", "body")
    val clusters = Seq((10L, 10L)).toDF("member", "cluster_id")
    val keys = SplitOps.clusterAwareSplit(docs, "id", clusters, "cluster_id", "member", 0.5)
      .select("id", "split_key").as[(Long, Long)].collect().toMap
    assert(keys == Map(10L -> 10L, 20L -> 20L, 30L -> 30L))
  }

  test("clusterAwareSplitWith: portable coin reproduces the documented cut") {
    val docs = (0L until 100L).map(i => (i, "x")).toDF("id", "body")
    val empty = Seq.empty[(Long, Long)].toDF("member", "cluster_id")
    val out = SplitOps.clusterAwareSplitWith(docs, "id", empty, "cluster_id", "member",
      key => pmod(key * lit(40503L), lit(10000L)), 0.2)
      .select("id", "split").as[(Long, String)].collect().toMap
    for (i <- 0L until 100L) {
      val want = if ((i * 40503L) % 10000L < 2000) "test" else "train"
      assert(out(i) == want, s"id $i")
    }
  }
}
