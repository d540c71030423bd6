package graft.operators

import graft.SparkSpec
import graft.functions.{HashExpressions => HE}
import org.apache.spark.sql.functions._

class SkewHyperplaneSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches a plain join result") {
    val left = spark.range(1000).toDF("id")
      .withColumn("k", when($"id" < 900, lit("hot")).otherwise(concat(lit("k"), $"id")))
    val right = Seq(("hot", 1.0), ("k950", 2.0), ("absent", 3.0)).toDF("k", "payload")
    val plain = left.join(right, "k").agg(count(lit(1)), sum("payload")).collect()(0)
    val salted = SkewOps.saltedJoin(left, right, "k", 8).agg(count(lit(1)), sum("payload")).collect()(0)
    assert(plain == salted)
  }

  test("saltedJoin left join keeps unmatched rows exactly once") {
    val left = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    val right = Seq(("a", 9.0)).toDF("k", "p")
    val out = SkewOps.saltedJoin(left, right, "k", 4, "left")
    assert(out.count() == 2)
    assert(out.filter($"k" === "b").select("p").head().isNullAt(0))
  }

  test("hyperplane LSH tables under distinct seeds are independent, not shifted copies") {
    // regression: hyperplane identity was a function of seed+bitIndex,
    // so seed s+1's bit i equaled seed s's bit i+1 for every vector —
    // multi-table OR-amplification shared all but one plane per table
    val vecs = (1 to 200).map(i => Tuple1(Array.tabulate(16)(d => math.sin(i * 31.7 + d * 2.3).toFloat))).toDF("v")
    val bits = vecs.select(
      HE.hyperplaneLsh(col("v"), 8, seed = 7L).as("b7"),
      HE.hyperplaneLsh(col("v"), 8, seed = 8L).as("b8"))
    // if planes were shared, b8's low 7 bits would equal b7 >> 1 everywhere
    val shifted = bits.filter((col("b8").bitwiseAND(lit(0x7fL))) === (shiftright(col("b7"), 1).bitwiseAND(lit(0x7fL)))).count()
    assert(shifted < 50, s"seed-adjacent tables look like shifted copies for $shifted/200 vectors")
  }

  test("embeddingDedup multi-table amplification recovers a pair a single table can miss") {
    // deterministic check of the nTables OR-union: the pair set of
    // nTables=4 must contain every single-table pair set (tables are
    // unioned, never intersected), and the planted near-identical
    // pair must be present under amplification
    val base = (1 to 60).map(i => (i.toLong, Array.tabulate(16)(d => math.sin(i * 13.7 + d).toFloat)))
    val twin = (1001L, base.head._2.map(x => x * 1.0001f))
    val vecs = (base :+ twin).toDF("vec_id", "embedding")
    val amplified = DedupOps.embeddingDedup(vecs, "vec_id", "embedding", threshold = 0.999, nBits = 8, nTables = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val single = DedupOps.embeddingDedup(vecs, "vec_id", "embedding", threshold = 0.999, nBits = 8, nTables = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(amplified.contains((1L, 1001L)))
    assert(single.subsetOf(amplified))
  }

  test("fused hyperplane LSH: identical vectors same bucket, orthogonal vectors differ") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("id", "v")
    val b = df.select($"id", HE.hyperplaneLsh($"v", 16).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(1L) == b(2L))
    assert(b(1L) != b(3L)) // opposite vector flips (nearly) every non-tie bit
  }

  test("dupClusters resolves transitive components to min-label") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val clusters = DedupOps.dupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("bucketed co-located join plans without an Exchange") {
    spark.sql("DROP TABLE IF EXISTS graft_bucket_l")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_r")
    // in-memory catalog forgets tables between JVMs but their files
    // survive in the warehouse dir — clear them
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    Seq("graft_bucket_l", "graft_bucket_r").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) { d.listFiles().foreach(_.delete()); d.delete() }
    }
    val l = spark.range(1000).toDF("k").withColumn("lv", $"k" * 2)
    val r = spark.range(1000).toDF("k").withColumn("rv", $"k" + 1)
    BucketOps.writeBucketed(l, "graft_bucket_l", "k", 4)
    BucketOps.writeBucketed(r, "graft_bucket_r", "k", 4)
    // force a merge join so the bucket layout (not a broadcast) does the work
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = BucketOps.colocatedJoin(spark, "graft_bucket_l", "graft_bucket_r", "k")
      assert(j.count() == 1000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan) // bucketed scans pre-partition both sides
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("streamingDedup batch path dedups on key") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("event_id", "k")
    assert(graft.streaming.EventStreams.streamingDedup(df, Seq("k")).count() == 2)
  }
}
