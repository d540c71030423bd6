package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchMergeFuzzySpec extends SparkSpec {
  import spark.implicits._

  // ---------------- HyperLogLog ----------------

  test("hllCardinality lands within the p=12 error bound on 10k distinct") {
    val df = spark.range(10000).select(lit("g").as("g"), col("id"))
    val est = SketchOps.hllCardinality(df, Seq("g"), "id")
      .select("hll_est").as[Double].head()
    // σ ≈ 1.04/√4096 ≈ 1.6%; 4σ gate
    assert(math.abs(est - 10000) / 10000 < 0.065, s"est=$est")
  }

  test("hll small range uses linear counting and is near-exact") {
    val df = spark.range(100).select(lit("g").as("g"), col("id"))
    val est = SketchOps.hllCardinality(df, Seq("g"), "id")
      .select("hll_est").as[Double].head()
    assert(math.abs(est - 100) < 5, s"est=$est")
  }

  test("hll estimate is partitioning-invariant (deterministic)") {
    val df = spark.range(5000).select((col("id") % 3).cast("string").as("g"), col("id"))
    val a = SketchOps.hllCardinality(df, Seq("g"), "id")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = SketchOps.hllCardinality(df.repartition(17, col("id")), Seq("g"), "id")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("hll registers merge by max: union-of-halves == whole") {
    val whole = spark.range(8000).select(lit("g").as("g"), col("id"))
    val h1 = whole.filter(col("id") < 4000)
    val h2 = whole.filter(col("id") >= 4000)
    val merged = SketchOps.hllRegisters(h1, Seq("g"), "id")
      .unionByName(SketchOps.hllRegisters(h2, Seq("g"), "id"))
      .groupBy("g", "reg_idx").agg(max("max_rank").as("max_rank"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    val direct = SketchOps.hllRegisters(whole, Seq("g"), "id")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(merged == direct)
  }

  test("hll rejects bad p and empty groups") {
    val df = spark.range(10).select(lit("g").as("g"), col("id"))
    intercept[IllegalArgumentException](SketchOps.hllCardinality(df, Seq("g"), "id", p = 10))
    intercept[IllegalArgumentException](SketchOps.hllCardinality(df, Nil, "id"))
  }

  // ---------------- Changelog merge ----------------

  private def snap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "bal")

  test("applyChangelog: latest version wins, deletes drop, untouched survive") {
    val changes = Seq(
      (1L, "a1", 11.0, 5L, "U"), (1L, "a2", 12.0, 9L, "U"), // k=1 → a2
      (2L, "bX", 0.0, 4L, "D"),                             // k=2 deleted
      (4L, "d", 40.0, 2L, "U")                              // new key
    ).toDF("k", "name", "bal", "version", "op")
    val out = MergeOps.applyChangelog(snap, changes, Seq("k"), "version", "op")
      .as[(Long, String, Double)].collect().toSet
    assert(out == Set((1L, "a2", 12.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("applyChangelog: a delete overridden by a later upsert resurrects") {
    val changes = Seq(
      (3L, "x", 0.0, 5L, "D"), (3L, "c2", 31.0, 7L, "U")
    ).toDF("k", "name", "bal", "version", "op")
    val out = MergeOps.applyChangelog(snap, changes, Seq("k"), "version", "op")
      .filter(col("k") === 3).as[(Long, String, Double)].collect().toSet
    assert(out == Set((3L, "c2", 31.0)))
  }

  test("applyChangelog validates the change schema") {
    val bad = Seq((1L, 1L)).toDF("k", "version")
    intercept[IllegalArgumentException](
      MergeOps.applyChangelog(snap, bad, Seq("k"), "version", "op"))
  }

  test("scd2: intervals chain through versions; deletes close but don't open") {
    val changes = Seq(
      (1L, 10.0, 2L, "U"), (1L, 11.0, 5L, "U"), (1L, 0.0, 8L, "D"),
      (2L, 20.0, 3L, "U")
    ).toDF("k", "bal", "version", "op")
    val out = MergeOps.scd2(changes, Seq("k"), "version", "op")
      .select("k", "bal", "valid_from", "valid_to")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    // k=1: [2,5), [5,8) (closed by the delete); k=2: [3, open)
    assert(out == Set((1L, 10.0, 2L, 5L), (1L, 11.0, 5L, 8L), (2L, 20.0, 3L, -1L)))
  }

  // ---------------- Fuzzy join ----------------

  test("fuzzyJoin finds within-distance pairs through prefix blocks") {
    val left = Seq((1L, "widget-red"), (2L, "widget-blu"), (3L, "zz-anchor")).toDF("id_l", "s_l")
    val right = Seq((10L, "widget-rex"), (20L, "widget-blue"), (30L, "zz-anchor")).toDF("id_r", "s_r")
    val out = FuzzyJoinOps.fuzzyJoin(left, right, "s_l", "s_r", maxDist = 1, blockPrefix = 3)
      .select("id_l", "id_r", "edit_dist").as[(Long, Long, Int)].collect().toSet
    // 1↔10 substitution, 2↔20 insertion, 3↔30 exact; cross pairs
    // (widget-red vs widget-blue) are past maxDist
    assert(out == Set((1L, 10L, 1), (2L, 20L, 1), (3L, 30L, 0)))
  }

  test("fuzzyJoin blocking contract: edits inside the prefix are not found") {
    val left = Seq((1L, "abcdef")).toDF("id_l", "s_l")
    val right = Seq((2L, "Xbcdef")).toDF("id_r", "s_r") // edit at char 1
    val out = FuzzyJoinOps.fuzzyJoin(left, right, "s_l", "s_r", maxDist = 1, blockPrefix = 2)
    assert(out.count() == 0)
    intercept[IllegalArgumentException](
      FuzzyJoinOps.fuzzyJoin(left, right, "s_l", "s_r", maxDist = -1))
    intercept[IllegalArgumentException](
      FuzzyJoinOps.fuzzyJoin(left, right, "s_l", "s_r", 1, blockPrefix = 0))
  }

  test("fuzzyJoin plans a hash join on the block key, not a nested loop") {
    val left = Seq((1L, "abcdef")).toDF("id_l", "s_l")
    val right = Seq((2L, "abcdeg")).toDF("id_r", "s_r")
    val plan = FuzzyJoinOps.fuzzyJoin(left, right, "s_l", "s_r", 1)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }
}
