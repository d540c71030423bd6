package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LabelOpsSpec extends SparkSpec {
  import spark.implicits._

  test("labelDictionary sorts in codepoint order (matches Spark orderBy, not UTF-16 code units)") {
    // U+FF01 (fullwidth !) vs U+1F600 (emoji, surrogate pair):
    // UTF-16 code-unit order puts the emoji first (D83D < FF01),
    // codepoint/binary order puts FF01 first — the order every
    // engine-side ORDER BY (and the DuckDB oracle) uses
    val df = Seq("😀label", "！label", "plain").toDF("l")
    val dict = LabelOps.labelDictionary(df, "l")
    val engineOrder = df.distinct().orderBy("l").collect().map(_.getString(0)).toSeq
    assert(dict == engineOrder, s"dict $dict != engine order $engineOrder")
  }

  import spark.implicits._

  test("classEncode assigns sorted dense codes, null → -1") {
    val df = Seq(Some("b"), Some("a"), Some("c"), None, Some("b")).toDF("y")
    val out = LabelOps.classEncode(df, "y").collect().map(r => (r.getAs[String]("y"), r.getInt(1)))
    assert(out.toSeq == Seq(("b", 1), ("a", 0), ("c", 2), (null, -1), ("b", 1)))
  }

  test("classEncodeWith respects an explicit dictionary; unseen → -1") {
    val df = Seq("x", "y", "z").toDF("y")
    val out = LabelOps.classEncodeWith(df, "y", Seq("y", "x")).collect().map(_.getInt(1))
    assert(out.toSeq == Seq(1, 0, -1))
  }

  test("classEncode falls back to a broadcast-join encode above the inline bound, codes identical") {
    // 25k distinct labels: the inline literal-map path must NOT be
    // taken (no collect_set of 25k values on the driver)
    val df = spark.range(30000).select(
      concat(lit("label_"), format_string("%07d", (col("id") * 7919) % 25000)).as("y"))
    val out = LabelOps.classEncode(df, "y")
    // broadcast dictionary join, fact side unshuffled
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan.take(2000))
    // codes follow sorted-distinct order: label_0000000 → 0, and the
    // max label gets n-1
    val byLabel = out.distinct().collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(byLabel("label_0000000") == 0)
    assert(byLabel.size == 25000)
    assert(byLabel.values.min == 0 && byLabel.values.max == 24999)
    // codes are dense ranks of the codepoint-sorted dictionary —
    // same contract as the inline path
    val sortedLabels = byLabel.keys.toSeq.sorted
    assert(sortedLabels.take(3).map(byLabel) == Seq(0, 1, 2))
    assert(byLabel(sortedLabels.last) == 24999)
  }

  test("labelDictionary fails fast on high-cardinality columns instead of collecting") {
    val df = spark.range(100000).select(concat(lit("u"), col("id")).as("y"))
    val e = intercept[IllegalArgumentException](LabelOps.labelDictionary(df, "y"))
    assert(e.getMessage.contains("distinct labels"))
  }

  test("binarize: both lists → missing -1") {
    val df = Seq("pos", "neg", "other").toDF("y")
    val spec = LabelOps.BinarizeSpec(positive = Seq("pos"), negative = Seq("neg"))
    val out = LabelOps.binarize(df, "y", spec).collect().map(_.getInt(1))
    assert(out.toSeq == Seq(1, 0, -1))
  }

  test("binarize: positives only → others 0; negatives only → others 1") {
    val df = Seq("pos", "other").toDF("y")
    val p = LabelOps.binarize(df, "y", LabelOps.BinarizeSpec(positive = Seq("pos"))).collect().map(_.getInt(1))
    assert(p.toSeq == Seq(1, 0))
    val n = LabelOps.binarize(df, "y", LabelOps.BinarizeSpec(negative = Seq("pos"))).collect().map(_.getInt(1))
    assert(n.toSeq == Seq(0, 1))
  }

  test("labelDictionary is sorted and null-free") {
    val df = Seq(Some("m"), None, Some("a"), Some("m")).toDF("y")
    assert(LabelOps.labelDictionary(df, "y") == Seq("a", "m"))
  }
}
