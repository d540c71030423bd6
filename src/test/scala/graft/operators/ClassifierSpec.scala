package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 1 << 16

  // planted separable task: every base doc appears once raw (label 0)
  // and once with a marker token appended (label 1) — shared features
  // carry conflicting signal, only the marker separates
  private lazy val train = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select($"doc_id", $"text").limit(200)
    docs.select($"doc_id", $"text", lit(0.0).as("label"))
      .unionByName(docs.select(($"doc_id" + 1000000L).as("doc_id"),
        concat($"text", lit(" qualmarker")).as("text"), lit(1.0).as("label")))
  }
  private lazy val weights = ClassifierOps.trainTextClassifier(train, "text", "label", dim = Dim, epochs = 20)

  test("planted separable quality task: classifier reaches 100% training accuracy with margin") {
    val scored = train.select($"label", ClassifierOps.score($"text", weights, Dim).as("p")).collect()
    val wrong = scored.count(r => (r.getDouble(1) > 0.5) != (r.getDouble(0) > 0.5))
    assert(wrong === 0, s"$wrong of ${scored.length} misclassified")
    // decisions carry real margin — orders of magnitude above the
    // ~1e-12 float-summation-order noise of the tree combine
    assert(scored.forall(r => math.abs(r.getDouble(1) - 0.5) > 0.01),
      s"min margin ${scored.map(r => math.abs(r.getDouble(1) - 0.5)).min}")
  }

  test("score is a codegen'd zero-shuffle expression; null text scores null") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq((1L, "some text qualmarker"), (2L, "some text"), (3L, null.asInstanceOf[String]))
        .toDF("id", "text")
      val out = df.select($"id", ClassifierOps.score($"text", weights, Dim).as("p")).collect()
      val byId = out.map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      assert(byId(1L).get > byId(2L).get, "marker must raise the score")
      assert(byId(3L).isEmpty)
      val plan = df.select(ClassifierOps.score($"text", weights, Dim))
        .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!plan.contains("Exchange"), plan)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("training ignores null text/label rows; empty input rejected with a named error") {
    val withNulls = train.unionByName(
      Seq((5000001L, null.asInstanceOf[String], 1.0)).toDF("doc_id", "text", "label"))
    val w = ClassifierOps.trainTextClassifier(withNulls, "text", "label", dim = 1 << 12, epochs = 2)
    assert(w.length === (1 << 12) + 1)
    val e = intercept[IllegalArgumentException] {
      ClassifierOps.trainTextClassifier(
        train.filter($"label" > 5), "text", "label", dim = 16, epochs = 1)
    }
    assert(e.getMessage.contains("no labeled rows"))
  }

  test("score runs unchanged on a stream — stateless scan expression, identical to batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[(Long, String)](spark)
    val scored = ms.toDF().toDF("id", "text")
      .select($"id", ClassifierOps.score($"text", weights, Dim).as("p"))
    val q = scored.writeStream.format("memory").queryName("clf_stream").outputMode("append").start()
    try {
      val rows = Seq((1L, "decent text qualmarker"), (2L, "decent text"))
      ms.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("clf_stream").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val batch = rows.toDF("id", "text")
        .select($"id", ClassifierOps.score($"text", weights, Dim).as("p"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got === batch)
      assert(got(1L) > got(2L))
    } finally q.stop()
  }

  test("featurization is deterministic and shared between train and score paths") {
    val a = ClassifierOps.featurizeKernel(org.apache.spark.unsafe.types.UTF8String.fromString("Hello World hello"), Dim)
    val b = ClassifierOps.featurizeKernel(org.apache.spark.unsafe.types.UTF8String.fromString("hello  world"), Dim)
    // case-folded, distinct: both are {hello, world}
    assert(a.toSeq === b.toSeq)
    assert(a.length === 2)
    assert(a.toSeq === a.sorted.toSeq)
  }
}
