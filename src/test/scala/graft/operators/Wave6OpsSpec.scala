package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 wave-6 operators: modularity, binary rank metrics,
  * lexical diversity (the streaming Brown forecast is specced in
  * StreamingForecastSpec).
  */
class Wave6OpsSpec extends SparkSpec {
  import spark.implicits._

  private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  test("modularity: two cliques joined by a bridge score high, hash labels ~0") {
    // two triangles {a,b,c}, {d,e,f} bridged by c-d
    val e = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("d", "e"), ("e", "f"), ("d", "f"), ("c", "d")).toDF("src", "dst")
    val good = Seq(("a", 1), ("b", 1), ("c", 1), ("d", 2), ("e", 2), ("f", 2))
      .toDF("node", "label")
    val q = GraphOps.modularity(e, good).agg(sum("q_contrib")).as[Double].head()
    // known value: m=7, each side e_in=3, deg_sum=7 → 2*(3/7 - (7/14)^2)
    assert(math.abs(q - 2 * (snap9(3.0 / 7 - 0.25))) < 1e-9 && q > 0.3, s"Q=$q")
    // every node its own community → heavily negative; single → 0
    val solo = Seq("a", "b", "c", "d", "e", "f").zipWithIndex.toDF("node", "label")
    val qSolo = GraphOps.modularity(e, solo).agg(sum("q_contrib")).as[Double].head()
    assert(qSolo < 0, s"solo Q=$qSolo")
    val one = Seq("a", "b", "c", "d", "e", "f").map((_, 1)).toDF("node", "label")
    val qOne = GraphOps.modularity(e, one).agg(sum("q_contrib")).as[Double].head()
    assert(math.abs(qOne) < 1e-9, s"one-community Q=$qOne")
  }

  test("rankMetrics: textbook values on a small ranking") {
    // ranking: rel at positions 2 and 5, k=3
    val df = (1 to 5).map(i => ("q", i, if (i == 2 || i == 5) 1 else 0))
      .toDF("g", "pos", "rel")
    val r = EvalOps.rankMetrics(df, Seq("g"), Seq("pos"), "rel", k = 3).collect().head
    assert(r.getLong(1) == 5 && r.getLong(2) == 2 && r.getLong(3) == 1)
    assert(r.getDouble(4) == snap9(1.0 / 3)) // precision@3
    assert(r.getDouble(5) == 0.5)            // recall@3
    assert(r.getInt(6) == 1)                 // hit@3
    assert(r.getDouble(7) == 0.5)            // mrr: first rel at rank 2
    // no relevant → nulls
    val none = (1 to 3).map(i => ("q", i, 0)).toDF("g", "pos", "rel")
    val rn = EvalOps.rankMetrics(none, Seq("g"), Seq("pos"), "rel", k = 3).collect().head
    assert(rn.isNullAt(5) && rn.isNullAt(7) && rn.getInt(6) == 0)
  }

  test("lexicalDiversity: repeated text scores low TTR, all-distinct scores 1") {
    val df = Seq(
      ("loop", "spam spam spam spam"),
      ("rich", "one two three four")).toDF("src", "text")
    val r = TextOps.lexicalDiversity(df, Seq("src"), "text")
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4), x.getDouble(5))).toMap
    assert(r("loop") == ((4L, 1L, 0L, 0.25, 0.0)))
    assert(r("rich") == ((4L, 4L, 4L, 1.0, 1.0)))
  }
}
