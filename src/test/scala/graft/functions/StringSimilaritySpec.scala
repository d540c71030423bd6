package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class StringSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    StringSimilarity.jaroWinklerKernel(UTF8String.fromString(a), UTF8String.fromString(b))

  test("kernel: bit-exact against the DuckDB reference values") {
    // right-hand constants printed by duckdb jaro_winkler_similarity
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("JELLYFISH", "SMELLYFISH") == 0.8962962962962964)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(jw("aaaaaa", "aaaaab") == 0.9333333333333333)
    assert(jw("abcdxx", "abcdyy") == 0.8666666666666666)
    // boost threshold is strict: jaro 0.6 with a 4-char prefix stays 0.6
    assert(jw("abcdxxxxxx", "abcdyyyyyy") == 0.6)
    // byte-level multi-byte comparison (the documented semantics)
    assert(jw("réné", "rene") == 0.611111111111111)
  }

  test("kernel: edges — empties, identity, window-zero transposition") {
    assert(jw("", "") == 0.0 && jw("a", "") == 0.0 && jw("", "b") == 0.0)
    assert(jw("abc", "abc") == 1.0 && jw("x", "x") == 1.0)
    assert(jw("ab", "ba") == 0.0)       // window 0: no cross-position match
    assert(jw("abcdef", "uvwxyz") == 0.0)
  }

  test("expression: codegen and interpreted paths agree; SQL registration works") {
    val df = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), ("ab", "ba"))
      .toDF("a", "b")
    val viaCol = df.select(StringSimilarity.jaroWinkler(col("a"), col("b")))
      .as[Double].collect().toSeq
    assert(viaCol == Seq(0.9611111111111111, 0.8400000000000001, 0.0))
    graft.GraftExtensions.register(spark)
    val viaSql = df.createOrReplaceTempView("jwt")
    val sqlRes = spark.sql("SELECT jaro_winkler_sim(a, b) FROM jwt").as[Double].collect().toSeq
    assert(sqlRes == viaCol)
    // nulls propagate
    val n = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(StringSimilarity.jaroWinkler(col("a"), col("b"))).head()
    assert(n.isNullAt(0))
  }

  test("fuzzyJoinJaro: prefix-blocked pairs above threshold, snapped scores") {
    val left = Seq("small ring", "red widget").toDF("name_a")
    val right = Seq((1L, "small ring 3"), (2L, "small gizmo"), (3L, "ted widget"))
      .toDF("id", "name_b")
    val out = graft.operators.FuzzyJoinOps.fuzzyJoinJaro(
      left, right, "name_a", "name_b", minSim = 0.9, blockPrefix = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    // "small ring"~"small ring 3" passes; "ted widget" is blocked out
    // (prefix mismatch) even though its jw is high
    assert(out.map(t => (t._1, t._2)).toSet == Set(("small ring", 1L)))
    assert(out.head._3 >= 0.9 && out.head._3 == math.floor(out.head._3 * 1e6 + 0.5) / 1e6)
  }
}
