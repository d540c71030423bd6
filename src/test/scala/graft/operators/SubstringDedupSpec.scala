package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[DedupOps.removeRepeatedNgrams]] — exact-substring span dedup at
  * token-window granularity with keep-first semantics.
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def clean(rows: Seq[(Long, String)], n: Int) =
    DedupOps
      .removeRepeatedNgrams(rows.toDF("id", "text"), "id", "text", n = n)
      .select("id", "text_clean", "removed_tokens")
      .as[(Long, String, Int)]
      .collect()
      .sortBy(_._1)
      .toSeq

  test("later copy of a shared span is scrubbed, first site kept") {
    val shared = "alpha beta gamma delta epsilon"
    val out = clean(
      Seq(
        1L -> s"intro $shared outro",
        2L -> s"unrelated words here then $shared trailing tail"
      ),
      n = 5)
    // doc 1 holds the first (id, pos) site — untouched
    assert(out(0) === ((1L, s"intro $shared outro", 0)))
    // doc 2 loses exactly the 5 shared tokens, order preserved
    assert(out(1) === ((2L, "unrelated words here then trailing tail", 5)))
  }

  test("overlapping duplicated windows scrub the union of their spans") {
    // six shared tokens = two overlapping 5-windows in each copy;
    // the second doc must lose all six, not 5 + 5 double-counted
    val shared = "a1 a2 a3 a4 a5 a6"
    val out = clean(Seq(1L -> s"x $shared", 2L -> s"$shared y"), n = 5)
    assert(out(0)._3 === 0)
    assert(out(1) === ((2L, "y", 6)))
  }

  test("within-doc repetition scrubs the later site too") {
    val out = clean(Seq(1L -> "p q r s t filler p q r s t"), n = 5)
    assert(out(0) === ((1L, "p q r s t filler", 5)))
  }

  test("short docs, empty text, and null text pass through") {
    val df = Seq(
      (1L, Option("one two three")), // < n tokens: no windows
      (2L, Option("")),
      (3L, Option.empty[String])
    ).toDF("id", "text")
    val out = DedupOps
      .removeRepeatedNgrams(df, "id", "text", n = 5)
      .select("id", "text_clean", "removed_tokens")
      .as[(Long, String, Int)]
      .collect()
      .sortBy(_._1)
    assert(out(0) === ((1L, "one two three", 0)))
    assert(out(1) === ((2L, "", 0)))
    assert(out(2) === ((3L, "", 0)))
  }

  test("fully duplicated later doc scrubs to empty") {
    val text = "w1 w2 w3 w4 w5 w6 w7"
    val out = clean(Seq(1L -> text, 2L -> text), n = 5)
    assert(out(0) === ((1L, text, 0)))
    assert(out(1) === ((2L, "", 7)))
  }

  test("whitespace runs normalize to single spaces (token-granular rebuild)") {
    val out = clean(Seq(1L -> "  a   b\tc  "), n = 5)
    assert(out(0) === ((1L, "a b c", 0)))
  }

  test("result is partitioning-invariant") {
    val rows = (1L to 40L).map { i =>
      if (i % 4 == 0) i -> "shared span tokens every fourth doc carries verbatim"
      // every token carries the doc id, so no window repeats across docs
      else i -> s"t${i}a t${i}b t${i}c t${i}d t${i}e t${i}f t${i}g"
    }
    val a = clean(rows, n = 5)
    val b = DedupOps
      .removeRepeatedNgrams(
        rows.toDF("id", "text").repartition(7, col("id")), "id", "text", n = 5)
      .select("id", "text_clean", "removed_tokens")
      .as[(Long, String, Int)]
      .collect()
      .sortBy(_._1)
      .toSeq
    assert(a === b)
    // exactly one of the ten copies (the lowest id, 4) survives intact
    val touched = a.filter(_._3 > 0).map(_._1)
    assert(touched === (8L to 40L by 4L).toSeq)
  }

  test("repeatedNgramReport surfaces each duplicated window with its site count") {
    val shared = "alpha beta gamma delta epsilon"
    val df = Seq(1L -> s"$shared", 2L -> s"$shared", 3L -> "nothing in common here five").toDF("id", "text")
    val rep = DedupOps.repeatedNgramReport(df, "id", "text", n = 5)
      .as[(Long, Long)].collect()
    assert(rep.length === 1)
    assert(rep.head._2 === 2L)
  }

  test("input columns named like the outputs are rejected, not silently overwritten") {
    val base = Seq(1L -> "a b c d e f").toDF("id", "text")
    assertThrows[IllegalArgumentException] {
      DedupOps.removeRepeatedNgrams(
        base.withColumn("text_clean", lit("x")), "id", "text")
    }
    assertThrows[IllegalArgumentException] {
      DedupOps.removeRepeatedNgrams(
        base.withColumn("removed_tokens", lit(0L)), "id", "text")
    }
    // a custom outputCol that collides is caught too
    assertThrows[IllegalArgumentException] {
      DedupOps.removeRepeatedNgrams(base, "id", "text", outputCol = "text")
    }
  }

  test("spark.graft.debug pays the id-uniqueness pre-pass; off by default") {
    val dup = Seq(1L -> "a b c d e f", 1L -> "g h i j k l").toDF("id", "text")
    // contract-only by default: no check, no throw (documented trade)
    DedupOps.removeRepeatedNgrams(dup, "id", "text").count()
    spark.conf.set("spark.graft.debug", "true")
    try {
      val ex = intercept[IllegalArgumentException] {
        DedupOps.removeRepeatedNgrams(dup, "id", "text")
      }
      assert(ex.getMessage.contains("duplicate id"), ex.getMessage)
      // unique ids stay green under debug
      val ok = Seq(1L -> "a b c d e f", 2L -> "g h i j k l").toDF("id", "text")
      assert(DedupOps.removeRepeatedNgrams(ok, "id", "text").count() === 2L)
    } finally spark.conf.unset("spark.graft.debug")
  }
}
