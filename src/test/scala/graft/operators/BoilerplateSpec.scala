package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: Seq[(Long, String, String)]) =
    rows.toDF("id", "src", "text")

  test("stripBoilerplate: shared footer drops, unique lines survive in order") {
    val docs = mk((1L to 5L).map(i =>
      (i, "a", s"alpha $i\nCOOKIE BANNER\nbody line $i\nfooter (c) site")))
    val out = TextOps.stripBoilerplate(docs, "id", "text", Seq("src"), minDocs = 3)
      .select("id", "text_clean").as[(Long, String)].collect().toMap
    for (i <- 1L to 5L)
      assert(out(i) == s"alpha $i\nbody line $i", s"doc $i: ${out(i)}")
  }

  test("stripBoilerplate: counts are per distinct doc, not per occurrence") {
    // the line repeats 5x inside ONE doc — never boilerplate at minDocs=3
    val docs = mk(Seq((1L, "a", Seq.fill(5)("again").mkString("\n")),
      (2L, "a", "other")))
    val out = TextOps.stripBoilerplate(docs, "id", "text", Seq("src"), 3)
      .select("id", "text_clean").as[(Long, String)].collect().toMap
    assert(out(1L) == Seq.fill(5)("again").mkString("\n"))
  }

  test("stripBoilerplate: scope is the group — same line in another source survives") {
    val docs = mk(
      (1L to 3L).map(i => (i, "a", s"FOOTER\nkeep a$i")) ++
        Seq((10L, "b", "FOOTER\nkeep b")))
    val out = TextOps.stripBoilerplate(docs, "id", "text", Seq("src"), 3)
      .select("id", "text_clean").as[(Long, String)].collect().toMap
    assert(out(1L) == "keep a1")
    assert(out(10L) == "FOOTER\nkeep b", "only 1 doc in source b has it")
  }

  test("stripBoilerplate: all-boilerplate docs come back as empty strings; blank lines kept") {
    val docs = mk((1L to 3L).map(i => (i, "a", "SAME")) :+ (9L, "a", "x\n\ny"))
    val out = TextOps.stripBoilerplate(docs, "id", "text", Seq("src"), 3)
      .select("id", "text_clean").as[(Long, String)].collect().toMap
    assert(out(1L) == "")
    assert(out(9L) == "x\n\ny")
    assert(out.size == 4, "no rows dropped")
  }
}
