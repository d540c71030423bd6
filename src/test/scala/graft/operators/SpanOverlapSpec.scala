package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("matches the brute-force shared-k-gram join on a real corpus with planted twins") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select($"doc_id", $"text").limit(100)
    val planted = docs.unionByName(docs.select(($"doc_id" + 1000L).as("doc_id"),
      concat(lit("lead in "), $"text").as("text")))
    val got = DedupOps.spanOverlapPairs(planted, "doc_id", "text", k = 5)
      .as[(Long, Long)].collect().toSet
    // brute force: true token 5-grams via the same tokenizer, joined on gram text
    val grams = planted.select($"doc_id",
      explode(graft.functions.TextFunctions.tokens($"text")).as("tok"))
      .groupBy($"doc_id").agg(collect_list($"tok").as("toks"))
      .select($"doc_id", explode(expr(
        "transform(sequence(1, greatest(size(toks) - 4, 0)), i -> concat_ws(' ', slice(toks, i, 5)))")).as("gram"))
      .distinct()
    val expect = grams.as("a").join(grams.as("b"),
        $"a.gram" === $"b.gram" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(got === expect)
    // every planted twin with >= 5 tokens must pair with its source
    val nTwins = expect.count { case (a, b) => b - a == 1000L }
    assert(nTwins >= 90, s"only $nTwins twin pairs found")
  }

  test("pairs are ordered and unique; boilerplate spans past the bucket cap drop") {
    val boiler = "common footer text shared by every single page here"
    val df = (1L to 50L).map(i => (i, s"unique body $i $i $i $i $i $boiler")).toDF("doc_id", "text")
    // the boilerplate span is shared by all 50 docs: with cap 10 it
    // must NOT produce 50*49/2 pairs
    val capped = DedupOps.spanOverlapPairs(df, "doc_id", "text", k = 9, maxBucket = 10)
      .as[(Long, Long)].collect()
    assert(capped.isEmpty, s"boilerplate bucket leaked ${capped.length} pairs")
    val uncapped = DedupOps.spanOverlapPairs(df, "doc_id", "text", k = 9, maxBucket = 100)
      .as[(Long, Long)].collect()
    assert(uncapped.length === 50 * 49 / 2)
    assert(uncapped.forall { case (a, b) => a < b })
    assert(uncapped.toSet.size === uncapped.length)
  }

  test("docs shorter than k tokens never pair; nulls drop") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(DedupOps.spanOverlapPairs(df, "doc_id", "text", k = 5).count() === 0)
    assert(DedupOps.spanOverlapPairs(df, "doc_id", "text", k = 3)
      .as[(Long, Long)].collect().toSeq === Seq((1L, 2L)))
  }
}
