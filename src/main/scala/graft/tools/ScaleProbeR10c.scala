package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.DedupOps

/** Round-10 probe: [[DedupOps.removeRepeatedNgrams]] under the
  * boilerplate-skew shape that kills row_number-based designs — a
  * footer window repeated on EVERY doc (2M sites per window hash).
  * The operator's duplicate pass is count + min(struct), both
  * partial-aggregable, so the hot hash collapses map-side instead
  * of piling 2M rows into one sort partition.
  *
  * Corpus (2M docs, exact expected arithmetic):
  *   - every doc: 10 doc-unique tokens, then a 10-token FOOTER
  *     shared by all 2M docs
  *   - even docs additionally carry a 10-token QUOTE between the
  *     unique prefix and the footer (shared by the 1M even docs)
  *   - doc 0 is the (id, pos) minimum for every shared window, so
  *     it keeps everything; other evens lose quote+boundary+footer
  *     (20 tokens), odds lose the footer (10 tokens).
  *
  * Run: `sbt "runMain graft.tools.ScaleProbeR10c"`. Findings →
  * SCALEPROBE_r10.md §9.
  */
object ScaleProbeR10c {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    import spark.implicits._
    val n = 2000000L

    val footer = (1 to 10).map(k => s"footer$k").mkString(" ")
    val quote = (1 to 10).map(k => s"quote$k").mkString(" ")
    val docs = spark.range(0, n).select(
      col("id"),
      concat(
        // 10 doc-unique tokens
        concat_ws(" ", (0 until 10).map(j => concat(lit(s"u${j}x"), col("id").cast("string"))): _*),
        when(col("id") % 2 === 0, lit(s" $quote")).otherwise(lit("")),
        lit(s" $footer")).as("text"))

    val t0 = System.nanoTime()
    val out = DedupOps.removeRepeatedNgrams(docs, "id", "text", n = 5)
      .select(col("id"), col("removed_tokens"))
    val agg = out.groupBy(col("removed_tokens")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[probe] removeRepeatedNgrams 2M docs / ~50M tokens, 2M-site hot windows: $secs%.1f s")
    println(s"[probe] removed-token histogram: $agg")
    require(agg.getOrElse(0, 0L) == 1L, s"exactly doc 0 untouched, got ${agg.get(0)}")
    require(agg.getOrElse(20, 0L) == n / 2 - 1, s"evens minus doc 0 lose 20, got ${agg.get(20)}")
    require(agg.getOrElse(10, 0L) == n / 2, s"odds lose 10, got ${agg.get(10)}")
    spark.stop()
  }
}
