package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted cross-run band index (D17): build + append + probe, the
  * streaming serving path (stream-static join re-resolves the table
  * per microbatch, so between-trigger appends are picked up), and
  * null-text passthrough.
  */
class BandIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
    .select(col("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(9)),
        i => concat(lit("tok"), (col("doc_id") * 100 + i).cast("string")))).as("text"))

  test("build + append + batch probe: survivors are the never-indexed ids") {
    val docs = docsDf
    DedupOps.saveBandIndex(docs.filter(col("doc_id") % 2 === 0), "text",
      "band_idx_spec", shingleSize = 3, numHashes = 16)
    DedupOps.appendToBandIndex(spark, "band_idx_spec",
      docs.filter(col("doc_id") % 4 === 1), "text", shingleSize = 3, numHashes = 16)
    val kept = DedupOps.dedupAgainstBandIndex(docs, "band_idx_spec", "doc_id", "text",
      shingleSize = 3, numHashes = 16).select("doc_id").as[Long].collect().toSet
    val want = docs.filter(col("doc_id") % 4 === 3).select("doc_id").as[Long].collect().toSet
    assert(kept == want, s"${kept.diff(want)} extra, ${want.diff(kept)} missing")
  }

  test("plan guard: batch probe never ships text through a band-keyed exchange") {
    val docs = docsDf
    DedupOps.saveBandIndex(docs.filter(col("doc_id") % 2 === 0), "text",
      "band_idx_plan", shingleSize = 3, numHashes = 16)
    val out = DedupOps.dedupAgainstBandIndex(docs, "band_idx_plan", "doc_id", "text",
      shingleSize = 3, numHashes = 16)
    val offenders = out.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.output.exists(_.name == "band") && e.output.exists(_.name == "text") => e
    }
    assert(offenders.isEmpty,
      s"text rides a band-keyed shuffle (docs x bands copies):\n${offenders.mkString("\n")}")
  }

  test("streaming probe sees an index APPEND made between microbatches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val t1 = "the quick brown fox jumps over the lazy dog near the river today"
    val t2 = "a completely different second document about catalyst physical plans"
    DedupOps.saveBandIndex(Seq(t1).toDF("text"), "text", "band_idx_stream",
      shingleSize = 3, numHashes = 16)
    val ms = MemoryStream[(Long, String)](spark)
    val out = DedupOps.dedupAgainstBandIndex(
      ms.toDF().toDF("doc_id", "text"), "band_idx_stream", "doc_id", "text",
      shingleSize = 3, numHashes = 16)
    val q = out.writeStream.format("memory").queryName("band_idx_probe")
      .outputMode("complete") // ungrouped-window agg: complete mode for the test sink
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      ms.addData((1L, t1), (2L, t2))
      q.processAllAvailable()
      // t2's doc survived batch 1; index it between triggers
      DedupOps.appendToBandIndex(spark, "band_idx_stream",
        Seq(t2).toDF("text"), "text", shingleSize = 3, numHashes = 16)
      ms.addData((3L, t2), (4L, "yet another unrelated third document with fresh words entirely"))
      q.processAllAvailable()
      val kept = spark.table("band_idx_probe").select("doc_id").as[Long].collect().toSet
      // 1 indexed from the start; 3 caught by the appended bands; 2
      // was clean in batch 1 (complete mode re-grades it as caught
      // after the append — the growing-index contract); 4 survives
      assert(!kept.contains(1L) && !kept.contains(3L) && kept.contains(4L), s"kept $kept")
    } finally q.stop()
  }

  test("null-ID contaminated doc is still dropped; duplicate ids collapse to one row") {
    val t1 = "the quick brown fox jumps over the lazy dog near the river today"
    val t2 = "a completely different second document about catalyst physical plans"
    DedupOps.saveBandIndex(Seq(t1).toDF("text"), "text", "band_idx_nullid",
      shingleSize = 3, numHashes = 16)
    val docs = Seq(
      (Option.empty[Long], t1),            // contaminated, null id -> must drop
      (Some(1L), t2), (Some(1L), t2),      // duplicate id -> one row
      (Some(2L), t1)                       // contaminated -> drops
    ).toDF("doc_id", "text")
    val kept = DedupOps.dedupAgainstBandIndex(docs, "band_idx_nullid", "doc_id", "text",
      shingleSize = 3, numHashes = 16).collect()
    assert(kept.map(r => Option(r.get(0))).toSet == Set(Some(1L)) && kept.length == 1,
      s"kept ${kept.mkString(",")}")
  }

  test("null-text docs pass through the saved-index probe") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog near the river today"),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    DedupOps.saveBandIndex(docs.filter(col("doc_id") === 1), "text", "band_idx_null",
      shingleSize = 3, numHashes = 16)
    val kept = DedupOps.dedupAgainstBandIndex(docs, "band_idx_null", "doc_id", "text",
      shingleSize = 3, numHashes = 16).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), s"kept $kept")
  }
}
