package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the two streamingMinhashDedup behaviors the r8 suite never
  * actually exercised: (1) a genuine CROSS-BATCH state hit — an
  * on-time duplicate arriving in a later microbatch must be dropped
  * via the RocksDB band state, not in-batch ordering; (2) null-text
  * docs pass through as hit=0 instead of vanishing at the band
  * explode (ADVICE r8).
  */
class StreamingMinhashStateSpec extends SparkSpec {

  private val provKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("cross-batch ON-TIME duplicate is dropped via band state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val base = 1700000000000L
    val text = "the quick brown fox jumps over the lazy dog near the river bank today"
    spark.conf.set(provKey, rocks)
    val ms = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val out = EventStreams.streamingMinhashDedup(
      ms.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text",
      shingleSize = 3, rowsPerBand = 2,
      watermark = "10 seconds", stateTtlMs = 3600 * 1000L, windowLen = "1 minute")
    val q = out.writeStream.format("memory").queryName("mh_state_hit")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      ms.addData((1L, new java.sql.Timestamp(base), text))
      q.processAllAvailable()
      // batch 2: same text 500 ms later — on time (watermark is
      // base-10s), must hit the batch-1 band marker IN STATE
      ms.addData((2L, new java.sql.Timestamp(base + 500), text))
      q.processAllAvailable()
      ms.addData((99L, new java.sql.Timestamp(base + 10 * 60 * 1000),
        "watermark pusher document entirely unlike the others"))
      q.processAllAvailable()
      ms.addData((100L, new java.sql.Timestamp(base + 20 * 60 * 1000),
        "second watermark pusher with fresh words only"))
      q.processAllAvailable()
      val kept = spark.table("mh_state_hit").select("doc_id").as[Long].collect().toSet
      assert(kept.intersect(Set(1L, 2L)) == Set(1L), s"stream kept $kept")
    } finally { q.stop(); spark.conf.unset(provKey) }
  }

  test("null-text docs pass through as kept, not silently deleted") {
    import spark.implicits._
    // batch branch exercises the same routing plan
    val docs = Seq(
      (1L, new java.sql.Timestamp(1700000000000L), "the quick brown fox jumps over the lazy dog today"),
      (2L, new java.sql.Timestamp(1700000001000L), null.asInstanceOf[String]),
      (3L, new java.sql.Timestamp(1700000002000L), "the quick brown fox jumps over the lazy dog today")
    ).toDF("doc_id", "ts", "text")
    val kept = EventStreams.streamingMinhashDedup(
      docs, "doc_id", "text", shingleSize = 3, rowsPerBand = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L), s"kept $kept")

    val corpus = Seq("the quick brown fox jumps over the lazy dog today").toDF("text")
    val keptC = EventStreams.streamingDedupAgainstCorpus(
      docs, corpus, "doc_id", "text", shingleSize = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(keptC == Set(2L), s"corpus-dedup kept $keptC")
  }
}
