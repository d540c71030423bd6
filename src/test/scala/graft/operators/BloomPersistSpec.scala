package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted decontamination Bloom (D18): save/load round-trip,
  * merge accretion, streaming probe, null-text passthrough.
  */
class BloomPersistSpec extends SparkSpec {
  import spark.implicits._

  private val s1 = "the secret holdout benchmark sentence for contamination screening"
  private val s2 = "another hidden evaluation phrase guarded against training data leakage"

  test("save + merge + probe gates both halves; clean and null docs pass") {
    val tmp = java.nio.file.Files.createTempDirectory("bloom-spec").toString
    val path = s"file:$tmp/b.bloom"
    DedupOps.saveDecontaminationBloom(Seq(s1).toDF("text"), "text", path,
      n = 5, expectedEvalShingles = 1000L, fpp = 1e-9)
    DedupOps.mergeIntoDecontaminationBloom(spark, path, Seq(s2).toDF("text"), "text",
      n = 5, expectedEvalShingles = 1000L, fpp = 1e-9)
    val docs = Seq(
      (1L, s"prefix words here $s1"),
      (2L, s"some other prefix $s2 and a tail"),
      (3L, "a perfectly clean document about spark catalyst optimizer internals"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val kept = DedupOps.decontaminateWithSavedBloom(docs, path, "text", n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L), s"kept $kept")
  }

  test("streaming probe against the saved filter") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("bloom-spec2").toString
    val path = s"file:$tmp/b.bloom"
    DedupOps.saveDecontaminationBloom(Seq(s1).toDF("text"), "text", path,
      n = 5, expectedEvalShingles = 1000L, fpp = 1e-9)
    val ms = MemoryStream[(Long, String)](spark)
    val out = DedupOps.decontaminateWithSavedBloom(
      ms.toDF().toDF("doc_id", "text"), path, "text", n = 5)
    val q = out.writeStream.format("memory").queryName("bloom_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      ms.addData((1L, s"x $s1"), (2L, "clean document with entirely fresh vocabulary words"))
      q.processAllAvailable()
      val kept = spark.table("bloom_stream").select("doc_id").as[Long].collect().toSet
      assert(kept == Set(2L), s"kept $kept")
    } finally q.stop()
  }
}
