package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming incremental entity resolution: the streamed min-label
  * assignment must converge to the batch blocked-Jaro + connected-
  * components labeling, including CROSS-BATCH cluster merges (a
  * later record bridging two already-stored clusters).
  */
class EntityResolutionStreamSpec extends SparkSpec {

  private val provKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  // planted names: two near-identical families under one blocking
  // prefix + an unrelated singleton. "american gold widget" variants
  // score >= 0.95 against each other; record 60 bridges 10/20 only
  // AFTER both are stored (arrives last).
  private val base = 1700000000000L
  private def rows = Seq(
    (10L, "american gold widget alpha", 0L),
    (20L, "american gold widget alphq", 1L),    // matches 10
    (30L, "american steel barrel number one", 2L),
    (40L, "american steel barrel number two", 3L),  // matches 30
    (50L, "bronze unrelated fitting", 4L),
    (60L, "american gold widget alphz", 5L)     // bridges the 10/20 cluster
  ).map { case (id, name, off) => (id, name, new java.sql.Timestamp(base + off * 1000)) }

  test("batch branch: blocked pairs + CC labels") {
    import spark.implicits._
    val rec = rows.toDF("id", "name", "ts")
    val got = EntityResolution.streamingEntityResolution(
      rec, "id", "name", minSim = 0.95, blockPrefix = 2)
      .select("id", "cluster").as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 10L, 20L -> 10L, 30L -> 30L, 40L -> 30L, 50L -> 50L, 60L -> 10L), s"got $got")
  }

  test("streamed run converges to the batch labels across microbatches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    spark.conf.set(provKey, rocks)
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val out = EntityResolution.streamingEntityResolution(
      ms.toDF().toDF("id", "name", "ts"), "id", "name",
      minSim = 0.95, blockPrefix = 2, watermark = "10 seconds",
      windowLen = "1 minute")
    val q = out.writeStream.format("memory").queryName("er_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: the two families, separately clustered
      ms.addData(rows(0), rows(2), rows(4))
      q.processAllAvailable()
      // batch 2: their partners + the bridge record
      ms.addData(rows(1), rows(3), rows(5))
      q.processAllAvailable()
      // pusher closes the window
      ms.addData((999L, "zz pusher", new java.sql.Timestamp(base + 10 * 60 * 1000)))
      q.processAllAvailable()
      ms.addData((998L, "zy pusher", new java.sql.Timestamp(base + 20 * 60 * 1000)))
      q.processAllAvailable()
      val got = spark.table("er_stream").filter(col("id") < 900)
        .groupBy("id").agg(min("cluster").as("cluster"))
        .as[(Long, Long)].collect().toMap
      assert(got == Map(10L -> 10L, 20L -> 10L, 30L -> 30L, 40L -> 30L, 50L -> 50L, 60L -> 10L), s"got $got")
      val overflow = spark.table("er_stream").agg(max("overflow")).head().getInt(0)
      assert(overflow == 0)
    } finally { q.stop(); spark.conf.unset(provKey) }
  }

  test("block overflow resolves as flagged singletons") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    spark.conf.set(provKey, rocks)
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val out = EntityResolution.streamingEntityResolution(
      ms.toDF().toDF("id", "name", "ts"), "id", "name",
      minSim = 0.95, blockPrefix = 2, maxBlockSize = 2,
      watermark = "10 seconds", windowLen = "1 minute")
    val q = out.writeStream.format("memory").queryName("er_overflow")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      ms.addData(rows(0), rows(1), rows(5)) // 3 records, cap 2 → third overflows
      q.processAllAvailable()
      ms.addData((999L, "zz pusher", new java.sql.Timestamp(base + 10 * 60 * 1000)))
      q.processAllAvailable()
      ms.addData((998L, "zy pusher", new java.sql.Timestamp(base + 20 * 60 * 1000)))
      q.processAllAvailable()
      val got = spark.table("er_overflow").filter(col("id") === 60L)
        .select("cluster", "overflow").as[(Long, Int)].collect().toSet
      assert(got == Set((60L, 1)), s"got $got")
    } finally { q.stop(); spark.conf.unset(provKey) }
  }
}
