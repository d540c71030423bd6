package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming IVF index maintenance (S11): vectors appended from a
  * stream land in the correct frozen-quantizer lists and are
  * retrievable at rank 1; a second trigger appends incrementally.
  */
class StreamingIvfSpec extends SparkSpec {

  test("streamed appends land in probed lists across two microbatches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 6)
    val index = IvfKnnOps.buildIndex(emb, "vec_id", "embedding", nLists = 8, maxIter = 5)
    val tmp = java.nio.file.Files.createTempDirectory("graft-sivf-spec").toString
    IvfKnnOps.saveIndex(index, s"$tmp/idx")

    val twins = queries.select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val ms = MemoryStream[(Long, Seq[Float])](spark)
    val stream = ms.toDF().toDF("vec_id", "embedding")
    val mq = IvfKnnOps.maintainSavedIndexStream(
      spark, s"$tmp/idx", stream, "embedding", s"$tmp/ckpt")
    try {
      ms.addData(twins.take(3).toSeq: _*)
      mq.processAllAvailable()
      ms.addData(twins.drop(3).toSeq: _*)
      mq.processAllAvailable()
    } finally mq.stop()

    val loaded = IvfKnnOps.loadIndex(spark, s"$tmp/idx")
    val top = IvfKnnOps.topK(queries, loaded, "vec_id", "embedding", 3, nProbe = 2)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    queries.select("vec_id").as[Long].collect().foreach { q =>
      assert(top(q) == q + 100000L, s"query $q rank-1 is ${top(q)}")
    }
  }
}
