package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TFRecord sink/source: CRC32C test vector, byte-exact round-trip
  * incl. nulls and array features, and loud corruption detection.
  */
class TfRecordIOSpec extends SparkSpec {
  import spark.implicits._

  test("crc32c matches the RFC 3720 test vector; masking matches the TFRecord spec") {
    val v = "123456789".getBytes("ASCII")
    assert(TfRecordIO.crc32c(v, 0, v.length) == 0xE3069283, "crc32c('123456789')")
    // masked crc is rot15 + magic — spot-check the transform is applied
    val m = TfRecordIO.maskedCrc(v, 0, v.length)
    val c = 0xE3069283
    assert(m == ((c >>> 15) | (c << 17)) + 0xa282ead8)
  }

  test("round-trip: longs, strings, nulls, long/float arrays survive byte-exactly") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType),
      StructField("toks", ArrayType(LongType)), StructField("emb", ArrayType(FloatType))))
    val rows = Seq(
      org.apache.spark.sql.Row(1L, "hello tfrecord", Seq(1L, 2L, 300L), Seq(1.5f, -2.25f)),
      org.apache.spark.sql.Row(2L, null, Seq(7L), Seq(0.0f)),
      org.apache.spark.sql.Row(3L, "third é row", null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val tmp = java.nio.file.Files.createTempDirectory("tfr").toString
    TfRecordIO.write(df, s"file:$tmp/out")
    val back = TfRecordIO.read(spark, s"file:$tmp/out", schema)
      .collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSet
    val want = rows.map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSet
    assert(back == want, s"got $back")
  }

  test("documents table round-trips at sf0.001") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("tfr2").toString
    TfRecordIO.write(docs.repartition(4), s"file:$tmp/docs")
    val back = TfRecordIO.read(spark, s"file:$tmp/docs", docs.schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("streamRecords: record-at-a-time off an InputStream, truncation fails loudly") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "ccc")).toDF("id", "t").coalesce(1)
    val tmp = java.nio.file.Files.createTempDirectory("tfr4").toString
    TfRecordIO.write(df, s"file:$tmp/s")
    val f = new java.io.File(s"$tmp/s").listFiles().filter(_.getName.endsWith(".tfrecord")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    // full stream yields 3 records identical to the whole-shard parse
    val streamed = TfRecordIO.streamRecords(
      new java.io.ByteArrayInputStream(bytes), bytes.length.toLong, "s").toList
    val parsed = TfRecordIO.parseShard(bytes).toList
    assert(streamed.size == 3 &&
      streamed.zip(parsed).forall { case (a, b) => java.util.Arrays.equals(a, b) })
    // cut mid-payload: the CRC/readFully path must throw, not EOF-silently
    val cut = java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 6)
    val ex = intercept[Exception] {
      TfRecordIO.streamRecords(
        new java.io.ByteArrayInputStream(cut), bytes.length.toLong, "s").toList
    }
    assert(ex.getMessage.contains("truncated"), s"got: ${ex.getMessage}")
  }

  test("a flipped byte fails the CRC loudly, never yields silent rows") {
    val df = Seq((1L, "abc")).toDF("id", "t")
    val tmp = java.nio.file.Files.createTempDirectory("tfr3").toString
    TfRecordIO.write(df, s"file:$tmp/c")
    val f = new java.io.File(s"$tmp/c").listFiles().filter(_.getName.endsWith(".tfrecord")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x40).toByte
    java.nio.file.Files.write(f.toPath, bytes)
    val ex = intercept[Exception] {
      TfRecordIO.read(spark, s"file:$tmp/c", df.schema).collect()
    }
    assert(ex.getMessage != null)
  }

  test("write is stage-and-swap: a failing job leaves the previous dataset intact") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val tmp = java.nio.file.Files.createTempDirectory("tfr3").toString
    val ok = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text")
    TfRecordIO.write(ok, s"file:$tmp/d")
    val boom = org.apache.spark.sql.functions.udf((s: String) =>
      if (s != null) throw new RuntimeException("boom") else s)
    intercept[Exception] {
      TfRecordIO.write(ok.select($"id", boom($"text").as("text")), s"file:$tmp/d")
    }
    val back = TfRecordIO.read(spark, s"file:$tmp/d", schema)
      .as[(Long, String)].collect().sorted.toSeq
    assert(back == Seq((1L, "alpha"), (2L, "beta")), s"previous dataset lost: $back")
    val leftovers = new java.io.File(s"$tmp/d").listFiles()
      .map(_.getName).filter(_.startsWith(".staging"))
    assert(leftovers.isEmpty, s"staging not cleaned: ${leftovers.toSeq}")
  }
}
