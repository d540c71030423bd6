package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Design: media are opaque `binary` columns plus a typed metadata
  * struct — the same "content + metadata schema" split the
  * reference applies to omics values (features/metadata.py
  * ValueWithMetadata). All Spark-side mechanics (schema, batched
  * per-partition processing, partition sizing) are real; the codec
  * itself is a pluggable function because media codecs are
  * environment-specific — the default here is a DETERMINISTIC STUB
  * (content-hash-derived pseudo-features) standing in for a JNI/
  * library decoder.
  *
  * Scale notes: decode runs via `mapPartitions` (operator category
  * (d) — genuine per-partition imperative work on opaque bytes,
  * exactly the case the DataFrame API can't express). Batch shape
  * is one partition per task; `spark.sql.files.maxPartitionBytes`
  * governs how many blobs ride one task.
  */
object MultimodalOps {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)
    )), nullable = true)
  ))

  /** Wrap raw binary blobs + mime into the canonical media frame. */
  def asMediaFrame(df: DataFrame, idCol: String, bytesCol: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(bytesCol).cast("binary").as("content"),
      struct(
        lit(mime).as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")
      ).as("meta")
    )

  /** A decoded feature vector per media item. `decode` is the
    * pluggable codec: bytes → fixed-width feature array. The
    * default stub derives deterministic pseudo-features from the
    * content hash — schema/partitioning/batching identical to a
    * real decoder.
    */
  def extractFeatures(
      df: DataFrame,
      dim: Int = 8,
      decode: Array[Byte] => Array[Float] = stubDecode(8)
  ): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true)
    ))
    val rdd = df.select("media_id", "content").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        Row(id, if (bytes == null) null else decode(bytes))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic stand-in decoder: never parses media, just mixes
    * content bytes into `dim` floats. Replace with a real codec
    * bound in the deployment image.
    */
  def stubDecode(dim: Int): Array[Byte] => Array[Float] = bytes => {
    val out = new Array[Float](dim)
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < bytes.length) { h = (h ^ bytes(i)) * 0x100000001b3L; i += 1 }
    var d = 0
    while (d < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(d) = ((h >>> 40).toInt / 16777216.0f) - 0.5f
      d += 1
    }
    out
  }

  /** Ingest a directory of media files through Spark's `binaryFile`
    * source into the canonical media frame — the real ingestion
    * path for image/audio dirs (distributed file listing, content
    * streamed per task, `pathGlobFilter` prunes by extension).
    * media_id is the stable xxhash64 of the file path.
    */
  def readMediaDir(spark: SparkSession, dir: String, mime: String, glob: String = "*"): DataFrame = {
    val raw = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
    raw.select(
      xxhash64(col("path")).as("media_id"),
      col("content"),
      struct(
        lit(mime).as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")
      ).as("meta"),
      col("path"),
      col("length")
    )
  }

  /** Batched decode: the codec sees `batchSize` blobs at a time —
    * the contract a real vectorized decoder (GPU batch inference,
    * JNI codec with per-call setup) needs, same shape as
    * `mapInPandas` batches. Per-batch amortization is the point;
    * the stub simply delegates per item.
    */
  def extractFeaturesBatched(
      df: DataFrame,
      dim: Int = 8,
      batchSize: Int = 64,
      decodeBatch: Seq[Array[Byte]] => Seq[Array[Float]] = null
  ): DataFrame = {
    val codec: Seq[Array[Byte]] => Seq[Array[Float]] =
      if (decodeBatch != null) decodeBatch else { batch => batch.map(b => if (b == null) null else stubDecode(dim)(b)) }
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true)
    ))
    val rdd = df.select("media_id", "content").rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val ids = batch.map(_.getLong(0))
        val blobs = batch.map(r => if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1))
        val feats = codec(blobs)
        require(feats.length == blobs.length, s"codec returned ${feats.length} results for ${blobs.length} inputs")
        ids.zip(feats).map { case (id, f) => Row(id, f) }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling for time-based media: emit (media_id, frame_idx)
    * rows every `everyMs` over the metadata duration — the row
    * explosion pattern a video pipeline feeds to per-frame decode.
    */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("meta.duration_ms").isNotNull)
      .select(
        col("media_id"),
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs))).as("frame_offset_ms")
      )
}
