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
  * per-partition processing, partition sizing) are real, and so are
  * the codecs for image (JDK ImageIO), audio (javax.sound PCM) and
  * video (ISO-BMFF container parsing, [[Mp4]]); only exotic mimes
  * fall back to a DETERMINISTIC STUB standing in for a JNI/library
  * decoder.
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

  /** REAL image codec on the JDK's built-in ImageIO readers
    * (PNG/JPEG/BMP/GIF — no external native libraries): decode →
    * `[width, height, meanR, meanG, meanB, luma-histogram...]`
    * padded/truncated to `dim`. Large images are pixel-subsampled
    * (stride chosen so ≤ ~64×64 samples) so decode cost per blob is
    * bounded regardless of resolution. Undecodable bytes → null
    * (the feature column is nullable by contract).
    */
  def imageDecode(dim: Int = 8): Array[Byte] => Array[Float] = bytes => {
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) null
      else {
        val w = img.getWidth
        val h = img.getHeight
        val step = math.max(1, math.max(w, h) / 64)
        var r = 0L; var g = 0L; var b = 0L; var n = 0L
        val histBuckets = math.max(dim - 5, 1)
        val hist = new Array[Long](histBuckets)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val px = img.getRGB(x, y)
            val pr = (px >> 16) & 0xff; val pg = (px >> 8) & 0xff; val pb = px & 0xff
            r += pr; g += pg; b += pb; n += 1
            val luma = (299 * pr + 587 * pg + 114 * pb) / 1000
            hist(math.min(luma * histBuckets / 256, histBuckets - 1)) += 1
            x += step
          }
          y += step
        }
        val base = Array(w.toFloat, h.toFloat,
          (r.toDouble / n).toFloat, (g.toDouble / n).toFloat, (b.toDouble / n).toFloat)
        val histF = hist.map(c => (c.toDouble / n).toFloat)
        (base ++ histF).padTo(dim, 0.0f).take(dim)
      }
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Image resize through the JDK's Graphics2D scaler → PNG bytes —
    * the bytes-in/bytes-out transform a thumbnailing pipeline maps
    * over the content column. Undecodable input → null.
    */
  def imageResize(width: Int, height: Int): Array[Byte] => Array[Byte] = bytes => {
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) null
      else {
        val out = new java.awt.image.BufferedImage(width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g2 = out.createGraphics()
        try {
          g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(img, 0, 0, width, height, null)
        } finally g2.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** REAL audio codec on the JDK's javax.sound.sampled WAV/AIFF/AU
    * parsers: decode → `[sampleRate, channels, durationMs, RMS,
    * zeroCrossingRate, ...]` padded to `dim`. PCM frames are
    * streamed, not buffered whole. Unparseable bytes → null.
    */
  def audioDecode(dim: Int = 8): Array[Byte] => Array[Float] = bytes => {
    var raw: javax.sound.sampled.AudioInputStream = null
    var in: javax.sound.sampled.AudioInputStream = null
    try {
      raw = javax.sound.sampled.AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      val srcFmt = raw.getFormat
      val durationMs =
        if (srcFmt.getFrameRate > 0) (raw.getFrameLength * 1000.0 / srcFmt.getFrameRate) else 0.0
      // canonicalize through the JDK's converter: 24/32-bit, float,
      // and big-endian PCM all become signed 16-bit little-endian —
      // hand-parsing only the low 2 bytes of wider samples would
      // compute RMS/ZCR over noise. Unconvertible encodings throw →
      // null per the codec contract.
      val canon = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        srcFmt.getSampleRate, 16, srcFmt.getChannels,
        srcFmt.getChannels * 2, srcFmt.getSampleRate, false)
      in = javax.sound.sampled.AudioSystem.getAudioInputStream(canon, raw)
      val buf = new Array[Byte](4096)
      var sumSq = 0.0; var nSamp = 0L; var crossings = 0L; var prevSign = 0
      var read = in.read(buf)
      while (read > 0) {
        var i = 0
        while (i + 2 <= read) {
          val s = ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort.toInt
          sumSq += s.toDouble * s; nSamp += 1
          val sign = Integer.signum(s)
          if (sign != 0 && prevSign != 0 && sign != prevSign) crossings += 1
          if (sign != 0) prevSign = sign
          i += 2
        }
        read = in.read(buf)
      }
      val rms = if (nSamp > 0) math.sqrt(sumSq / nSamp) else 0.0
      val zcr = if (nSamp > 1) crossings.toDouble / nSamp else 0.0
      Array(srcFmt.getSampleRate, srcFmt.getChannels.toFloat, durationMs.toFloat,
        rms.toFloat, zcr.toFloat).padTo(dim, 0.0f).take(dim)
    } catch { case scala.util.control.NonFatal(_) => null }
    finally {
      if (in != null) in.close()
      if (raw != null) raw.close()
    }
  }

  /** REAL video codec over the ISO-BMFF container structure
    * ([[Mp4]]): `[width, height, durationMs, frameCount, fps,
    * trackCount]` padded to `dim` — the metadata a curation
    * pipeline filters and frame-samples on, parsed from the box
    * tree with no native decoder. Non-BMFF bytes → null. Pixel
    * decode stays environment-specific (JNI codec in the deployment
    * image), exactly like image GPU inference.
    */
  def videoDecode(dim: Int = 8): Array[Byte] => Array[Float] = bytes => {
    val m = Mp4.parse(bytes)
    if (m == null) null
    else {
      val head = Array(m.width.toFloat, m.height.toFloat, m.durationMs.toFloat,
        m.frameCount.toFloat, m.fps.toFloat, m.trackCount.toFloat)
      // REAL pixel decode when the codec is in JDK reach: MJPEG
      // ('jpeg'/'mjpa' sample entries) stores every frame as an
      // independent JPEG, so the keyframe renders through ImageIO —
      // [meanR, meanG, meanB] of frame 0 ride features 6..8.
      // Other codecs (avc1/hvc1...) keep the zero pad; bind a JNI
      // decoder for those in the deployment image.
      val kf =
        if (dim <= head.length) null
        else {
          val st = Mp4.samples(bytes)
          if (st == null || !(st.format == "jpeg" || st.format == "mjpa")) null
          else {
            val f0 = Mp4.frame(bytes, st, 0) // reuse the parsed table
            if (f0 == null) null else imageDecode(5)(f0) // [w, h, meanR, meanG, meanB]
          }
        }
      val tail = if (kf == null) Array.empty[Float] else kf.drop(2)
      (head ++ tail).padTo(dim, 0.0f).take(dim)
    }
  }

  /** Deterministic stand-in decoder for mime types with no JDK
    * codec (proprietary formats): never parses media, just
    * mixes content bytes into `dim` floats — same schema/batching
    * contract as [[imageDecode]]/[[audioDecode]]; swap in a JNI
    * codec in the deployment image.
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

  /** Mime-dispatched codec: JDK codecs for image/audio, the
    * ISO-BMFF container parser for video, the deterministic stub
    * for anything exotic (bind a JNI decoder there in the
    * deployment image).
    */
  def codecFor(mime: String, dim: Int = 8): Array[Byte] => Array[Float] =
    if (mime.startsWith("image/")) imageDecode(dim)
    else if (mime.startsWith("audio/")) audioDecode(dim)
    else if (mime == "video/h264" || mime == "video/avc") h264Decode(dim)
    else if (mime.startsWith("video/")) videoDecode(dim)
    else stubDecode(dim)

  /** REAL H.264 Annex-B elementary-stream decode for the JVM-reach
    * subset ([[H264]]): full NAL/SPS/PPS/slice-header parse, pixel
    * decode for I_PCM macroblocks — `[width, height, frameCount,
    * meanY, meanCb, meanCr]` of the stream padded to `dim`.
    * Predicted-macroblock streams (real encoder output) return
    * null: those need the deployment-image native decoder, and a
    * null is honest where a stub hash would be a lie.
    */
  def h264Decode(dim: Int = 8): Array[Byte] => Array[Float] = bytes => {
    val frames = try H264.decode(bytes) catch { case _: Exception => null }
    if (frames == null) null
    else {
      val f0 = frames.head
      Array(f0.width.toFloat, f0.height.toFloat, frames.length.toFloat,
        f0.meanY.toFloat, f0.meanCb.toFloat, f0.meanCr.toFloat)
        .padTo(dim, 0.0f).take(dim)
    }
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

  /** REAL per-frame video decode for MJPEG media: explode each blob
    * into (media_id, frame_idx, features) rows — every `stride`-th
    * frame extracted from the sample table ([[Mp4.samples]]) and
    * rendered through ImageIO ([[imageDecode]]: [w, h, meanR,
    * meanG, meanB, ...]). Non-MJPEG or non-BMFF blobs emit nothing
    * (their frames need the deployment-image JNI codec). Runs via
    * mapPartitions — the per-partition imperative decode case — and
    * the container is parsed ONCE per blob, each frame sliced from
    * the already-located byte range.
    */
  def decodeFrames(df: DataFrame, stride: Int = 1, dim: Int = 5): DataFrame = {
    require(stride >= 1, "stride >= 1")
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true)
    ))
    val decode = imageDecode(dim)
    val rdd = df.select("media_id", "content").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (bytes == null) Iterator.empty
        else {
          val st = Mp4.samples(bytes)
          if (st == null || !(st.format == "jpeg" || st.format == "mjpa")) Iterator.empty
          else (0 until st.sizes.length by stride).iterator.map { i =>
            val f = Mp4.frame(bytes, st, i)
            Row(id, i, if (f == null) null else decode(f))
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
