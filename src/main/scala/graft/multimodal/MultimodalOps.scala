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

  // ImageIO's default stream cache is DISK-backed: every
  // `read(InputStream)` / `write(_, _, OutputStream)` spills the
  // (already in-memory) bytes to a temp FILE — 500 temp-file
  // create/write/delete cycles per image query, invisible when the
  // disk is idle and a multi-× degradation when a concurrent pass
  // (shuffle spill, ContextCleaner, checkpoint I/O) contends for it
  // (the r13 q_image_dedup 0.48→1.46 s full-window anomaly; targeted
  // A/B windows showed no code regression). Earlier rounds flipped
  // `ImageIO.setUseCache(false)` JVM-wide; that silently changed
  // ImageIO behavior for any co-resident code embedding this library
  // (r14 ADVICE). Instead graft's OWN codec paths hand ImageIO an
  // explicit Memory-cache image stream — per-call, no global state.
  private def readImageInMemory(bytes: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))

  /** Encode through an in-memory ImageIO stream (see cache note
    * above); `fmt` is an ImageIO format name ("png", "jpg"). */
  def writeImageInMemory(img: java.awt.image.RenderedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      javax.imageio.ImageIO.write(img, fmt, ios)
      ios.flush()
    } finally ios.close()
    bos.toByteArray
  }

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
      val img = readImageInMemory(bytes)
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
      val img = readImageInMemory(bytes)
      if (img == null) null
      else {
        val out = new java.awt.image.BufferedImage(width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g2 = out.createGraphics()
        try {
          g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(img, 0, 0, width, height, null)
        } finally g2.dispose()
        writeImageInMemory(out, "png")
      }
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** 64-bit perceptual difference hash (dHash) of an encoded image:
    * ImageIO decode → area-average onto a 9×8 luma grid (manual
    * block averaging with the [[imageDecode]] subsample stride, so
    * the hash is deterministic across JVMs — no Graphics2D
    * interpolation in the path) → bit (8·y + x) set when cell
    * (x, y) is darker than its right neighbor. Gradient signs
    * survive brightness shifts and lossless re-encodes, so
    * near-identical images collide and the hash feeds straight into
    * the simhash-style hamming-banded dedup. Unreadable bytes →
    * null (fail-closed, the multimodal codec contract).
    */
  def imageDHash: Array[Byte] => java.lang.Long = imageDHashKernel(_)

  /** Static kernel form of [[imageDHash]] — generated code calls it
    * through the object's static forwarder
    * (`graft.multimodal.MultimodalOps.imageDHashKernel`), the same
    * discipline as `HashExpressions.simhashTextKernel`.
    */
  def imageDHashKernel(bytes: Array[Byte]): java.lang.Long = {
    try {
      val img = readImageInMemory(bytes)
      if (img == null) null
      else {
        val w = img.getWidth; val h = img.getHeight
        val step = math.max(1, math.max(w, h) / 64)
        val luma = Array.ofDim[Double](8, 9)
        var gy = 0
        while (gy < 8) {
          val y0 = gy * h / 8; val y1 = math.max((gy + 1) * h / 8, y0 + 1)
          var gx = 0
          while (gx < 9) {
            val x0 = gx * w / 9; val x1 = math.max((gx + 1) * w / 9, x0 + 1)
            var s = 0L; var n = 0L
            var y = y0
            while (y < y1 && y < h) {
              var x = x0
              while (x < x1 && x < w) {
                val px = img.getRGB(x, y)
                s += (299 * ((px >> 16) & 0xff) + 587 * ((px >> 8) & 0xff) + 114 * (px & 0xff)) / 1000
                n += 1; x += step
              }
              y += step
            }
            luma(gy)(gx) = if (n == 0) 0.0 else s.toDouble / n
            gx += 1
          }
          gy += 1
        }
        var sig = 0L
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            if (luma(yy)(xx) < luma(yy)(xx + 1)) sig |= 1L << (yy * 8 + xx)
            xx += 1
          }
          yy += 1
        }
        java.lang.Long.valueOf(sig)
      }
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Deterministic 9×8 grayscale PNG whose dHash is exactly the
    * class pattern `((x + y + cls) % 8) < 4` — adjacent classes are
    * ≥ 16 hamming apart, same-class images are hamming-0 regardless
    * of `brightness` (a uniform luma shift that changes the BYTES
    * but no gradient sign). The fixture generator for perceptual-
    * dedup oracles and specs: class membership, not byte equality,
    * must drive the pairing.
    */
  def classPatternPng(cls: Int, brightness: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var l = 128 + brightness
      var x = 0
      while (x < 9) {
        if (x > 0) l = if (((x - 1 + y + cls) % 8 + 8) % 8 < 4) l + 10 else l - 10
        val v = math.max(0, math.min(255, l))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    writeImageInMemory(img, "png")
  }

  /** Perceptual near-dup pairs over an image bytes column: [[imageDHash]]
    * per blob (scan-stage, no shuffle), then the simhash quarter-band
    * plan ([[graft.operators.DedupOps.hammingPairs64]]) — ONE
    * groupBy(band) shuffle of (id, sig) rows, capped buckets,
    * bucket-local fused hamming verify. Undecodable blobs drop out
    * (null sig) rather than pairing up.
    */
  def perceptualDedup(
      df: DataFrame,
      idCol: String,
      bytesCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000
  ): DataFrame =
    // id passes through UN-cast: hammingPairs64's integral-id check
    // must see the caller's type (a silent cast('long') here would
    // turn a string id into nulls — the failure the guard exists for)
    graft.operators.DedupOps.hammingPairs64(
      df.select(col(idCol).as("id"),
        graft.functions.PerceptualExpressions.imageDHash64(col(bytesCol)).as("sig")),
      "id", "sig", maxHamming, maxBucket)

  /** "No silent caps" telemetry for [[perceptualDedup]]: exact
    * member counts of the quarter-band buckets past `maxBucket` —
    * the constant-signature classes (black frames, test cards) that
    * the capped pass drops wholesale at scrape scale. Same
    * drop-and-report contract as the D12 family. Returns
    * (q, k, n_members, n_lost_pairs).
    */
  def perceptualOverflowReport(
      df: DataFrame,
      idCol: String,
      bytesCol: String,
      maxBucket: Int = 1000,
      maxHamming: Int = 3
  ): DataFrame =
    // maxHamming must match the dedup pass it diagnoses: the probed
    // banding's buckets depend on it
    graft.operators.DedupOps.hammingOverflowReport(
      df.select(col(idCol).as("id"),
        graft.functions.PerceptualExpressions.imageDHash64(col(bytesCol)).as("sig")),
      "id", "sig", maxBucket, maxHamming)

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

  /** 64-bit audio fingerprint — the [[imageDHash]] idea on the time
    * axis: canonicalize to 16-bit PCM (the [[audioDecode]]
    * converter), mean |sample| over 65 equal time slices, bit i set
    * when slice i is quieter than slice i+1. Energy-DELTA signs
    * survive uniform gain changes and bit-depth re-encodes, so the
    * same clip at different volumes collides; feeds
    * [[graft.operators.DedupOps.hammingPairs64]] like the image
    * hash. Streams frames (no whole-clip buffering); unparseable
    * bytes or unknown frame length → null (fail-closed).
    */
  def audioFingerprint: Array[Byte] => java.lang.Long = audioFingerprintKernel(_)

  /** Static kernel form of [[audioFingerprint]] — see
    * [[imageDHashKernel]] for the codegen-forwarder rationale.
    */
  def audioFingerprintKernel(bytes: Array[Byte]): java.lang.Long = {
    var raw: javax.sound.sampled.AudioInputStream = null
    var in: javax.sound.sampled.AudioInputStream = null
    try {
      raw = javax.sound.sampled.AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      val srcFmt = raw.getFormat
      val totalFrames = raw.getFrameLength
      if (totalFrames <= 0) null
      else {
        val canon = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          srcFmt.getSampleRate, 16, srcFmt.getChannels,
          srcFmt.getChannels * 2, srcFmt.getSampleRate, false)
        in = javax.sound.sampled.AudioSystem.getAudioInputStream(canon, raw)
        val ch = srcFmt.getChannels
        val sliceSum = new Array[Double](65)
        val sliceN = new Array[Long](65)
        val buf = new Array[Byte](4096)
        var frameIdx = 0L
        var read = in.read(buf)
        while (read > 0) {
          var i = 0
          while (i + 2 * ch <= read) {
            // one FRAME: mean |sample| across channels, so a stereo
            // mixdown of the same material stays comparable
            var c = 0; var s = 0.0
            while (c < ch) {
              s += math.abs(((buf(i + 2 * c + 1) << 8) | (buf(i + 2 * c) & 0xff)).toShort.toInt)
              c += 1
            }
            val slice = math.min((frameIdx * 65 / totalFrames).toInt, 64)
            sliceSum(slice) += s / ch; sliceN(slice) += 1
            frameIdx += 1; i += 2 * ch
          }
          read = in.read(buf)
        }
        if (frameIdx == 0) null
        else {
          val e = Array.tabulate(65)(s => if (sliceN(s) == 0) 0.0 else sliceSum(s) / sliceN(s))
          var sig = 0L
          var b = 0
          while (b < 64) { if (e(b) < e(b + 1)) sig |= 1L << b; b += 1 }
          java.lang.Long.valueOf(sig)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => null }
    finally {
      if (in != null) in.close()
      if (raw != null) raw.close()
    }
  }

  /** Deterministic mono 16-bit WAV whose [[audioFingerprint]] is
    * exactly the class pattern `((i + cls) % 8) < 4`: 65 slices of
    * 40 samples, each slice a ±amplitude square wave (mean |sample|
    * = the amplitude EXACTLY, no partial-period noise), amplitude
    * laddering ±60 on the class bit. `gain` scales every sample —
    * different bytes, identical energy-delta signs. Fixture
    * generator for audio-dedup oracles and specs.
    */
  def classPatternWav(cls: Int, gain: Double): Array[Byte] = {
    val amps = new Array[Double](65)
    amps(0) = 5000.0
    for (i <- 0 until 64)
      amps(i + 1) = if (((i + cls) % 8 + 8) % 8 < 4) amps(i) + 60 else amps(i) - 60
    val pcm = new Array[Byte](65 * 40 * 2)
    var k = 0
    for (s <- 0 until 65; j <- 0 until 40) {
      val a = (amps(s) * gain * (if ((j / 2) % 2 == 0) 1 else -1)).toInt.toShort
      pcm(k) = (a & 0xff).toByte; pcm(k + 1) = ((a >> 8) & 0xff).toByte
      k += 2
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 65L * 40)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Audio near-dup pairs over a bytes column: [[audioFingerprint]]
    * in the scan stage, then the shared quarter-band hamming plan —
    * same contract as [[perceptualDedup]].
    */
  def audioDedup(
      df: DataFrame,
      idCol: String,
      bytesCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000
  ): DataFrame =
    // un-cast id: see perceptualDedup
    graft.operators.DedupOps.hammingPairs64(
      df.select(col(idCol).as("id"),
        graft.functions.PerceptualExpressions.audioFingerprint64(col(bytesCol)).as("sig")),
      "id", "sig", maxHamming, maxBucket)

  /** [[perceptualOverflowReport]] for the audio fingerprint path —
    * the over-cap class here is silence / constant tones. Returns
    * (q, k, n_members, n_lost_pairs).
    */
  def audioOverflowReport(
      df: DataFrame,
      idCol: String,
      bytesCol: String,
      maxBucket: Int = 1000,
      maxHamming: Int = 3
  ): DataFrame =
    graft.operators.DedupOps.hammingOverflowReport(
      df.select(col(idCol).as("id"),
        graft.functions.PerceptualExpressions.audioFingerprint64(col(bytesCol)).as("sig")),
      "id", "sig", maxBucket, maxHamming)

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
