package graft.streaming

import graft.SparkSpec
import graft.multimodal.MultimodalOps
import graft.sources.BioLoader
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDf = BioLoader.nanosToTimestamp(
    BioLoader.load(spark, s"$sfDir/events.parquet"), "ts")

  test("windowedCounts batch/stream parity: streaming run converges to the batch result") {
    val batch = EventStreams.windowedCounts(eventsDf).orderBy("window_start", "event_type").collect()

    // stream the same parquet dir through a file source
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toFile.getAbsolutePath
    eventsDf.coalesce(2).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(eventsDf.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = EventStreams.windowedCounts(stream)
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("win_counts").orderBy("window_start", "event_type").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("topKPerWindow batch/stream parity via the bounded TopK aggregate") {
    val batch = EventStreams.topKPerWindow(eventsDf, 3)
      .orderBy("window_start", "event_type", "rank").collect()
    assert(batch.nonEmpty)
    // ranks within every (window, type) group are 1..n, values non-increasing
    batch.groupBy(r => (r.get(0), r.getString(1))).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(4)).toSeq == (1 to rows.length))
      val vals = rows.sortBy(_.getInt(4)).map(_.getDouble(3))
      assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
    }

    val dir = java.nio.file.Files.createTempDirectory("graft-topk-stream").toFile.getAbsolutePath
    eventsDf.coalesce(2).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(eventsDf.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = EventStreams.topKPerWindow(stream, 3)
      .writeStream.format("memory").queryName("topk_win")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("topk_win").orderBy("window_start", "event_type", "rank").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("sessionize (typed state machine) also runs on a BATCH dataset without watermark APIs") {
    import EventStreams._
    val base = 1700000000000L
    val evts = Seq(
      Event(1, new java.sql.Timestamp(base), 7L, "view", 1.0),
      Event(2, new java.sql.Timestamp(base + 60000), 7L, "click", 2.0),
      Event(3, new java.sql.Timestamp(base + 10000000), 7L, "view", 3.0)
    ).toDS()
    // batch mode: timeouts never fire, so only CLOSED sessions emit
    // (the tail stays open — that's sessionizeBatchComplete's job);
    // the call itself must not crash on watermark-less GroupState
    val closed = sessionize(evts, gapMs = 30 * 60 * 1000L).collect()
    assert(closed.length == 1)
    assert(closed(0).n_events == 2 && closed(0).total_value == 3.0)
  }

  test("sessionize splits on gaps and flushes tails in batch mode") {
    import EventStreams._
    val base = 1700000000000L
    val evts = Seq(
      Event(1, new java.sql.Timestamp(base), 7L, "view", 1.0),
      Event(2, new java.sql.Timestamp(base + 60000), 7L, "click", 2.0),
      Event(3, new java.sql.Timestamp(base + 10000000), 7L, "view", 3.0), // new session
      Event(4, new java.sql.Timestamp(base), 8L, "view", 5.0)
    ).toDS()
    val sessions = sessionizeBatchComplete(evts, gapMs = 30 * 60 * 1000L)
      .orderBy("user_id", "start_ts").collect()
    assert(sessions.length == 3)
    val first = sessions(0)
    assert(first.getLong(0) == 7L && first.getLong(3) == 2L && first.getDouble(4) == 3.0)
    assert(sessions(1).getLong(3) == 1L)
    assert(sessions(2).getLong(0) == 8L)
  }

  test("sessionize (streaming) emits the final session via event-time timeout and evicts state") {
    import EventStreams._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = 1700000000000L
    val ms = MemoryStream[Event](spark)
    val q = sessionize(ms.toDS(), gapMs = 30 * 60 * 1000L, watermark = "10 minutes")
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      // user 7: two events, then silence
      ms.addData(
        Event(1, new java.sql.Timestamp(base), 7L, "view", 1.0),
        Event(2, new java.sql.Timestamp(base + 60000), 7L, "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_stream").count() == 0) // session still open

      // a much-later event (any user) advances the watermark past
      // user 7's gap horizon → timeout closes and emits the session
      ms.addData(Event(3, new java.sql.Timestamp(base + 3 * 60 * 60 * 1000L), 8L, "view", 5.0))
      q.processAllAvailable()
      // the timeout fires in the no-data microbatch after the
      // watermark update; poll briefly
      var tries = 0
      while (spark.table("sess_stream").count() == 0 && tries < 60) {
        Thread.sleep(500); tries += 1
      }
      val rows = spark.table("sess_stream")
        .select("user_id", "start_ts", "end_ts", "n_events", "total_value").collect()
      assert(rows.length == 1, s"expected user 7's closed session, got ${rows.toSeq}")
      val r = rows(0)
      assert(r.getLong(0) == 7L && r.getLong(1) == base && r.getLong(2) == base + 60000)
      assert(r.getLong(3) == 2L && r.getDouble(4) == 3.0)
    } finally q.stop()
  }

  test("media frame: schema, stub decode determinism, frame sampling") {
    val media = Seq((1L, "imagebytes-one".getBytes), (2L, "imagebytes-two".getBytes))
      .toDF("id", "data")
    val frame = MultimodalOps.asMediaFrame(media, "id", "data", "image/png")
    assert(frame.schema("content").dataType.typeName == "binary")
    assert(frame.select("meta.mime").as[String].head() == "image/png")

    val feats = MultimodalOps.extractFeatures(frame, dim = 8)
    val f = feats.orderBy("media_id").select("features").as[Array[Float]].collect()
    assert(f.length == 2 && f(0).length == 8)
    // deterministic: same content → same features
    val feats2 = MultimodalOps.extractFeatures(frame, dim = 8)
    assert(feats2.orderBy("media_id").select("features").as[Array[Float]].collect()(0).toSeq == f(0).toSeq)
    assert(f(0).toSeq != f(1).toSeq)

    val timed = frame.withColumn("meta", struct(
      col("meta.mime"), col("meta.width"), col("meta.height"), lit(2500L).as("duration_ms")))
    val frames = MultimodalOps.sampleFrames(timed, everyMs = 1000L)
    assert(frames.filter($"media_id" === 1).count() == 3) // 0, 1000, 2000
  }

  test("real image codec (JDK ImageIO): decode features and resize through the media frame") {
    import spark.implicits._
    // 4x2 PNG: left half pure red, right half pure blue
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if (x < w / 2) 0xff0000 else 0x0000ff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = MultimodalOps.asMediaFrame(
      Seq((1L, png(4, 2)), (2L, null.asInstanceOf[Array[Byte]])).toDF("id", "bytes"),
      "id", "bytes", "image/png")
    val feats = MultimodalOps.extractFeatures(media, dim = 8, decode = MultimodalOps.codecFor("image/png", 8))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Float](1))).toMap
    val f = feats(1L).get
    assert(f(0) == 4.0f && f(1) == 2.0f, s"dims: ${f.toSeq}")
    assert(math.abs(f(2) - 127.5f) < 1.0f && math.abs(f(4) - 127.5f) < 1.0f, s"meanR/meanB: ${f.toSeq}")
    assert(math.abs(f(3)) < 1.0f, s"meanG: ${f.toSeq}")
    assert(feats(2L).isEmpty) // null bytes → null features

    // resize: 4x2 → 2x1, still half red half blue
    val resized = MultimodalOps.imageResize(2, 1)(png(4, 2))
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(back.getWidth == 2 && back.getHeight == 1)
    // garbage bytes → null, not a crash
    assert(MultimodalOps.imageDecode(8)("not an image".getBytes) == null)
  }

  test("real video codec (ISO-BMFF): box-tree metadata round-trips; garbage and truncation are null") {
    import graft.multimodal.Mp4
    val bytes = Mp4.synth(width = 640, height = 360, durationMs = 12345L, frameCount = 300L)
    val m = Mp4.parse(bytes)
    assert(m != null)
    assert(m.width == 640 && m.height == 360, s"dims: $m")
    assert(m.durationMs == 12345L && m.frameCount == 300L, s"dur/frames: $m")
    assert(m.trackCount == 1 && math.abs(m.fps - 300000.0 / 12345.0) < 1e-6, s"fps: $m")
    // mime dispatch lands on the container parser
    val f = MultimodalOps.codecFor("video/mp4", 8)(bytes)
    assert(f != null && f(0) == 640f && f(1) == 360f && f(2) == 12345f && f(3) == 300f, s"feats: ${f.toSeq}")
    // non-BMFF and truncated inputs are null, never a crash
    assert(Mp4.parse("not a video at all".getBytes) == null)
    assert(Mp4.parse(bytes.take(20)) == null)
    assert(Mp4.parse(Array.emptyByteArray) == null)
    // box sizes that overrun the buffer must not loop or throw
    val corrupt = bytes.clone(); corrupt(0) = 0x7f.toByte
    assert(Mp4.parse(corrupt) == null)
  }

  test("MJPEG keyframe decode: synthMjpeg sample table round-trips frames; pixels render via ImageIO") {
    import graft.multimodal.Mp4
    def jpegOfGray(gray: Int, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (gray << 16) | (gray << 8) | gray
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val frames = Seq(40, 120, 200).map(jpegOfGray(_, 32, 24))
    val bytes = Mp4.synthMjpeg(width = 32, height = 24, durationMs = 3000L, frames = frames)
    // container metadata still parses (frame count from the real stsz)
    val m = Mp4.parse(bytes)
    assert(m != null && m.width == 32 && m.height == 24 && m.frameCount == 3L, s"meta: $m")
    // the sample table recovers each frame's EXACT bytes
    val st = Mp4.samples(bytes)
    assert(st != null && st.format == "jpeg" && st.sizes.length == 3, s"samples: $st")
    frames.zipWithIndex.foreach { case (f, i) =>
      assert(java.util.Arrays.equals(Mp4.frame(bytes, i), f), s"frame $i bytes") }
    assert(Mp4.frame(bytes, 3) == null && Mp4.frame(bytes, -1) == null)
    // keyframe pixels decode through the mime-dispatched codec:
    // features 6..8 are frame 0's mean RGB (solid gray 40 ± jpeg loss)
    val f = MultimodalOps.codecFor("video/mp4", 9)(bytes)
    assert(f != null && f.length == 9, s"feats: ${Option(f).map(_.toSeq)}")
    assert(f(0) == 32f && f(1) == 24f && f(3) == 3f, s"head: ${f.toSeq}")
    Seq(f(6), f(7), f(8)).foreach(c => assert(math.abs(c - 40f) <= 2f, s"kf rgb: ${f.toSeq}"))
    // dim too small for pixels → metadata head only, no decode cost
    val small = MultimodalOps.codecFor("video/mp4", 6)(bytes)
    assert(small.toSeq == Seq(32f, 24f, 3000f, 3f, 1f, 1f))
    // samples() on garbage / metadata-only containers is null, never a throw
    assert(Mp4.samples("garbage".getBytes) == null)
    assert(Mp4.samples(Mp4.synth(64, 48, 1000L, 24L)) == null)
    // crafted stsz sample count past the file length → null, not OOM
    val huge = bytes.clone()
    val stszAt = {
      def find(pat: Array[Byte]): Int = huge.indices.indexWhere(i =>
        i + pat.length <= huge.length && pat.indices.forall(j => huge(i + j) == pat(j)))
      find("stsz".getBytes("ASCII"))
    }
    assert(stszAt > 0)
    // overwrite the count word (body offset +8 after the fourcc) with 0x7FF00000
    val cntAt = stszAt + 4 + 8
    huge(cntAt) = 0x7f.toByte; huge(cntAt + 1) = 0xf0.toByte; huge(cntAt + 2) = 0; huge(cntAt + 3) = 0
    assert(Mp4.samples(huge) == null)
  }

  test("MJPEG multi-chunk layout: full stsc run resolution; decodeFrames explodes per-frame features") {
    import graft.multimodal.Mp4
    def jpegOfGray(gray: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (gray << 16) | (gray << 8) | gray
      for (y <- 0 until 24; x <- 0 until 32) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    // 5 frames, 2 per chunk → chunks (2,2,1), stsc runs (1,2),(3,1)
    val grays = Seq(24, 72, 120, 168, 216)
    val frames = grays.map(jpegOfGray)
    val bytes = Mp4.synthMjpeg(32, 24, 5000L, frames, samplesPerChunk = 2)
    val st = Mp4.samples(bytes)
    assert(st != null && st.sizes.length == 5, s"samples: $st")
    frames.zipWithIndex.foreach { case (f, i) =>
      assert(java.util.Arrays.equals(Mp4.frame(bytes, st, i), f), s"frame $i bytes (multi-chunk)") }

    // decodeFrames: one row per frame with rendered pixel means
    val blobs = Seq((7L, bytes)).toDF("doc_id", "bytes")
    val media = MultimodalOps.asMediaFrame(blobs, "doc_id", "bytes", "video/mp4")
    val rows = MultimodalOps.decodeFrames(media, stride = 1, dim = 5)
      .collect().map(r => r.getInt(1) -> r.getSeq[Float](2)).toMap
    assert(rows.size == 5, s"rows: ${rows.keySet}")
    grays.zipWithIndex.foreach { case (g, i) =>
      assert(math.abs(rows(i)(2) - g) <= 2f, s"frame $i mean ${rows(i)} vs $g") }
    // stride skips frames deterministically
    val strided = MultimodalOps.decodeFrames(media, stride = 2, dim = 5)
      .select("frame_idx").collect().map(_.getInt(0)).sorted
    assert(strided.toSeq == Seq(0, 2, 4))
    // non-MJPEG media emit nothing (no rows, no throw)
    val metaOnly = Seq((8L, Mp4.synth(64, 48, 1000L, 24L))).toDF("doc_id", "bytes")
    assert(MultimodalOps.decodeFrames(
      MultimodalOps.asMediaFrame(metaOnly, "doc_id", "bytes", "video/mp4")).count() == 0)
  }

  test("real audio codec (JDK sampled): WAV features — rate, duration, RMS, zero crossings") {
    // 100ms of a 440 Hz sine at 8 kHz, 16-bit mono PCM
    val rate = 8000f
    val n = 800
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * 440 * i / rate) * 16000).toInt.toShort
      pcm(i * 2) = (s & 0xff).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val f = MultimodalOps.audioDecode(8)(bos.toByteArray)
    assert(f != null)
    assert(f(0) == 8000f && f(1) == 1f, s"rate/channels: ${f.toSeq}")
    assert(math.abs(f(2) - 100f) < 2f, s"duration: ${f.toSeq}")
    // sine RMS = amplitude/sqrt(2) ≈ 11313
    assert(math.abs(f(3) - 11313f) < 300f, s"rms: ${f.toSeq}")
    // 440 Hz sine at 8 kHz: 2 crossings per period ≈ 0.11/sample
    assert(f(4) > 0.08f && f(4) < 0.14f, s"zcr: ${f.toSeq}")
    assert(MultimodalOps.audioDecode(8)("junk".getBytes) == null)

    // 24-bit little-endian PCM: RMS must come from real samples, not
    // the low bytes (the pre-canonicalization bug read noise)
    val pcm24 = new Array[Byte](n * 3)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * 440 * i / rate) * (16000 << 8)).toInt
      pcm24(i * 3) = (s & 0xff).toByte
      pcm24(i * 3 + 1) = ((s >> 8) & 0xff).toByte
      pcm24(i * 3 + 2) = ((s >> 16) & 0xff).toByte
    }
    val fmt24 = new javax.sound.sampled.AudioFormat(rate, 24, 1, true, false)
    val ais24 = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm24), fmt24, n.toLong)
    val bos24 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais24, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos24)
    val f24 = MultimodalOps.audioDecode(8)(bos24.toByteArray)
    assert(f24 != null)
    // canonicalized to 16-bit: same sine, same RMS as the 16-bit case
    assert(math.abs(f24(3) - 11313f) < 300f, s"24-bit rms: ${f24.toSeq}")
  }

  test("readMediaDir ingests a binary-file directory; batched decode matches per-row decode") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toFile
    java.nio.file.Files.write(new java.io.File(dir, "a.png").toPath, "img-a-bytes".getBytes)
    java.nio.file.Files.write(new java.io.File(dir, "b.png").toPath, "img-b-bytes-longer".getBytes)
    java.nio.file.Files.write(new java.io.File(dir, "skip.txt").toPath, "not-an-image".getBytes)

    val frame = MultimodalOps.readMediaDir(spark, dir.getAbsolutePath, "image/png", glob = "*.png")
    assert(frame.count() == 2) // glob pruned the .txt
    assert(frame.schema("content").dataType.typeName == "binary")
    assert(frame.select("meta.mime").as[String].head() == "image/png")

    // batched codec sees the same bytes → same features as per-row
    val perRow = MultimodalOps.extractFeatures(frame, dim = 8)
      .orderBy("media_id").select("features").as[Array[Float]].collect().map(_.toSeq)
    val batched = MultimodalOps.extractFeaturesBatched(frame, dim = 8, batchSize = 1)
      .orderBy("media_id").select("features").as[Array[Float]].collect().map(_.toSeq)
    assert(perRow.toSeq == batched.toSeq)

    // a codec that violates the batch contract is caught loudly
    val bad = intercept[org.apache.spark.SparkException] {
      MultimodalOps.extractFeaturesBatched(frame, decodeBatch = _ => Seq.empty).collect()
    }
    assert(bad.getMessage.contains("codec returned") || bad.getCause.getMessage.contains("codec returned"))
  }

  test("streamingDedupAgainstCorpus drops stream docs that near-dup the static corpus") {
    import spark.implicits._
    val base = 1700000000000L
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again today"),
      (101L, "completely unrelated corpus text about spark execution engines")
    ).toDF("doc_id", "text")

    val dir = java.nio.file.Files.createTempDirectory("graft-corpus-dedup").toFile.getAbsolutePath
    Seq(
      // near-dup of corpus doc 100 (one word changed)
      (1L, new java.sql.Timestamp(base), "the quick brown fox jumps over the lazy cat again and again today"),
      // genuinely new
      (2L, new java.sql.Timestamp(base + 1000), "a brand new document with entirely fresh content and words")
    ).toDF("doc_id", "ts", "text").write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema("doc_id LONG, ts TIMESTAMP, text STRING").parquet(dir)
    val q = EventStreams.streamingDedupAgainstCorpus(stream, corpus, "doc_id", "text",
      shingleSize = 3, rowsPerBand = 2)
      .writeStream.format("memory").queryName("corpus_dedup")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val kept = spark.table("corpus_dedup").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), s"doc 1 near-dups corpus doc 100 and must be dropped: $kept")
  }

  test("streamingNearDedup drops signature-equal docs in a stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft-neardedup").toFile.getAbsolutePath
    val base = 1700000000000L
    Seq(
      (1L, new java.sql.Timestamp(base), "the quick brown fox jumps over the lazy dog"),
      (2L, new java.sql.Timestamp(base + 1000), "the quick brown fox jumps over the lazy dog"), // dup
      (3L, new java.sql.Timestamp(base + 2000), "completely different text entirely here now")
    ).toDF("doc_id", "ts", "text").write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("doc_id LONG, ts TIMESTAMP, text STRING").parquet(dir)
    val q = EventStreams.streamingNearDedup(stream, "text")
      .writeStream.format("memory").queryName("near_dedup")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val ids = spark.table("near_dedup").select("doc_id").as[Long].collect().toSet
    assert(ids.size == 2 && ids.contains(3L))
  }

  test("streamingMinhashDedup: band-key state catches in-stream near-dups; batch twin agrees") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val base = 1700000000000L
    val rows = Seq(
      (1L, new java.sql.Timestamp(base), "the quick brown fox jumps over the lazy dog near the river bank today"),
      // near-dup of 1 (one word changed) — signature-equality would likely miss it, band overlap catches it
      (2L, new java.sql.Timestamp(base + 1000), "the quick brown fox jumps over the lazy cat near the river bank today"),
      (3L, new java.sql.Timestamp(base + 2000), "completely different content about catalyst optimizer rules and physical plans")
    )
    // batch twin first: the oracle
    val batchKept = EventStreams.streamingMinhashDedup(
      rows.toDF("doc_id", "ts", "text"), "doc_id", "text", shingleSize = 3, rowsPerBand = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(batchKept == Set(1L, 3L), s"batch twin kept $batchKept")

    val ms = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val stream = ms.toDF().toDF("doc_id", "ts", "text")
    val out = EventStreams.streamingMinhashDedup(stream, "doc_id", "text",
      shingleSize = 3, rowsPerBand = 2, watermark = "10 seconds", windowLen = "1 minute")
    // transformWithState runs on the RocksDB state store (the
    // production provider); no correctness checks are disabled
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = out.writeStream.format("memory").queryName("mh_stream_dedup")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      ms.addData(rows: _*)
      q.processAllAvailable()
      // push the watermark far past the window so the doc-level agg emits
      ms.addData((99L, new java.sql.Timestamp(base + 10 * 60 * 1000), "watermark pusher document entirely unlike the others"))
      q.processAllAvailable()
      ms.addData((100L, new java.sql.Timestamp(base + 20 * 60 * 1000), "second watermark pusher with fresh words only"))
      q.processAllAvailable()
      val kept = spark.table("mh_stream_dedup").select("doc_id").as[Long].collect().toSet
      assert(kept.intersect(Set(1L, 2L, 3L)) == Set(1L, 3L), s"stream kept $kept")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streamingMinhashDedup: TTL-expired-but-unevicted band state does not flag (stream matches twin's gap semantics)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val base = 1700000000000L
    val text = "the quick brown fox jumps over the lazy dog near the river bank today"
    // same text twice, 5s apart, TTL 1s: the band marker from doc 1
    // has outlived its TTL when doc 2 arrives, but the WATERMARK
    // (5s delay, advances only after the batch) has not yet crossed
    // lastSeen+TTL, so the state is still in the store un-evicted —
    // a state-existence hit check would wrongly drop doc 2
    val rows = Seq(
      (1L, new java.sql.Timestamp(base), text),
      (2L, new java.sql.Timestamp(base + 5000), text)
    )
    val batchKept = EventStreams.streamingMinhashDedup(
      rows.toDF("doc_id", "ts", "text"), "doc_id", "text",
      shingleSize = 3, rowsPerBand = 2, stateTtlMs = 1000L)
      .select("doc_id").as[Long].collect().toSet
    assert(batchKept == Set(1L, 2L), s"batch twin kept $batchKept")

    val ms = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val stream = ms.toDF().toDF("doc_id", "ts", "text")
    val out = EventStreams.streamingMinhashDedup(stream, "doc_id", "text",
      shingleSize = 3, rowsPerBand = 2, stateTtlMs = 1000L,
      watermark = "5 seconds", windowLen = "1 minute")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = out.writeStream.format("memory").queryName("mh_ttl_dedup")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      ms.addData(rows.head)       // batch 1 plants the band state
      q.processAllAvailable()
      ms.addData(rows(1))         // batch 2: state present but TTL-expired
      q.processAllAvailable()
      ms.addData((99L, new java.sql.Timestamp(base + 10 * 60 * 1000), "watermark pusher document entirely unlike the others"))
      q.processAllAvailable()
      ms.addData((100L, new java.sql.Timestamp(base + 20 * 60 * 1000), "second watermark pusher with fresh words only"))
      q.processAllAvailable()
      val kept = spark.table("mh_ttl_dedup").select("doc_id").as[Long].collect().toSet
      assert(kept.intersect(Set(1L, 2L)) == Set(1L, 2L), s"stream kept $kept")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("flagship entry() runs end-to-end with rows") {
    val out = graft.SparkEntry.entry(spark)
    assert(out.count() > 0)
  }
}
