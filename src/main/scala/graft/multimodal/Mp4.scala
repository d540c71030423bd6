package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM ISO-BMFF (MP4/MOV) container parsing — the REAL video
  * branch of the multimodal codec dispatch (no native decoder in
  * this environment, but the container metadata a curation pipeline
  * filters on — resolution, duration, frame count, fps — is plain
  * big-endian box structure per the public ISO/IEC 14496-12 spec).
  *
  * Reference capability mirrored: packaged media columns with typed
  * metadata (reference features/metadata.py ValueWithMetadata);
  * FRAME DECODE stays environment-specific (bind a JNI codec in the
  * deployment image) — sampling/filtering on this metadata is what
  * the Spark side owns.
  */
object Mp4 {

  final case class VideoMeta(
      width: Int,
      height: Int,
      durationMs: Long,
      frameCount: Long,
      trackCount: Int
  ) {
    def fps: Double = if (durationMs > 0) frameCount * 1000.0 / durationMs else 0.0
  }

  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl")

  /** Parse the box tree; null on anything that isn't ISO-BMFF. */
  def parse(bytes: Array[Byte]): VideoMeta = {
    try {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      val st = new State
      walk(bb, 0L, bytes.length.toLong, st, inVideoTrack = false)
      if (!st.sawMoov) null
      else VideoMeta(st.width, st.height, st.durationMs, st.frameCount, st.trackCount)
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  private final class State {
    var sawMoov = false
    var mvhdTimescale = 0L
    var durationMs = 0L
    var width = 0
    var height = 0
    var frameCount = 0L
    var trackCount = 0
    // per-track scratch, committed when the trak's handler is video
    var tWidth = 0; var tHeight = 0; var tFrames = 0L; var tIsVideo = false
  }

  private def u32(bb: ByteBuffer, at: Int): Long = bb.getInt(at).toLong & 0xffffffffL

  private def walk(bb: ByteBuffer, from: Long, until: Long, st: State, inVideoTrack: Boolean): Unit = {
    var off = from
    while (off + 8 <= until) {
      val size0 = u32(bb, off.toInt)
      val name = new String(Array(bb.get(off.toInt + 4), bb.get(off.toInt + 5), bb.get(off.toInt + 6), bb.get(off.toInt + 7)), "ASCII")
      var header = 8L
      val size =
        if (size0 == 1L) { header = 16L; bb.getLong(off.toInt + 8) }
        else if (size0 == 0L) until - off
        else size0
      if (size < header || off + size > until) return
      val body = off + header
      val bodyLen = size - header
      name match {
        case "trak" =>
          st.tWidth = 0; st.tHeight = 0; st.tFrames = 0L; st.tIsVideo = false
          st.trackCount += 1
          walk(bb, body, off + size, st, inVideoTrack = false)
          if (st.tIsVideo) {
            if (st.tWidth > 0) { st.width = st.tWidth; st.height = st.tHeight }
            st.frameCount += st.tFrames
          }
        case c if Containers.contains(c) =>
          if (c == "moov") st.sawMoov = true
          walk(bb, body, off + size, st, inVideoTrack)
        case "mvhd" if bodyLen >= 20 =>
          val v = bb.get(body.toInt) & 0xff
          val (ts, dur) =
            if (v == 1) (u32(bb, body.toInt + 20), bb.getLong(body.toInt + 24))
            else (u32(bb, body.toInt + 12), u32(bb, body.toInt + 16))
          st.mvhdTimescale = ts
          if (ts > 0) st.durationMs = dur * 1000L / ts
        case "tkhd" if bodyLen >= 84 =>
          // width/height are the final two 16.16 fixed-point words
          val end = (body + bodyLen).toInt
          st.tWidth = (u32(bb, end - 8) >> 16).toInt
          st.tHeight = (u32(bb, end - 4) >> 16).toInt
        case "hdlr" if bodyLen >= 12 =>
          val h = new String(Array(bb.get(body.toInt + 8), bb.get(body.toInt + 9), bb.get(body.toInt + 10), bb.get(body.toInt + 11)), "ASCII")
          if (h == "vide") st.tIsVideo = true
        case "stsz" if bodyLen >= 12 =>
          st.tFrames = u32(bb, body.toInt + 8)
        case _ => // skip mdat / unknown boxes
      }
      off += size
    }
  }

  /** First video track's sample table — what frame extraction
    * needs: the sample-entry format fourcc plus per-sample byte
    * ranges. Resolution order: single-chunk cumulative (the common
    * simple-remux case), full stsc chunk-run resolution (first_chunk
    * runs × samples_per_chunk against the stco table), then the
    * degenerate one-sample-per-chunk layout. Null for anything that
    * isn't ISO-BMFF or whose tables don't resolve.
    */
  final case class SampleTable(format: String, offsets: Array[Long], sizes: Array[Long])

  def samples(bytes: Array[Byte]): SampleTable = {
    try {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      def kids(from: Long, until: Long): Seq[(String, Long, Long)] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
        var off = from
        var ok = true
        while (ok && off + 8 <= until) {
          val size0 = u32(bb, off.toInt)
          val name = new String(Array(bb.get(off.toInt + 4), bb.get(off.toInt + 5),
            bb.get(off.toInt + 6), bb.get(off.toInt + 7)), "ASCII")
          var header = 8L
          val size =
            if (size0 == 1L) { header = 16L; bb.getLong(off.toInt + 8) }
            else if (size0 == 0L) until - off
            else size0
          if (size < header || off + size > until) ok = false
          else { out += ((name, off + header, size - header)); off += size }
        }
        out.toSeq
      }
      def child(from: Long, len: Long, name: String): Option[(Long, Long)] =
        kids(from, from + len).collectFirst { case (n, b, l) if n == name => (b, l) }
      val top = kids(0L, bytes.length.toLong)
      val stblOpt = for {
        (moovB, moovL) <- top.collectFirst { case ("moov", b, l) => (b, l) }
        (trakB, trakL) <- kids(moovB, moovB + moovL).collectFirst {
          case ("trak", b, l) if child(b, l, "mdia").exists { case (mb, ml) =>
            child(mb, ml, "hdlr").exists { case (hb, hl) =>
              hl >= 12 && new String(Array(bb.get(hb.toInt + 8), bb.get(hb.toInt + 9),
                bb.get(hb.toInt + 10), bb.get(hb.toInt + 11)), "ASCII") == "vide"
            }
          } => (b, l)
        }
        (mdiaB, mdiaL) <- child(trakB, trakL, "mdia")
        (minfB, minfL) <- child(mdiaB, mdiaL, "minf")
        stbl <- child(minfB, minfL, "stbl")
      } yield stbl
      stblOpt match {
        case None => null
        case Some((sb, sl)) =>
          val fmt = child(sb, sl, "stsd").collect {
            case (b, l) if l >= 16 =>
              new String(Array(bb.get(b.toInt + 12), bb.get(b.toInt + 13),
                bb.get(b.toInt + 14), bb.get(b.toInt + 15)), "ASCII")
          }.orNull
          val sizes = child(sb, sl, "stsz").collect { case (b, l) if l >= 12 =>
            val uniform = u32(bb, b.toInt + 4)
            val n = u32(bb, b.toInt + 8).toInt
            // sample count is attacker-controlled input: n samples
            // cannot outnumber the file's bytes, and allocating from
            // an unvalidated count would OOM (not NonFatal) instead
            // of returning the contractual null
            if (n < 0 || n > bytes.length) null
            else if (uniform > 0) {
              if (uniform * n > bytes.length) null else Array.fill(n)(uniform)
            }
            else if (l >= 12 + 4L * n) Array.tabulate(n)(i => u32(bb, b.toInt + 12 + 4 * i))
            else null
          }.orNull
          val chunks = child(sb, sl, "stco").collect { case (b, l) if l >= 8 =>
            val n = u32(bb, b.toInt + 4).toInt
            if (n >= 0 && l >= 8 + 4L * n) Array.tabulate(n)(i => u32(bb, b.toInt + 8 + 4 * i)) else null
          }.orNull
          // stsc chunk runs: (first_chunk [1-based], samples_per_chunk)
          val runs = child(sb, sl, "stsc").collect { case (b, l) if l >= 8 =>
            val n = u32(bb, b.toInt + 4).toInt
            if (n >= 0 && l >= 8 + 12L * n)
              Array.tabulate(n)(i => (u32(bb, b.toInt + 8 + 12 * i), u32(bb, b.toInt + 12 + 12 * i)))
            else null
          }.orNull
          if (fmt == null || sizes == null || chunks == null || sizes.isEmpty) null
          else if (chunks.length == 1) {
            val offsets = sizes.scanLeft(chunks(0))(_ + _).init
            SampleTable(fmt, offsets, sizes)
          } else if (runs != null && runs.nonEmpty) {
            // full resolution: walk chunks in order, per-chunk count
            // from the active stsc run, offsets cumulative in-chunk
            val offsets = new Array[Long](sizes.length)
            var s = 0
            var run = 0
            var c = 0
            while (c < chunks.length && s < sizes.length) {
              while (run + 1 < runs.length && runs(run + 1)._1 <= c + 1) run += 1
              val perChunk = runs(run)._2.toInt
              var within = 0
              var off = chunks(c)
              while (within < perChunk && s < sizes.length) {
                offsets(s) = off; off += sizes(s); s += 1; within += 1
              }
              c += 1
            }
            if (s == sizes.length) SampleTable(fmt, offsets, sizes) else null
          } else if (chunks.length == sizes.length) SampleTable(fmt, chunks, sizes)
          else null
      }
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Bytes of sample `i` per [[samples]]; null when unavailable. */
  def frame(bytes: Array[Byte], i: Int): Array[Byte] =
    frame(bytes, samples(bytes), i)

  /** Sample extraction against an already-parsed table — per-row
    * decoders parse the box tree once and extract many frames.
    */
  def frame(bytes: Array[Byte], st: SampleTable, i: Int): Array[Byte] = {
    if (st == null || i < 0 || i >= st.sizes.length) null
    else {
      val off = st.offsets(i)
      val len = st.sizes(i)
      if (off < 0 || off + len > bytes.length) null
      else java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt)
    }
  }

  /** Synthesize a minimal VALID ISO-BMFF container (ftyp + moov with
    * one video track; no mdat — metadata-only, like a remuxed
    * header). Deterministic fixture/synthetic-corpus generator for
    * the parser and the driver query; timescale 1000 so durations
    * are in ms.
    */
  private def box(name: String, payload: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + payload.length).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(8 + payload.length).put(name.getBytes("ASCII")).put(payload)
    bb.array()
  }

  private def full(name: String, body: ByteBuffer => Unit, len: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(len).order(ByteOrder.BIG_ENDIAN)
    body(bb)
    box(name, bb.array())
  }

  def synth(width: Int, height: Int, durationMs: Long, frameCount: Long): Array[Byte] = {
    val ftyp = box("ftyp", {
      val bb = ByteBuffer.allocate(16).order(ByteOrder.BIG_ENDIAN)
      bb.put("isom".getBytes("ASCII")).putInt(0x200).put("isom".getBytes("ASCII")).put("iso2".getBytes("ASCII"))
      bb.array()
    })
    val mvhd = full("mvhd", bb => {
      bb.putInt(0)                  // version 0 + flags
      bb.putInt(0).putInt(0)        // ctime mtime
      bb.putInt(1000)               // timescale: ms
      bb.putInt(durationMs.toInt)   // duration
      bb.putInt(0x00010000)         // rate 1.0
      bb.putShort(0x0100.toShort)   // volume 1.0
      bb.putShort(0); bb.putLong(0) // reserved
      // unity matrix
      bb.putInt(0x00010000).putInt(0).putInt(0)
      bb.putInt(0).putInt(0x00010000).putInt(0)
      bb.putInt(0).putInt(0).putInt(0x40000000)
      (0 until 6).foreach(_ => bb.putInt(0)) // pre_defined
      bb.putInt(2)                  // next track id
    }, 100)
    val tkhd = full("tkhd", bb => {
      bb.putInt(7)                  // version 0, flags: enabled|in-movie|in-preview
      bb.putInt(0).putInt(0)        // ctime mtime
      bb.putInt(1)                  // track id
      bb.putInt(0)                  // reserved
      bb.putInt(durationMs.toInt)   // duration (mvhd timescale)
      bb.putLong(0)                 // reserved
      bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0) // layer/group/volume/reserved
      bb.putInt(0x00010000).putInt(0).putInt(0)
      bb.putInt(0).putInt(0x00010000).putInt(0)
      bb.putInt(0).putInt(0).putInt(0x40000000)
      bb.putInt(width << 16)        // 16.16 fixed
      bb.putInt(height << 16)
    }, 84)
    val mdhd = full("mdhd", bb => {
      bb.putInt(0)
      bb.putInt(0).putInt(0)
      bb.putInt(1000)
      bb.putInt(durationMs.toInt)
      bb.putShort(0x55c4.toShort)   // language 'und'
      bb.putShort(0)
    }, 24)
    val hdlr = full("hdlr", bb => {
      bb.putInt(0)
      bb.putInt(0)
      bb.put("vide".getBytes("ASCII"))
      bb.putInt(0).putInt(0).putInt(0) // reserved
      bb.put(0.toByte)                 // empty name
    }, 25)
    val stsz = full("stsz", bb => {
      bb.putInt(0)
      bb.putInt(0)                  // sample_size 0 → per-sample table (count only here)
      bb.putInt(frameCount.toInt)
    }, 12)
    val stbl = box("stbl", stsz)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ moov
  }

  /** Synthesize a COMPLETE Motion-JPEG ISO-BMFF file: the given
    * frames (each an independent JPEG — that is MJPEG's contract)
    * in one mdat chunk, with a real sample table (stsd 'jpeg',
    * stts, stsc, per-sample stsz, single-entry stco). This is the
    * decodable-video fixture: [[samples]]/[[frame]] recover each
    * frame's exact bytes, and any JPEG decoder renders them.
    * Layout is ftyp ++ mdat ++ moov so the chunk offset is known
    * before moov is sized. `samplesPerChunk` < frame count writes a
    * MULTI-chunk layout (contiguous chunks, real stsc runs + one
    * stco entry per chunk) — the fixture for full chunk-run
    * resolution.
    */
  def synthMjpeg(width: Int, height: Int, durationMs: Long, frames: Seq[Array[Byte]],
      samplesPerChunk: Int = Int.MaxValue): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    require(samplesPerChunk >= 1, "samplesPerChunk >= 1")
    val ftyp = box("ftyp", {
      val bb = ByteBuffer.allocate(16).order(ByteOrder.BIG_ENDIAN)
      bb.put("isom".getBytes("ASCII")).putInt(0x200).put("isom".getBytes("ASCII")).put("iso2".getBytes("ASCII"))
      bb.array()
    })
    val mdatPayload = frames.reduce(_ ++ _)
    val mdat = box("mdat", mdatPayload)
    val chunkOffset = ftyp.length + 8 // first frame byte, absolute
    val n = frames.size
    val mvhd = full("mvhd", bb => {
      bb.putInt(0); bb.putInt(0).putInt(0)
      bb.putInt(1000); bb.putInt(durationMs.toInt)
      bb.putInt(0x00010000); bb.putShort(0x0100.toShort); bb.putShort(0); bb.putLong(0)
      bb.putInt(0x00010000).putInt(0).putInt(0)
      bb.putInt(0).putInt(0x00010000).putInt(0)
      bb.putInt(0).putInt(0).putInt(0x40000000)
      (0 until 6).foreach(_ => bb.putInt(0))
      bb.putInt(2)
    }, 100)
    val tkhd = full("tkhd", bb => {
      bb.putInt(7); bb.putInt(0).putInt(0); bb.putInt(1); bb.putInt(0)
      bb.putInt(durationMs.toInt); bb.putLong(0)
      bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0)
      bb.putInt(0x00010000).putInt(0).putInt(0)
      bb.putInt(0).putInt(0x00010000).putInt(0)
      bb.putInt(0).putInt(0).putInt(0x40000000)
      bb.putInt(width << 16); bb.putInt(height << 16)
    }, 84)
    val mdhd = full("mdhd", bb => {
      bb.putInt(0); bb.putInt(0).putInt(0); bb.putInt(1000); bb.putInt(durationMs.toInt)
      bb.putShort(0x55c4.toShort); bb.putShort(0)
    }, 24)
    val hdlr = full("hdlr", bb => {
      bb.putInt(0); bb.putInt(0); bb.put("vide".getBytes("ASCII"))
      bb.putInt(0).putInt(0).putInt(0); bb.put(0.toByte)
    }, 25)
    val stsd = full("stsd", bb => {
      bb.putInt(0)       // version + flags
      bb.putInt(1)       // entry count
      bb.putInt(86)      // VisualSampleEntry size
      bb.put("jpeg".getBytes("ASCII"))
      (0 until 6).foreach(_ => bb.put(0.toByte)) // reserved
      bb.putShort(1)     // data_reference_index
      bb.putShort(0); bb.putShort(0) // pre_defined, reserved
      (0 until 3).foreach(_ => bb.putInt(0)) // pre_defined
      bb.putShort(width.toShort); bb.putShort(height.toShort)
      bb.putInt(0x00480000); bb.putInt(0x00480000) // 72 dpi
      bb.putInt(0)       // reserved
      bb.putShort(1)     // frame_count per sample
      (0 until 32).foreach(_ => bb.put(0.toByte)) // compressorname
      bb.putShort(24)    // depth
      bb.putShort(-1)    // pre_defined
    }, 8 + 86)
    val stts = full("stts", bb => {
      bb.putInt(0); bb.putInt(1)
      bb.putInt(n); bb.putInt(math.max(1, (durationMs / n).toInt))
    }, 16)
    // chunk plan: groups of samplesPerChunk contiguous frames; stsc
    // runs compress to (first_chunk, count) transitions, stco holds
    // one absolute offset per chunk
    val chunkCounts = frames.grouped(math.min(samplesPerChunk, n)).map(_.size).toArray
    val chunkOffsets = {
      val frameLens = frames.map(_.length.toLong)
      val starts = frameLens.scanLeft(chunkOffset.toLong)(_ + _).init
      var idx = 0
      chunkCounts.map { cnt => val o = starts(idx); idx += cnt; o }
    }
    val stscRuns = chunkCounts.zipWithIndex
      .filter { case (cnt, i) => i == 0 || cnt != chunkCounts(i - 1) }
      .map { case (cnt, i) => (i + 1, cnt) }
    val stsc = full("stsc", bb => {
      bb.putInt(0); bb.putInt(stscRuns.length)
      stscRuns.foreach { case (first, cnt) => bb.putInt(first); bb.putInt(cnt); bb.putInt(1) }
    }, 8 + 12 * stscRuns.length)
    val stsz = full("stsz", bb => {
      bb.putInt(0); bb.putInt(0); bb.putInt(n)
      frames.foreach(f => bb.putInt(f.length))
    }, 12 + 4 * n)
    val stco = full("stco", bb => {
      bb.putInt(0); bb.putInt(chunkOffsets.length)
      chunkOffsets.foreach(o => bb.putInt(o.toInt))
    }, 8 + 4 * chunkOffsets.length)
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ mdat ++ moov
  }
}
