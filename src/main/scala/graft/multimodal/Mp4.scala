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

  /** Synthesize a minimal VALID ISO-BMFF container (ftyp + moov with
    * one video track; no mdat — metadata-only, like a remuxed
    * header). Deterministic fixture/synthetic-corpus generator for
    * the parser and the driver query; timescale 1000 so durations
    * are in ms.
    */
  def synth(width: Int, height: Int, durationMs: Long, frameCount: Long): Array[Byte] = {
    def box(name: String, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + payload.length).order(ByteOrder.BIG_ENDIAN)
      bb.putInt(8 + payload.length).put(name.getBytes("ASCII")).put(payload)
      bb.array()
    }
    def full(name: String, body: ByteBuffer => Unit, len: Int): Array[Byte] = {
      val bb = ByteBuffer.allocate(len).order(ByteOrder.BIG_ENDIAN)
      body(bb)
      box(name, bb.array())
    }
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
}
