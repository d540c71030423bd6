package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** H.264/AVC (ITU-T Rec. H.264) Annex-B elementary-stream support —
  * the JVM-reach subset: a REAL NAL/SPS/PPS/slice-header parser
  * (exp-Golomb, emulation-prevention, the full baseline header
  * field walk) and REAL pixel decode for I_PCM macroblocks.
  *
  * Why I_PCM: it is the one macroblock type the standard defines as
  * raw uncompressed samples (no CAVLC residuals, no intra
  * prediction, no deblocking) — a spec-valid bitstream any
  * conformant decoder plays, and the only H.264 pixel path that is
  * honest to implement without a native codec. Predicted
  * macroblocks (the output of real encoders) still need the
  * JNI/deployment-image decoder; [[decode]] returns null for them
  * rather than pretending. The parsing layer (NAL walk, SPS
  * geometry, slice headers) is shared either way — it is what a
  * curation pipeline filters on before any pixel work.
  *
  * [[synth]] writes the same subset (SPS + PPS + one IDR I_PCM
  * slice per frame) and exists so fixtures exercise a genuine
  * bitstream round-trip: I_PCM is lossless, so decoded planes must
  * equal the synthesized planes byte-for-byte.
  *
  * Format reference: ISO/IEC 14496-10 sections 7.3 (syntax), 7.4
  * (semantics), Annex B (byte-stream framing). 4:2:0 8-bit only
  * (baseline profile 66).
  */
object H264 {

  final case class Sps(
      profile: Int,
      level: Int,
      log2MaxFrameNum: Int,
      picOrderCntType: Int,
      log2MaxPocLsb: Int,
      widthMbs: Int,
      heightMbs: Int) {
    def width: Int = widthMbs * 16
    def height: Int = heightMbs * 16
  }

  final case class Frame(width: Int, height: Int, y: Array[Byte], cb: Array[Byte], cr: Array[Byte]) {
    def meanY: Double = y.map(_ & 0xff).sum.toDouble / y.length
    def meanCb: Double = cb.map(_ & 0xff).sum.toDouble / cb.length
    def meanCr: Double = cr.map(_ & 0xff).sum.toDouble / cr.length
  }

  // ---- bit I/O over RBSP ---------------------------------------------------

  private final class BitReader(rbsp: Array[Byte]) {
    private var pos = 0 // bit position
    def bitsLeft: Int = rbsp.length * 8 - pos
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byte = rbsp(pos >> 3) & 0xff
        v = (v << 1) | ((byte >> (7 - (pos & 7))) & 1)
        pos += 1; i += 1
      }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (u(1) == 0 && zeros < 32) zeros += 1
      if (zeros == 0) 0 else (1 << zeros) - 1 + u(zeros)
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 0) -(k / 2) else (k + 1) / 2
    }
    def byteAlign(): Unit = while ((pos & 7) != 0) pos += 1
    def rawByte(): Int = { val v = u(8); v }
  }

  private final class BitWriter {
    private val out = ArrayBuffer[Byte]()
    private var cur = 0
    private var nBits = 0
    def u(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nBits += 1
        if (nBits == 8) { out += cur.toByte; cur = 0; nBits = 0 }
        i -= 1
      }
    }
    def ue(v: Int): Unit = {
      val vv = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(vv)
      u(0, len - 1); u(vv, len)
    }
    def se(v: Int): Unit = ue(if (v <= 0) -2 * v else 2 * v - 1)
    def byteAlignZero(): Unit = while (nBits != 0) u(0, 1)
    def trailingBits(): Unit = { u(1, 1); byteAlignZero() }
    def bytes: Array[Byte] = { require(nBits == 0, "unaligned"); out.toArray }
  }

  /** EBSP → RBSP: strip emulation-prevention 03 bytes. */
  private def unescape(b: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val out = new ArrayBuffer[Byte](until - from)
    var i = from
    var zeros = 0
    while (i < until) {
      val v = b(i)
      if (zeros >= 2 && v == 3) { zeros = 0 } // skip the escape byte
      else {
        out += v
        zeros = if (v == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toArray
  }

  /** RBSP → EBSP: insert 03 after 00 00 when the next byte is ≤ 03. */
  private def escape(rbsp: Array[Byte]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](rbsp.length + 16)
    var zeros = 0
    rbsp.foreach { v =>
      if (zeros >= 2 && (v & 0xff) <= 3) { out += 3; zeros = 0 }
      out += v
      zeros = if (v == 0) zeros + 1 else 0
    }
    out.toArray
  }

  /** Annex-B NAL split: (nal_unit_type, RBSP payload) per NAL. */
  def nals(bytes: Array[Byte]): Seq[(Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 5) return Nil
    val starts = ArrayBuffer[Int]()
    var i = 0
    while (i + 2 < bytes.length) {
      if (bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1) { starts += i + 3; i += 3 }
      else i += 1
    }
    if (starts.isEmpty) return Nil
    starts.zipAll(starts.drop(1).map(_ - 3), -1, bytes.length).map { case (s, e0) =>
      // a 4-byte start code leaves a trailing 00 before the next one
      var e = e0
      while (e > s && bytes(e - 1) == 0) e -= 1
      val header = bytes(s) & 0xff
      (header & 0x1f, unescape(bytes, s + 1, e))
    }.toSeq
  }

  def parseSps(rbsp: Array[Byte]): Sps = {
    val r = new BitReader(rbsp)
    val profile = r.u(8)
    r.u(8) // constraint flags + reserved
    val level = r.u(8)
    r.ue() // sps id
    require(!Set(100, 110, 122, 244, 44, 83, 86, 118, 128).contains(profile),
      s"high-profile SPS (profile $profile) needs the chroma_format walk — out of JVM-decode scope")
    val log2MaxFrameNum = r.ue() + 4
    val poc = r.ue()
    val log2MaxPocLsb = if (poc == 0) r.ue() + 4
      else if (poc == 1) {
        r.u(1); r.se(); r.se()
        val n = r.ue(); (0 until n).foreach(_ => r.se()); 0
      } else 0
    r.ue() // max_num_ref_frames
    r.u(1) // gaps_in_frame_num_value_allowed
    val wMbs = r.ue() + 1
    val hMapUnits = r.ue() + 1
    val frameMbsOnly = r.u(1)
    require(frameMbsOnly == 1, "interlaced streams out of scope")
    r.u(1) // direct_8x8_inference
    val crop = r.u(1)
    require(crop == 0, "frame cropping unsupported in the I_PCM subset")
    r.u(1) // vui_present
    Sps(profile, level, log2MaxFrameNum, poc, log2MaxPocLsb, wMbs, hMapUnits)
  }

  /** Minimal PPS: returns entropy_coding_mode_flag (0 = CAVLC). */
  def parsePps(rbsp: Array[Byte]): Int = {
    val r = new BitReader(rbsp)
    r.ue(); r.ue() // pps id, sps id
    r.u(1) // entropy_coding_mode_flag
  }

  /** Decode every I_PCM IDR frame of an Annex-B stream; null when
    * the stream is not H.264 or uses predicted macroblocks (those
    * need the deployment-image native decoder).
    */
  def decode(bytes: Array[Byte]): Seq[Frame] = {
    val units = nals(bytes)
    if (units.isEmpty) return null
    var sps: Sps = null
    var cavlc = true
    val frames = ArrayBuffer[Frame]()
    units.foreach {
      case (7, rbsp) => sps = parseSps(rbsp)
      case (8, rbsp) => cavlc = parsePps(rbsp) == 0
      case (t, rbsp) if t == 5 || t == 1 =>
        if (sps == null || !cavlc) return null
        val f = decodeSlice(rbsp, sps, idr = t == 5)
        if (f == null) return null
        frames += f
      case _ => // SEI/AUD/filler — skip
    }
    if (frames.isEmpty) null else frames.toSeq
  }

  private def decodeSlice(rbsp: Array[Byte], sps: Sps, idr: Boolean): Frame = {
    val r = new BitReader(rbsp)
    val firstMb = r.ue()
    val sliceType = r.ue()
    if (sliceType % 5 != 2) return null // I slices only
    r.ue() // pps id
    r.u(sps.log2MaxFrameNum) // frame_num
    if (idr) r.ue() // idr_pic_id
    if (sps.picOrderCntType == 0) r.u(sps.log2MaxPocLsb)
    if (idr) { r.u(1); r.u(1) } // dec_ref_pic_marking
    r.se() // slice_qp_delta
    if (firstMb != 0) return null // one slice per picture in this subset
    val (w, h) = (sps.width, sps.height)
    val y = new Array[Byte](w * h)
    val cb = new Array[Byte](w * h / 4)
    val cr = new Array[Byte](w * h / 4)
    val nMbs = sps.widthMbs * sps.heightMbs
    var mb = 0
    while (mb < nMbs) {
      val mbType = r.ue()
      if (mbType != 25) return null // not I_PCM — native-decoder land
      r.byteAlign()
      val mbX = (mb % sps.widthMbs) * 16
      val mbY = (mb / sps.widthMbs) * 16
      var i = 0
      while (i < 256) {
        y((mbY + i / 16) * w + mbX + i % 16) = r.rawByte().toByte
        i += 1
      }
      val cw = w / 2
      i = 0
      while (i < 64) {
        cb((mbY / 2 + i / 8) * cw + mbX / 2 + i % 8) = r.rawByte().toByte
        i += 1
      }
      i = 0
      while (i < 64) {
        cr((mbY / 2 + i / 8) * cw + mbX / 2 + i % 8) = r.rawByte().toByte
        i += 1
      }
      mb += 1
    }
    Frame(w, h, y, cb, cr)
  }

  // ---- synthesis -----------------------------------------------------------

  private def nal(refIdc: Int, nalType: Int, rbsp: Array[Byte]): Array[Byte] =
    Array[Byte](0, 0, 0, 1, ((refIdc << 5) | nalType).toByte) ++ escape(rbsp)

  /** A spec-valid baseline Annex-B stream: SPS + PPS + one IDR
    * I_PCM slice per frame. Dimensions must be multiples of 16.
    * `planes(f)` = (y, cb, cr) raw 4:2:0 samples for frame f.
    */
  def synth(width: Int, height: Int, planes: Seq[(Array[Byte], Array[Byte], Array[Byte])]): Array[Byte] = {
    require(width % 16 == 0 && height % 16 == 0, "I_PCM subset wants MB-aligned dims")
    val wMbs = width / 16; val hMbs = height / 16
    val sps = {
      val w = new BitWriter
      w.u(66, 8); w.u(0, 8); w.u(20, 8) // baseline, level 2.0
      w.ue(0)            // sps id
      w.ue(0)            // log2_max_frame_num_minus4
      w.ue(2)            // pic_order_cnt_type 2: no POC in headers
      w.ue(0)            // max_num_ref_frames
      w.u(0, 1)          // gaps_in_frame_num
      w.ue(wMbs - 1); w.ue(hMbs - 1)
      w.u(1, 1)          // frame_mbs_only
      w.u(0, 1)          // direct_8x8_inference
      w.u(0, 1)          // frame_cropping
      w.u(0, 1)          // vui
      w.trailingBits()
      w.bytes
    }
    val pps = {
      val w = new BitWriter
      w.ue(0); w.ue(0)   // pps id, sps id
      w.u(0, 1)          // entropy_coding_mode: CAVLC
      w.u(0, 1)          // bottom_field_pic_order_in_frame_present
      w.ue(0)            // num_slice_groups_minus1
      w.ue(0); w.ue(0)   // num_ref_idx_l0/l1_active_minus1
      w.u(0, 1)          // weighted_pred
      w.u(0, 2)          // weighted_bipred_idc
      w.se(0); w.se(0)   // pic_init_qp/qs_minus26
      w.se(0)            // chroma_qp_index_offset
      w.u(0, 1)          // deblocking_filter_control_present
      w.u(0, 1)          // constrained_intra_pred
      w.u(0, 1)          // redundant_pic_cnt_present
      w.trailingBits()
      w.bytes
    }
    val slices = planes.map { case (y, cbP, crP) =>
      require(y.length == width * height && cbP.length == width * height / 4 &&
        crP.length == width * height / 4, "plane sizes must match 4:2:0 geometry")
      val w = new BitWriter
      w.ue(0)            // first_mb_in_slice
      w.ue(7)            // slice_type: I (all slices of the picture)
      w.ue(0)            // pps id
      w.u(0, 4)          // frame_num (log2MaxFrameNum = 4)
      w.ue(0)            // idr_pic_id
      w.u(0, 1); w.u(0, 1) // dec_ref_pic_marking (IDR)
      w.se(0)            // slice_qp_delta
      val cw = width / 2
      var mb = 0
      while (mb < wMbs * hMbs) {
        val mbX = (mb % wMbs) * 16
        val mbY = (mb / wMbs) * 16
        w.ue(25)         // I_PCM
        w.byteAlignZero()
        var i = 0
        while (i < 256) { w.u(y((mbY + i / 16) * width + mbX + i % 16) & 0xff, 8); i += 1 }
        i = 0
        while (i < 64) { w.u(cbP((mbY / 2 + i / 8) * cw + mbX / 2 + i % 8) & 0xff, 8); i += 1 }
        i = 0
        while (i < 64) { w.u(crP((mbY / 2 + i / 8) * cw + mbX / 2 + i % 8) & 0xff, 8); i += 1 }
        mb += 1
      }
      w.trailingBits()
      w.bytes
    }
    (nal(3, 7, sps) +: nal(3, 8, pps) +: slices.map(nal(3, 5, _))).reduce(_ ++ _)
  }
}
