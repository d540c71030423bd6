package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class H264Spec extends AnyFunSuite {

  /** Deterministic 4:2:0 planes with long zero runs (to force
    * emulation-prevention escapes in the PCM payload) and full-range
    * values.
    */
  private def planes(w: Int, h: Int, seed: Int): (Array[Byte], Array[Byte], Array[Byte]) = {
    val y = Array.tabulate(w * h) { i =>
      if (i % 97 < 13) 0.toByte else ((i * 31 + seed * 7) % 256).toByte
    }
    val cb = Array.tabulate(w * h / 4)(i => ((i + seed) % 256).toByte)
    val cr = Array.tabulate(w * h / 4)(i => if (i % 53 < 9) 0.toByte else ((255 - i % 256)).toByte)
    (y, cb, cr)
  }

  test("synth -> decode round-trips I_PCM planes byte-for-byte (lossless by spec)") {
    val (w, h) = (48, 32)
    val fs = Seq(planes(w, h, 1), planes(w, h, 2), planes(w, h, 3))
    val stream = H264.synth(w, h, fs)
    // the stream must contain emulation escapes for this fixture to
    // actually exercise the EBSP<->RBSP layer
    assert(stream.sliding(4).exists(s => s(0) == 0 && s(1) == 0 && s(2) == 3))
    val decoded = H264.decode(stream)
    assert(decoded != null && decoded.length == 3)
    decoded.zip(fs).foreach { case (f, (y, cb, cr)) =>
      assert(f.width == w && f.height == h)
      assert(f.y.sameElements(y), "luma plane must round-trip exactly")
      assert(f.cb.sameElements(cb) && f.cr.sameElements(cr), "chroma planes must round-trip exactly")
    }
  }

  test("SPS geometry and NAL walk are exposed to the metadata layer") {
    val stream = H264.synth(64, 48, Seq(planes(64, 48, 4)))
    val units = H264.nals(stream)
    assert(units.map(_._1) == Seq(7, 8, 5)) // SPS, PPS, IDR
    val sps = H264.parseSps(units.head._2)
    assert(sps.profile == 66 && sps.width == 64 && sps.height == 48)
    assert(H264.parsePps(units(1)._2) == 0) // CAVLC
  }

  test("mime-driven dispatch: video/h264 decodes pixels, corrupt and non-H264 bytes are null") {
    val (w, h) = (16, 16)
    val p = planes(w, h, 5)
    val stream = H264.synth(w, h, Seq(p))
    val feat = MultimodalOps.codecFor("video/h264", dim = 6)(stream)
    val meanY = p._1.map(_ & 0xff).sum.toFloat / (w * h)
    assert(feat != null)
    assert(feat(0) == w.toFloat && feat(1) == h.toFloat && feat(2) == 1.0f)
    assert(math.abs(feat(3) - meanY) < 1e-3)
    // not an Annex-B stream at all
    assert(MultimodalOps.codecFor("video/h264")(Array.fill[Byte](64)(7)) == null)
    // a start code leading into garbage must fail closed, not crash
    assert(MultimodalOps.codecFor("video/h264")(
      Array[Byte](0, 0, 0, 1, 0x65, 0x7f, 0x33, 0x12, 9, 9, 9, 9)) == null)
    // generic video mime still routes to the ISO-BMFF parser
    assert(MultimodalOps.codecFor("video/mp4")(stream) == null)
  }

  test("predicted-macroblock streams fail closed (native-decoder territory)") {
    // take a valid stream and flip the first mb_type bits in the IDR
    // slice payload: the decoder must return null, never wrong pixels
    val stream = H264.synth(16, 16, Seq(planes(16, 16, 6)))
    val idrAt = {
      var at = -1
      for (i <- 0 until stream.length - 4 if at < 0)
        if (stream(i) == 0 && stream(i + 1) == 0 && stream(i + 2) == 1 &&
          (stream(i + 3) & 0x1f) == 5) at = i + 4
      at
    }
    assert(idrAt > 0)
    val corrupt = stream.clone()
    // slice header for this subset is ~3 bytes; stomp the next bytes so
    // mb_type parses as something other than 25
    corrupt(idrAt + 3) = -1
    corrupt(idrAt + 4) = -1
    assert(H264.decode(corrupt) == null)
  }
}
