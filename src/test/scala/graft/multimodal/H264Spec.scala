package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The H.264 I_PCM subset codec. I_PCM is LOSSLESS, so round-trips
  * assert BIT-EXACT pixel recovery; grammar and graceful-failure paths
  * are asserted exactly. */
class H264Spec extends AnyFunSuite {

  private def plane(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] =
    Array.tabulate(w * h)(i => f(i % w, i / w).toByte)

  private def frame(w: Int, h: Int, seed: Int) = (
    plane(w, h, (x, y) => (3 * x + 5 * y + seed) % 256),
    plane(w / 2, h / 2, (x, y) => (7 * x + y + seed) % 256),
    plane(w / 2, h / 2, (x, y) => (x + 11 * y + 2 * seed) % 256))

  test("mb-aligned frame round-trips bit-exactly") {
    val (l, cb, cr) = frame(64, 48, 1)
    val bytes = H264.encodeIFrame(64, 48, l, cb, cr)
    assert(H264.isAnnexB(bytes))
    val d = H264.decodeIFrame(bytes).get
    assert(d.width === 64 && d.height === 48)
    assert(d.luma.sameElements(l))
    assert(d.cb.sameElements(cb))
    assert(d.cr.sameElements(cr))
  }

  test("non-multiple-of-16 sizes round-trip through frame cropping") {
    for ((w, h) <- Seq((50, 38), (34, 18), (16, 20), (2, 2))) {
      val (l, cb, cr) = frame(w, h, w + h)
      val d = H264.decodeIFrame(H264.encodeIFrame(w, h, l, cb, cr)).get
      assert(d.width === w && d.height === h, s"$w x $h")
      assert(d.luma.sameElements(l), s"$w x $h luma")
      assert(d.cb.sameElements(cb) && d.cr.sameElements(cr), s"$w x $h chroma")
    }
  }

  test("emulation-prevention escaping survives zero runs in samples") {
    // all-zero and 00 00 01-prone patterns must not fake start codes
    val w = 32; val h = 16
    val l = new Array[Byte](w * h) // zeros: worst case for escaping
    val cb = Array.fill(w * h / 4)(0.toByte)
    val cr = Array.fill(w * h / 4)(1.toByte)
    val d = H264.decodeIFrame(H264.encodeIFrame(w, h, l, cb, cr)).get
    assert(d.luma.sameElements(l) && d.cb.sameElements(cb) &&
      d.cr.sameElements(cr))
  }

  test("decode rejects malformed and out-of-subset streams") {
    val (l, cb, cr) = frame(32, 32, 5)
    val good = H264.encodeIFrame(32, 32, l, cb, cr)
    assert(H264.decodeIFrame(good).isDefined)
    // truncation mid-slice
    assert(H264.decodeIFrame(good.take(good.length / 2)).isEmpty)
    // no start code
    assert(H264.decodeIFrame("not a NAL stream at all".getBytes).isEmpty)
    // flip the PPS entropy_coding_mode bit → CABAC → documented None.
    // PPS rbsp: ue(0) ue(0) = "1 1", entropy flag is bit 2 of the first
    // payload byte after the 5-byte start+header
    val ppsOff = good.indexOfSlice(Seq[Byte](0, 0, 0, 1, 0x68)) + 5
    val cabac = good.clone()
    cabac(ppsOff) = (cabac(ppsOff) | 0x20).toByte
    assert(H264.decodeIFrame(cabac).isEmpty)
  }

  test("multimodal image dispatch routes the I_PCM luma plane") {
    val w = 48; val h = 32
    val l = plane(w, h, (x, y) => (x * 255 / (w - 1)))
    val cb = Array.fill(w * h / 4)(128.toByte)
    val cr = Array.fill(w * h / 4)(128.toByte)
    val bytes = H264.encodeIFrame(w, h, l, cb, cr)
    val f = Multimodal.features(bytes)
    // a left-to-right luminance ramp spreads across all 16 histogram
    // bins — every bin must be populated and sum to 1
    assert(math.abs(f.sum - 1.0) < 1e-9)
    assert(f.forall(_ > 0.0), f.toSeq.toString)
  }

  test("mp4 walker + h264 payload compose (container routes, codec decodes)") {
    val (l, cb, cr) = frame(32, 16, 9)
    val es = H264.encodeIFrame(32, 16, l, cb, cr)
    val mp4 = Mp4.write(1000, 40, Seq(
      Mp4.TrackSpec("vide", "avc1", 32, 16, 1000, 40, 1)), es)
    val meta = Mp4.parseMeta(mp4).get
    assert(meta.videoTracks.head.codec === "avc1")
    // the mdat payload IS the Annex B elementary stream
    val mdatIdx = {
      // find the mdat box: scan top-level boxes
      var p = 0; var found = -1
      while (found < 0 && p + 8 <= mp4.length) {
        val size = ((mp4(p) & 0xff) << 24) | ((mp4(p + 1) & 0xff) << 16) |
          ((mp4(p + 2) & 0xff) << 8) | (mp4(p + 3) & 0xff)
        val typ = new String(mp4, p + 4, 4, "US-ASCII")
        if (typ == "mdat") found = p + 8 else p += size
      }
      found
    }
    val payload = mp4.slice(mdatIdx, mdatIdx + es.length)
    val d = H264.decodeIFrame(payload).get
    assert(d.luma.sameElements(l))
  }
}
