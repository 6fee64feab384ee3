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

  test("avcC carriage round-trips: toAvcc → decodeAvccSample bit-exact") {
    val (l, cb, cr) = frame(50, 22, 3)
    val annexB = H264.encodeIFrame(50, 22, l, cb, cr)
    val (cfg, sample) = H264.toAvcc(annexB)
    assert(cfg(0) === 1 && (cfg(4) & 3) === 3)
    val d = H264.decodeAvccSample(cfg, sample).get
    assert(d.width === 50 && d.height === 22)
    assert(d.luma.sameElements(l) && d.cb.sameElements(cb) &&
      d.cr.sameElements(cr))
    // malformed: truncated sample, bad length prefix, garbage config
    assert(H264.decodeAvccSample(cfg, sample.take(sample.length - 3)).isEmpty)
    val badLen = sample.clone(); badLen(0) = 0x7f
    assert(H264.decodeAvccSample(cfg, badLen).isEmpty)
    assert(H264.decodeAvccSample("junk".getBytes, sample).isEmpty)
  }

  test("avc1-in-MP4: container + avcC + videoFrames compose end to end") {
    import org.apache.spark.sql.functions.col
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val nf = 3
    val frames = (0 until nf).map { f =>
      val (l, cb, cr) = frame(32, 16, f * 7)
      (l, H264.toAvcc(H264.encodeIFrame(32, 16, l, cb, cr)))
    }
    val mp4 = Mp4.writeWithSamples(1000, nf * 40L, Seq(
      (Mp4.TrackSpec("vide", "avc1", 32, 16, 1000, nf * 40L, nf.toLong),
        frames.map(_._2._2))),
      Map(0 -> ("avcC", frames.head._2._1)))
    assert(Mp4.parseMeta(mp4).get.videoTracks.head.codec === "avc1")
    val media = Seq(Multimodal.MediaRow(9L, "video", mp4, 32, 16, 1)).toDF()
    val out = Multimodal.videoFrames(media).collect().sortBy(_.frame_idx)
    assert(out.length === nf)
    for ((vf, f) <- out.zip(frames)) {
      assert(vf.width === 32 && vf.height === 16)
      val want = f._1.map(b => (b & 0xff) / 255.0).sum / (32 * 16)
      assert(math.abs(vf.mean_lum - want) < 1e-12)
    }
    // stride keeps every other frame
    val strided = Multimodal.videoFrames(media, stride = 2).collect()
    assert(strided.map(_.frame_idx).sorted.toSeq === Seq(0, 2))
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
