package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** MPEG-1 audio carriage in MP4 (the round-10 surface, gated as q152):
  * the header-arithmetic frame grid ([[MpegAudio]]), the stss/ctts
  * timing sidecars round-tripping through [[Mp4.writeWithSamples]],
  * the `soun` sample walk ([[Mp4.audioSamples]]) feeding the production
  * audio dispatch, the keyframe-aware video sampler, and the
  * untrusted-input hardening (self-referential sample tables must not
  * recurse; cumulative stts/ctts expansion is allocation-bounded). */
class MpegAudioSpec extends AnyFunSuite {

  private def tone(n: Int, freq: Int, rate: Int): Array[Int] =
    Array.tabulate(n)(t =>
      (0.4 * 32768.0 * math.sin(2 * math.Pi * freq * t / rate)).toInt)

  private def be32(v: Long) =
    java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array()
  private def bx(t: String, p: Array[Byte]*) = {
    val payload = Array.concat(p: _*)
    be32(8L + payload.length) ++ t.getBytes("US-ASCII") ++ payload
  }

  test("frame grid tiles Layer I, II and III elementary streams exactly") {
    val rate = 32000
    for ((enc, spf) <- Seq[((Int, Array[Array[Int]]) => Array[Byte], Int)](
        ((r, ch) => Mp3.encode(r, ch), 384),
        ((r, ch) => Mp2.encode(r, ch), 1152),
        ((r, ch) => Mp3L3.encode(r, ch), 1152))) {
      val stream = enc(rate, Array(tone(3000, 440, rate)))
      val frames = MpegAudio.splitFrames(stream).get
      assert(frames.nonEmpty)
      // the grid tiles the stream EXACTLY, and each frame's length is
      // what its own header arithmetic says
      assert(frames.toArray.flatten.sameElements(stream))
      var p = 0
      for (f <- frames) {
        assert(MpegAudio.frameLength(stream, p) === f.length)
        p += f.length
      }
      assert(p === stream.length)
      assert(spf > 0) // silence unused warning; spf documents the layout
    }
  }

  test("malformed streams are None, never partial frames") {
    val stream = Mp2.encode(32000, Array(tone(2400, 300, 32000)))
    // corrupt tail: trailing garbage that is not a frame start
    assert(MpegAudio.splitFrames(stream :+ 0x00.toByte).isEmpty)
    // truncated final frame
    assert(MpegAudio.splitFrames(stream.dropRight(1)).isEmpty)
    assert(MpegAudio.splitFrames(Array.emptyByteArray).isEmpty)
    assert(MpegAudio.splitFrames("not audio".getBytes).isEmpty)
    // free-format (bitrate index 0) and reserved rate are rejected
    assert(MpegAudio.frameLength(Array(0xff, 0xfd, 0x00, 0x00)
      .map(_.toByte), 0) === -1)
    assert(MpegAudio.frameLength(Array(0xff, 0xfd, 0x4c, 0x00)
      .map(_.toByte), 0) === -1)
  }

  test("stss + ctts round-trip through writeWithSamples") {
    val frames = (0 until 5).map(f => Array.tabulate(9 + f)(i =>
      ((i * 17 + f) % 251).toByte))
    val sync = Seq(1L, 4L)
    val bytes = Mp4.writeWithSamples(1000, 200, Seq(
      (Mp4.TrackSpec("vide", "mjpa", 16, 16, 1000, 200, 5), frames)),
      syncs = Map(0 -> sync),
      cttsRuns = Map(0 -> Seq((2L, 40L), (3L, 0L))))
    assert(Mp4.syncSamples(bytes, 0) === Some(sync))
    // stts: one run of 5 samples, delta = 200/5 = 40; ctts offsets
    // 40,40,0,0,0 → pts = dts + offset
    val want = Seq((0L, 40L), (40L, 80L), (80L, 80L), (120L, 120L),
      (160L, 160L))
    assert(Mp4.sampleTimes(bytes, 0) === Some(want))
    // a track WITHOUT an stss box reports None (= every sample sync)
    val noStss = Mp4.writeWithSamples(1000, 200, Seq(
      (Mp4.TrackSpec("vide", "mjpa", 16, 16, 1000, 200, 5), frames)))
    assert(Mp4.syncSamples(noStss, 0).isEmpty)
    // and without ctts, pts ≡ dts
    assert(Mp4.sampleTimes(noStss, 0) ===
      Some(Seq(0L, 40L, 80L, 120L, 160L).map(t => (t, t))))
    // out-of-range track / non-MP4 degrade to None
    assert(Mp4.syncSamples(bytes, 1).isEmpty)
    assert(Mp4.sampleTimes("junk".getBytes, 0).isEmpty)
  }

  test("multi-run stts walks the full delta grid") {
    // hand-built stbl: 2 runs (2×Δ10 then 3×Δ20) — the writer only
    // emits single-run tables, so the reader's run walk needs its own
    // fixture
    val stts = bx("stts", be32(0), be32(2),
      be32(2), be32(10), be32(3), be32(20))
    val file = bx("ftyp", "isom".getBytes, be32(0)) ++
      bx("moov", bx("trak", bx("mdia", bx("minf", bx("stbl", stts)))))
    assert(Mp4.sampleTimes(file, 0) ===
      Some(Seq(0L, 10L, 20L, 40L, 60L).map(t => (t, t))))
  }

  test("cumulative stts/ctts expansion is allocation-bounded") {
    // each run individually passes the per-run bound (cnt <= file
    // length) but the runs TOGETHER claim ~40× the file in samples —
    // the cumulative guard must refuse before buffering them
    val nRuns = 40
    val sttsRuns = Array.concat((0 until nRuns).map(_ =>
      be32(300L) ++ be32(1L)): _*)
    val stts = bx("stts", be32(0), be32(nRuns.toLong), sttsRuns)
    val file = bx("ftyp", "isom".getBytes, be32(0)) ++
      bx("moov", bx("trak", bx("mdia", bx("minf", bx("stbl", stts)))))
    // each run alone passes the per-run bound (300 < file length) —
    // only the CUMULATIVE guard can reject this file
    assert(file.length > 300 && file.length < 600)
    assert(Mp4.sampleTimes(file, 0).isEmpty)
    // same discipline on ctts: a small valid stts + an exploding ctts
    val okStts = bx("stts", be32(0), be32(1), be32(2), be32(10))
    val cttsRuns = Array.concat((0 until nRuns).map(_ =>
      be32(300L) ++ be32(0L)): _*)
    val ctts = bx("ctts", be32(0), be32(nRuns.toLong), cttsRuns)
    val file2 = bx("ftyp", "isom".getBytes, be32(0)) ++
      bx("moov", bx("trak", bx("mdia", bx("minf",
        bx("stbl", okStts, ctts)))))
    assert(Mp4.sampleTimes(file2, 0).isEmpty)
  }

  test("audio-in-MP4 carriage decodes through the production dispatch") {
    val rate = 32000
    val n = 4000
    val t = tone(n, 350, rate)
    val stream = Mp2.encode(rate, Array(t))
    val frames = MpegAudio.splitFrames(stream).get
    val nf = frames.length
    assert(nf === (n + 481 + 1151) / 1152)
    val payload = Mp4.writeWithSamples(rate.toLong, nf * 1152L, Seq(
      (Mp4.TrackSpec("soun", "mp4a", 0, 0, rate.toLong, nf * 1152L,
        nf.toLong), frames)),
      syncs = Map(0 -> (1L to nf.toLong).toSeq))
    // the container walk returns each frame byte-for-byte
    val back = Mp4.audioSamples(payload).get
    assert(back.length === nf)
    for ((a, b) <- back.zip(frames)) assert(a.sameElements(b))
    // the production dispatch decodes the MP4 itself: same PCM as the
    // elementary stream (the carriage is lossless re-framing)
    val (r, mono) = Multimodal.decodeAudio(payload).get
    assert(r === rate && mono.length === nf * 1152)
    val direct = Mp2.decode(stream).get
    assert(mono.length === direct.samples(0).length)
    var i = 0
    while (i < mono.length) {
      assert(math.abs(mono(i) - direct.samples(0)(i) / 32768.0) < 1e-12)
      i += 1
    }
    // SNR vs the source tone clears q152's 30 dB gate (Layer II
    // measures >40 dB; decoder delay 481)
    var sig = 0.0; var err = 0.0
    i = 0
    while (i < n - 32) {
      val want = t(i) / 32768.0
      val got = mono(481 + i)
      sig += want * want; err += (got - want) * (got - want)
      i += 1
    }
    assert(10.0 * math.log10(sig / err) > 30.0)
  }

  test("self-referential soun sample table does not recurse") {
    // craft: a valid one-sample soun MP4, then point its single sample
    // at (offset 0, size = whole file) — the flattened 'elementary
    // stream' IS the MP4 payload itself. The dispatch must answer None
    // (no elementary decoder matches an MP4), not StackOverflowError.
    val bytes = Mp4.writeWithSamples(8000, 800, Seq(
      (Mp4.TrackSpec("soun", "mp4a", 0, 0, 8000, 800, 1),
        Seq(Array[Byte](1, 2, 3, 4)))))
    def findBox(t: String): Int = {
      val pat = t.getBytes("US-ASCII")
      (0 until bytes.length - 4).find(p => bytes(p) == pat(0) &&
        bytes(p + 1) == pat(1) && bytes(p + 2) == pat(2) &&
        bytes(p + 3) == pat(3)).get - 4
    }
    val evil = bytes.clone()
    // stsz payload: ver/flags, sample_size, count, sizes[0]
    val stsz = findBox("stsz")
    java.nio.ByteBuffer.wrap(evil, stsz + 20, 4).putInt(evil.length)
    // stco payload: ver/flags, count, offsets[0]
    val stco = findBox("stco")
    java.nio.ByteBuffer.wrap(evil, stco + 16, 4).putInt(0)
    val ss = Mp4.audioSamples(evil)
    assert(ss.exists(s => s.length == 1 && s.head.length == evil.length))
    // terminates with None — the flattened stream only reaches the
    // elementary decoders, never the container path again
    assert(Multimodal.decodeAudio(evil).isEmpty)
  }

  test("videoFrames keyframesOnly strides over sync samples") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val nf = 7
    val frames = (0 until nf).map { f =>
      // 8×8-constant mosaics: DC-only JPEG, so the decode is exact
      val px = Array.tabulate(16 * 16) { i =>
        val bx = (i % 16) / 8; val by = (i / 16) / 8
        ((bx * 7 + by * 13 + f * 17) % 256) / 255.0
      }
      (px, Jpeg.encodeGray(16, 16, px))
    }
    def mediaOf(syncs: Map[Int, Seq[Long]]) = {
      val mp4 = Mp4.writeWithSamples(1000, nf * 40L, Seq(
        (Mp4.TrackSpec("vide", "mjpa", 16, 16, 1000, nf * 40L,
          nf.toLong), frames.map(_._2))), syncs = syncs)
      Seq(Multimodal.MediaRow(5L, "video", mp4, 16, 16, 1)).toDF()
    }
    val withStss = mediaOf(Map(0 -> Seq(1L, 4L, 7L)))
    // keyframes only: stss samples 1,4,7 → frame indices 0,3,6
    val kf = Multimodal.videoFrames(withStss, keyframesOnly = true)
      .collect().map(_.frame_idx).sorted.toSeq
    assert(kf === Seq(0, 3, 6))
    // stride counts KEYFRAMES (every 2nd sync sample), and frame_idx
    // stays the original sample index
    val kf2 = Multimodal.videoFrames(withStss, stride = 2,
      keyframesOnly = true).collect().map(_.frame_idx).sorted.toSeq
    assert(kf2 === Seq(0, 6))
    // mean_lum still comes from the decoded keyframe itself
    val row = Multimodal.videoFrames(withStss, keyframesOnly = true)
      .collect().find(_.frame_idx == 3).get
    assert(math.abs(row.mean_lum - frames(3)._1.sum / 256.0) < 1e-12)
    // no stss box = all-intra: every sample is a keyframe
    val noStss = mediaOf(Map.empty)
    val all = Multimodal.videoFrames(noStss, keyframesOnly = true)
      .collect().map(_.frame_idx).sorted.toSeq
    assert(all === (0 until nf))
    // and the default path is unchanged
    assert(Multimodal.videoFrames(withStss).collect().length === nf)
  }
}
