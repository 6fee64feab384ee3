package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Hostile-input fuzz over every hand-rolled codec: random blobs and
  * bit-flipped valid streams must decode to None (or a valid Decoded) —
  * never throw, never hang, never allocate toward the caps. The decode
  * entry points promise `catch Exception → None`; at 100 TB the media
  * column WILL contain garbage, and one uncaught throw inside a
  * mapPartitions batch kills the whole task. Seeded, so failures
  * reproduce. */
class CodecFuzzSpec extends AnyFunSuite {

  private def exercise(b: Array[Byte]): Unit = {
    Jpeg.decode(b)
    Png.decode(b)
    Flac.decode(b)
    Mp3.decode(b)
    Mp2.decode(b)
    Mp3L3.decode(b)
    H264.decodeIFrame(b)
    Mp4.parseMeta(b)
    Mp4.sampleTable(b, 0)
    Mp4.videoSamples(b)
    Mp4.audioSamples(b)
    Mp4.syncSamples(b, 0)
    Mp4.sampleTimes(b, 0)
    MpegAudio.splitFrames(b)
    Multimodal.decodeAudio(b) // incl. the MP4-carriage dispatch branch
    val f = Multimodal.features(b)
    assert(f.length === Multimodal.FeatureLen)
  }

  test("pure random blobs: decoders return, features stay total") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val b = Array.fill(rnd.nextInt(600) + 1)(rnd.nextInt(256).toByte)
      exercise(b)
    }
    // magic-byte prefixes grafted onto noise: forces each parser past its
    // cheap signature check into real header parsing
    val magics = Seq(
      Array[Byte](0xff.toByte, 0xd8.toByte), // JPEG SOI
      Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a), // PNG signature
      "fLaC".getBytes("US-ASCII"),
      Array[Byte](0xff.toByte, 0xfe.toByte), // MP3 Layer I sync
      Array[Byte](0xff.toByte, 0xfc.toByte), // MP2 Layer II sync
      Array[Byte](0xff.toByte, 0xfa.toByte), // MP3 Layer III sync
      Array[Byte](0, 0, 0, 1, 0x67), // H.264 Annex B + SPS header
      Array[Byte](0, 0, 0, 0x14, 'f', 't', 'y', 'p')) // MP4 ftyp
    for (m <- magics; _ <- 1 to 100) {
      val tail = Array.fill(rnd.nextInt(300) + 8)(rnd.nextInt(256).toByte)
      exercise(m ++ tail)
    }
  }

  test("bit-flipped valid streams: corruption never escapes as a throw") {
    val rnd = new scala.util.Random(7)
    val sine = Array.tabulate(900)(t => (8000 * math.sin(t / 20.0)).toInt)
    val seeds = Seq(
      Mp3.encode(32000, Array(sine)),
      Mp2.encode(32000, Array(sine)),
      Mp3L3.encode(32000, Array(sine)),
      Flac.encode(8000, Array(sine)),
      Jpeg.encodeGray(16, 16, Array.tabulate(256)(i => (i % 256) / 255.0)),
      Png.encodeGray(16, 16, Array.tabulate(256)(i => (i % 256) / 255.0)),
      H264.encodeIFrame(32, 16, Array.fill(512)(7.toByte),
        Array.fill(128)(60.toByte), Array.fill(128)(200.toByte)),
      Mp4.writeWithSamples(1000, 80, Seq(
        (Mp4.TrackSpec("vide", "mjpa", 16, 16, 1000, 80, 2),
          Seq(Jpeg.encodeGray(16, 16, Array.fill(256)(0.5)),
            Jpeg.encodeGray(16, 16, Array.fill(256)(0.25)))))), {
        // audio-in-MP4 with stss + ctts: corruption must not escape the
        // carriage walk (sample tables, timing boxes, frame re-split)
        val fs = MpegAudio.splitFrames(Mp2.encode(32000, Array(sine)))
          .getOrElse(Seq.empty)
        Mp4.writeWithSamples(32000, fs.length * 1152L, Seq(
          (Mp4.TrackSpec("soun", "mp4a", 0, 0, 32000,
            fs.length * 1152L, fs.length.toLong), fs)),
          syncs = Map(0 -> (1L to fs.length.toLong by 2).toSeq),
          cttsRuns = Map(0 -> Seq((fs.length.toLong, 1152L))))
      })
    for (seed <- seeds; _ <- 1 to 150) {
      val b = seed.clone()
      val flips = 1 + rnd.nextInt(4)
      for (_ <- 0 until flips)
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      exercise(b)
    }
    // truncations at every kind of boundary
    for (seed <- seeds; cut <- Seq(1, 3, 7, seed.length / 3, seed.length - 1))
      exercise(seed.take(cut))
  }
}
