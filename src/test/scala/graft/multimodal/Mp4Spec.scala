package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** ISO-BMFF metadata walker: writer→parser round-trips are exact (the
  * container is lossless metadata, unlike the lossy codecs), the three
  * box-size encodings (32-bit, 64-bit largesize, 0 = to-EOF) all walk,
  * and malformed input degrades to None. */
class Mp4Spec extends AnyFunSuite {

  private def sample = Mp4.write(1000, 2500, Seq(
    Mp4.TrackSpec("vide", "avc1", 640, 360, 1000, 2500, 7),
    Mp4.TrackSpec("soun", "mp4a", 0, 0, 8000, 20000, 11)),
    Array.fill(42)(0x5a.toByte))

  test("written file round-trips every metadata field") {
    val m = Mp4.parseMeta(sample).get
    assert(m.brand === "isom")
    assert(m.timescale === 1000L && m.duration === 2500L)
    assert(m.durationMs === 2500L)
    assert(m.mdatBytes === 42L)
    assert(m.tracks.length === 2)
    val v = m.videoTracks.head
    assert(v.handler === "vide" && v.codec === "avc1")
    assert(v.width === 640 && v.height === 360)
    assert(v.timescale === 1000L && v.duration === 2500L)
    assert(v.sampleCount === 7L)
    val a = m.audioTracks.head
    assert(a.codec === "mp4a" && a.width === 0 && a.height === 0)
    assert(a.timescale === 8000L && a.duration === 20000L)
    assert(a.sampleCount === 11L)
  }

  test("64-bit largesize and size-0 (to-EOF) box forms both walk") {
    val bytes = sample
    // the mdat box is last: size32 at its header start
    def mdatStart(b: Array[Byte]): Int = {
      var p = 0
      while (p < b.length) {
        val size = java.nio.ByteBuffer.wrap(b, p, 4).getInt
        val typ = new String(b, p + 4, 4, "US-ASCII")
        if (typ == "mdat") return p
        p += size
      }
      fail("no mdat")
    }
    val p = mdatStart(bytes)
    val payload = bytes.drop(p + 8)
    // largesize form: size=1, fourcc, 64-bit length
    val big = bytes.take(p) ++
      java.nio.ByteBuffer.allocate(16).putInt(1)
        .put("mdat".getBytes("US-ASCII")).putLong(16L + payload.length)
        .array() ++ payload
    assert(Mp4.parseMeta(big).get.mdatBytes === 42L)
    // to-EOF form: size=0
    val eof = bytes.clone()
    java.nio.ByteBuffer.wrap(eof, p, 4).putInt(0)
    assert(Mp4.parseMeta(eof).get.mdatBytes === 42L)
  }

  test("version-1 movie header (64-bit times) parses") {
    // hand-build: ftyp + moov(mvhd v1) — no tracks, metadata only
    def be32(v: Long) = java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array()
    def be64(v: Long) = java.nio.ByteBuffer.allocate(8).putLong(v).array()
    def bx(t: String, p: Array[Byte]) =
      be32(8L + p.length) ++ t.getBytes("US-ASCII") ++ p
    val mvhdV1 = bx("mvhd",
      Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
        be32(90000) ++ be64(123456789L) ++ Array.fill(80)(0.toByte))
    val file = bx("ftyp", "isom".getBytes ++ be32(0)) ++ bx("moov", mvhdV1)
    val m = Mp4.parseMeta(file).get
    assert(m.timescale === 90000L && m.duration === 123456789L)
    assert(m.tracks.isEmpty && m.mdatBytes === 0L)
  }

  test("graceful None: garbage, truncation, overrunning box") {
    assert(Mp4.parseMeta("not a movie at all".getBytes).isEmpty)
    assert(Mp4.parseMeta(sample.take(30)).isEmpty)
    val overrun = sample.clone()
    // corrupt moov's size to overrun the file
    var p = 0
    while (new String(overrun, p + 4, 4, "US-ASCII") != "moov")
      p += java.nio.ByteBuffer.wrap(overrun, p, 4).getInt
    java.nio.ByteBuffer.wrap(overrun, p, 4).putInt(overrun.length * 2)
    assert(Mp4.parseMeta(overrun).isEmpty)
  }

  test("magic-byte dispatch stays disjoint from the other codecs") {
    assert(Mp4.isMp4(sample))
    assert(!Mp4.isMp4(Array[Byte](0x50, 0x35, 0x0a)))
    assert(!Mp2.isMp2(sample) && !Mp3.isMp3(sample))
  }

  test("sample tables round-trip: writeWithSamples → sampleTable → " +
      "exact payload recovery") {
    val frames = (0 until 4).map(f =>
      Array.tabulate(10 + 7 * f)(i => ((i * 31 + f) % 251).toByte))
    val audio = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5))
    val bytes = Mp4.writeWithSamples(1000, 160, Seq(
      (Mp4.TrackSpec("vide", "mjpa", 16, 16, 1000, 160, 4), frames),
      (Mp4.TrackSpec("soun", "mp4a", 0, 0, 8000, 1280, 2), audio)))
    val meta = Mp4.parseMeta(bytes).get
    assert(meta.videoTracks.head.sampleCount === 4)
    assert(meta.audioTracks.head.sampleCount === 2)
    val vt = Mp4.sampleTable(bytes, 0).get
    assert(vt.map(_._2) === frames.map(_.length))
    for (((off, len), f) <- vt.zip(frames))
      assert(bytes.slice(off.toInt, off.toInt + len).sameElements(f))
    val at = Mp4.sampleTable(bytes, 1).get
    for (((off, len), a) <- at.zip(audio))
      assert(bytes.slice(off.toInt, off.toInt + len).sameElements(a))
    // videoSamples returns the first video track's payloads verbatim
    val vs = Mp4.videoSamples(bytes).get
    assert(vs.length === 4)
    for ((s, f) <- vs.zip(frames)) assert(s.sameElements(f))
    // out-of-range track index and sample-table-free input are None
    assert(Mp4.sampleTable(bytes, 2).isEmpty)
    assert(Mp4.sampleTable("nope".getBytes, 0).isEmpty)
  }

  test("MJPEG end to end: JPEG samples decode back exactly") {
    val frames = (0 until 3).map { f =>
      val px = Array.tabulate(16 * 16) { i =>
        val bx = (i % 16) / 8; val by = (i / 16) / 8
        ((bx * 7 + by * 13 + f * 17) % 256).toDouble / 255.0
      }
      (px, Jpeg.encodeGray(16, 16, px))
    }
    val bytes = Mp4.writeWithSamples(1000, 120, Seq(
      (Mp4.TrackSpec("vide", "mjpa", 16, 16, 1000, 120, 3),
        frames.map(_._2))))
    val vs = Mp4.videoSamples(bytes).get
    assert(vs.length === 3)
    for ((s, (px, _)) <- vs.zip(frames)) {
      val d = Jpeg.decode(s).get
      assert(d.width === 16 && d.height === 16)
      assert(d.luminance.sameElements(px)) // DC-only mosaics are exact
    }
  }
}
