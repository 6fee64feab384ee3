package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The hand-rolled FLAC codec. FLAC is lossless, so every round-trip
  * asserts bit-equality of every sample; inputs are engineered so the
  * encoder's cost search picks each subframe type (CONSTANT on flat
  * blocks, FIXED on polynomial ramps, LPC on sinusoids, VERBATIM on
  * white noise), and multi-block streams exercise frame numbering and
  * per-frame CRCs. No independent FLAC implementation exists in this
  * container (javax.sound is WAV/AIFF-only), so there is no second-codec
  * cross-check — these certificates are round-trip + structural. */
class FlacSpec extends AnyFunSuite {

  private def roundTrip(chs: Array[Array[Int]], blockSize: Int = 4096): Flac.Decoded = {
    val bytes = Flac.encode(8000, chs, blockSize)
    val dec = Flac.decode(bytes).get
    assert(dec.sampleRate === 8000)
    assert(dec.channels === chs.length)
    assert(dec.bitsPerSample === 16)
    chs.indices.foreach { c =>
      assert(dec.samples(c).toSeq === chs(c).toSeq, s"channel $c differs")
    }
    dec
  }

  test("constant / ramp / sine / noise blocks all round-trip exactly") {
    val n = 3000
    val constant = Array.fill(n)(-1234)
    val ramp = Array.tabulate(n)(t => (t * 7 - 9000) % 32000)
    val sine = Array.tabulate(n)(t =>
      (12000 * math.sin(2 * math.Pi * t / 50.0)).toInt)
    val rnd = new scala.util.Random(3)
    val noise = Array.fill(n)(rnd.nextInt(65536) - 32768)
    Seq(constant, ramp, sine, noise).foreach(s => roundTrip(Array(s)))
    // compression sanity: predictable signals beat the raw 16 bits/sample,
    // which proves a predictor path (FIXED or LPC) was actually taken
    assert(Flac.encode(8000, Array(sine)).length < n * 2)
    assert(Flac.encode(8000, Array(constant)).length < 200)
  }

  test("multi-block streams and non-multiple tails round-trip exactly") {
    val rnd = new scala.util.Random(11)
    val s = Array.tabulate(10000)(t =>
      (8000 * math.sin(t / 30.0)).toInt + rnd.nextInt(200) - 100)
    roundTrip(Array(s), blockSize = 1024) // 10 frames, 784-sample tail
  }

  test("stereo: correlated channels pick left/side, both modes exact") {
    val n = 4096
    val left = Array.tabulate(n)(t => (9000 * math.sin(t / 40.0)).toInt)
    val rnd = new scala.util.Random(5)
    val corr = Array.tabulate(n)(t => left(t) + rnd.nextInt(64) - 32)
    val sizeCorr = Flac.encode(8000, Array(left, corr)).length
    roundTrip(Array(left, corr))
    // independent white channels: left/side buys nothing, still exact
    val indep = Array.fill(n)(rnd.nextInt(65536) - 32768)
    val sizeIndep = Flac.encode(8000, Array(left, indep)).length
    roundTrip(Array(left, indep))
    assert(sizeCorr < sizeIndep)
  }

  test("extreme sample values and short streams round-trip") {
    roundTrip(Array(Array(32767, -32768, 32767, -32768, 0)))
    roundTrip(Array(Array(42)))
    val dec = Flac.decode(Flac.encode(8000, Array(Array.emptyIntArray))).get
    assert(dec.samples(0).isEmpty)
  }

  test("structural: magic, STREAMINFO fields, frame sync") {
    val bytes = Flac.encode(8000, Array(Array.tabulate(500)(_ * 3)))
    assert(Flac.isFlac(bytes))
    // STREAMINFO: sample rate 8000 at bit offset 8+64 of the block body
    val dec = Flac.decode(bytes).get
    assert(dec.sampleRate === 8000 && dec.channels === 1)
    // first frame starts right after the 4+4+34-byte metadata with sync
    assert((bytes(42) & 0xff) === 0xff && ((bytes(43) & 0xff) >> 2) === 0x3e)
  }

  test("graceful None: corrupt CRC, truncation, non-FLAC bytes") {
    val good = Flac.encode(8000, Array(Array.tabulate(600)(t => t * 11 % 5000)))
    assert(Flac.decode("not flac at all".getBytes).isEmpty)
    assert(Flac.decode(good.take(60)).isEmpty)
    val bad = good.clone()
    bad(50) = (bad(50) ^ 0x55).toByte // body corruption -> CRC mismatch
    assert(Flac.decode(bad).isEmpty)
  }

  test("unknown-length stream (STREAMINFO total=0) decodes until data ends") {
    // total_samples=0 is spec-legal "unknown length"; the decoder must
    // consume frames until the sync stops matching, not decode 0 samples.
    // total sits in the low nibble of STREAMINFO body byte 13 + bytes
    // 14-17 (absolute 21-25 after the 4-byte magic + 4-byte block header)
    val s = Array.tabulate(2500)(t => (9000 * math.sin(t / 35.0)).toInt)
    val unk = Flac.encode(8000, Array(s), blockSize = 1024).clone()
    unk(21) = (unk(21) & 0xf0).toByte
    unk(22) = 0; unk(23) = 0; unk(24) = 0; unk(25) = 0
    val dec = Flac.decode(unk).get
    assert(dec.samples(0).toSeq === s.toSeq)
  }

  test("allocation cap: absurd declared total rejected before buffering") {
    // a 36-bit declared total (all ones) from a tiny payload must return
    // None, mirroring the Png/Jpeg dimension caps — never allocate toward
    // tens of GB and let the OutOfMemoryError escape Exception guards
    val hostile = Flac.encode(8000, Array(Array.tabulate(100)(_ * 3))).clone()
    hostile(21) = (hostile(21) | 0x0f).toByte
    hostile(22) = 0xff.toByte; hostile(23) = 0xff.toByte
    hostile(24) = 0xff.toByte; hostile(25) = 0xff.toByte
    assert(Flac.decode(hostile).isEmpty)
  }

  test("multimodal dispatch routes FLAC to the real decoder") {
    val s = Array.tabulate(800)(t => (10000 * math.sin(t / 25.0)).toInt)
    val payload = Flac.encode(8000, Array(s))
    val f = Multimodal.features(payload)
    assert(f(0) === 800.0 / 8000) // duration from the real decode
    val wantRms = math.sqrt(s.map(v => (v / 32768.0) * (v / 32768.0)).sum / 800)
    assert(math.abs(f(1) - wantRms) < 1e-12)
  }
}
