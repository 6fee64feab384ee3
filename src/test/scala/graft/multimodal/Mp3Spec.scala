package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The hand-rolled MPEG-1 Layer I codec. Layer I is LOSSY, so round-trips
  * assert SNR floors (filterbank bound ~51 dB from Mp3Windows plus
  * quantization noise), not bit equality; the structure/headers and
  * graceful-failure paths are asserted exactly. The codec's 481-sample
  * filterbank delay is compensated before SNR measurement. */
class Mp3Spec extends AnyFunSuite {

  private val Delay = 481

  private def snrDb(decoded: Array[Int], reference: Array[Double]): Double = {
    // compare decoded[Delay + i] to reference[i] over the common span
    val n = math.min(decoded.length - Delay, reference.length) - 32
    var sig = 0.0; var err = 0.0
    var i = 0
    while (i < n) {
      val want = reference(i)
      val got = decoded(Delay + i) / 32768.0
      sig += want * want; err += (got - want) * (got - want)
      i += 1
    }
    10.0 * math.log10(sig / math.max(err, 1e-300))
  }

  private def tone(n: Int, freq: Double, rate: Int, amp: Double = 0.4): Array[Int] =
    Array.tabulate(n)(t => (amp * 32768.0 * math.sin(2 * math.Pi * freq * t / rate)).toInt)

  test("mono tone round-trips above the 40 dB gate at every sample rate") {
    for (rate <- Seq(32000, 44100, 48000)) {
      val s = tone(6000, 440.0, rate)
      val bytes = Mp3.encode(rate, Array(s))
      val d = Mp3.decode(bytes).get
      assert(d.sampleRate === rate && d.channels === 1)
      assert(d.samples(0).length % 384 === 0)
      assert(d.samples(0).length >= s.length)
      val snr = snrDb(d.samples(0), s.map(_ / 32768.0))
      assert(snr > 40.0, s"rate $rate: SNR $snr dB")
    }
  }

  test("wideband noise survives at the filterbank+quantizer floor") {
    // all 32 subbands live: 32 kHz gives Layer I its largest frames
    // (5376 bits at 448 kbps), which fits nb=10 across the full bank
    val rnd = new scala.util.Random(3)
    val s = Array.fill(8 * 384)((rnd.nextInt(20000) - 10000))
    val d = Mp3.decode(Mp3.encode(32000, Array(s), nb = 10)).get
    val snr = snrDb(d.samples(0), s.map(_ / 32768.0))
    assert(snr > 30.0, s"noise SNR $snr dB")
  }

  test("stereo: independent channels decode to their own signals") {
    val left = tone(4000, 330.0, 32000)
    val right = tone(4000, 710.0, 32000)
    val d = Mp3.decode(Mp3.encode(32000, Array(left, right), nb = 8)).get
    assert(d.channels === 2)
    assert(snrDb(d.samples(0), left.map(_ / 32768.0)) > 38.0)
    assert(snrDb(d.samples(1), right.map(_ / 32768.0)) > 38.0)
    // cross-check: channels are NOT swapped/mixed
    assert(snrDb(d.samples(0), right.map(_ / 32768.0)) < 10.0)
  }

  test("silent subbands get allocation 0 and frames stay compact") {
    val s = tone(12 * 384, 440.0, 48000)
    val narrow = Mp3.encode(48000, Array(s))
    val rnd = new scala.util.Random(9)
    val wide = Mp3.encode(48000,
      Array(Array.fill(12 * 384)(rnd.nextInt(20000) - 10000)))
    // a tone lights 1-2 subbands; noise lights all 32 — the allocation
    // machinery must make the tone stream choose a smaller bitrate
    assert(narrow.length < wide.length)
  }

  test("structural: header fields as written, frame walk by slot count") {
    val bytes = Mp3.encode(44100, Array(tone(800, 500.0, 44100)))
    assert(Mp3.isMp3(bytes))
    assert((bytes(0) & 0xff) === 0xff && (bytes(1) & 0xf0) === 0xf0)
    assert(((bytes(1) >> 1) & 3) === 3) // Layer I
    assert(((bytes(2) >> 2) & 3) === 0) // 44.1 kHz
    assert(((bytes(3) >> 6) & 3) === 3) // single channel
  }

  test("graceful None: truncation, corrupt header, joint stereo, non-MP3") {
    val good = Mp3.encode(48000, Array(tone(2000, 440.0, 48000)))
    assert(Mp3.decode("definitely not audio".getBytes).isEmpty)
    assert(Mp3.decode(good.take(40)).isEmpty)
    val joint = good.clone()
    joint(3) = ((joint(3) & 0x3f) | 0x40).toByte // mode = 01 joint stereo
    assert(Mp3.decode(joint).isEmpty)
    val badLayer = good.clone()
    badLayer(1) = (badLayer(1) & ~0x06 | 0x02).toByte // layer III bits
    assert(Mp3.decode(badLayer).isEmpty)
  }

  test("trailing garbage after the last frame is malformed, not ignored") {
    // the frame walk used to exit silently at the first non-sync byte,
    // reporting a garbage-tailed stream as successfully-decoded partial
    // audio — the contract is None on ANYTHING malformed
    val good = Mp3.encode(48000, Array(tone(2000, 440.0, 48000)))
    assert(Mp3.decode(good).isDefined)
    assert(Mp3.decode(good ++ "not a frame".getBytes).isEmpty)
    assert(Mp3.decode(good ++ Array[Byte](0)).isEmpty)
  }

  test("over-allocated frame is rejected, not decoded from neighbor bytes") {
    // force the first 16 allocation nibbles to 14 (nb=15): the demanded
    // sample bits blow past the frame's slot, and without the payload
    // bound the reader would silently consume the next frame's bytes
    val good = Mp3.encode(48000, Array(tone(2000, 440.0, 48000)))
    val bad = good.clone()
    for (i <- 4 until 12) bad(i) = 0xee.toByte
    assert(Mp3.decode(bad).isEmpty)
  }

  test("multimodal dispatch routes Layer I payloads to the real decoder") {
    val rate = 32000
    val n = 5 * 384
    val s = tone(n, 440.0, rate)
    val payload = Mp3.encode(rate, Array(s))
    val f = Multimodal.features(payload)
    // duration reflects the delay-padded frame grid, straight from decode
    val frames = math.ceil((n + 481) / 384.0)
    assert(f(0) === frames * 384 / rate)
    // RMS of the decoded tone = amp/sqrt(2) diluted by the silent
    // delay/padding span, within the lossy bound
    val expected = 0.4 / math.sqrt(2.0) * math.sqrt(n / (frames * 384))
    assert(math.abs(f(1) - expected) < 0.01, s"rms ${f(1)} vs $expected")
  }
}
