package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The hand-rolled MPEG-1 Layer II codec. Lossy like Layer I, so
  * round-trips assert SNR floors; structure, grouped-code packing, scfsi
  * compression, the derived Table 3-B.4 constants, and graceful-failure
  * paths are asserted exactly. Same 481-sample filterbank delay. */
class Mp2Spec extends AnyFunSuite {

  private val Delay = 481

  private def snrDb(decoded: Array[Int], reference: Array[Double]): Double = {
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

  test("derived C/D constants reproduce Table 3-B.4 printed rows") {
    // published anchor rows (levels → C, D), e.g. ISO 11172-3 Table 3-B.4
    val anchors = Seq(
      (Mp2.QClass(3, true, 5), 1.33333333333, 0.50000000000),
      (Mp2.QClass(5, true, 7), 1.60000000000, 0.50000000000),
      (Mp2.QClass(7, false, 3), 1.14285714286, 0.25000000000),
      (Mp2.QClass(9, true, 10), 1.77777777778, 0.50000000000),
      (Mp2.QClass(15, false, 4), 1.06666666667, 0.12500000000),
      (Mp2.QClass(31, false, 5), 1.03225806452, 0.06250000000),
      (Mp2.QClass(65535, false, 16), 1.00001525902, 0.00003051758))
    anchors.foreach { case (q, c, d) =>
      assert(math.abs(q.cConst - c) < 5e-12, s"C for ${q.levels}")
      assert(math.abs(q.dConst - d) < 5e-12, s"D for ${q.levels}")
    }
  }

  test("mono tone round-trips above the 40 dB gate at every sample rate") {
    for (rate <- Seq(32000, 44100, 48000)) {
      val s = tone(6000, 440.0, rate)
      val bytes = Mp2.encode(rate, Array(s))
      val d = Mp2.decode(bytes).get
      assert(d.sampleRate === rate && d.channels === 1)
      assert(d.samples(0).length % 1152 === 0)
      assert(d.samples(0).length >= s.length)
      val snr = snrDb(d.samples(0), s.map(_ / 32768.0))
      assert(snr > 40.0, s"rate $rate: SNR $snr dB")
    }
  }

  test("wideband noise survives at the filterbank+quantizer floor") {
    // band-limited below 10.9 kHz (subbands 0-21 at 32 kHz): Layer II
    // transmits only subbands 0-26 (sblimit), and table A's top bands
    // 23-26 offer at most 5 quantizer levels — full-band noise would
    // measure those FORMAT ceilings (≈8 dB sblimit cut, ≈14 dB top-band
    // floor), not codec health. 300 random-phase sinusoids light every
    // band whose ladder reaches ≥31 levels; the top-band path gets its
    // own design-resolution test below.
    val rnd = new scala.util.Random(3)
    val parts = Array.fill(300)(
      (50.0 + rnd.nextDouble() * 10850.0, rnd.nextDouble() * 2 * math.Pi))
    val s = Array.tabulate(4 * 1152) { t =>
      val v = parts.map { case (f, ph) =>
        math.sin(2 * math.Pi * f * t / 32000 + ph) }.sum / 30.0
      (v * 32768.0 * 0.35).toInt
    }
    val d = Mp2.decode(Mp2.encode(32000, Array(s), nb = 10)).get
    val snr = snrDb(d.samples(0), s.map(_ / 32768.0))
    assert(snr > 30.0, s"noise SNR $snr dB")
  }

  test("top-band tone survives at the 5-level ladder's design resolution") {
    // subband 25 (12.5-13 kHz at 32 kHz): table A's ladder there is
    // {3, 5, 65535}, and the planner settles on 5 levels (≈2.3 bits ⇒
    // ≈16 dB SNR by 6.02·bits+1.76). The gate certifies the grouped
    // base-5 path carries a real signal at its spec'd resolution — a
    // digit-order or scalefactor bug lands far below 12 dB.
    val s = tone(4608, 12700.0, 32000)
    val d = Mp2.decode(Mp2.encode(32000, Array(s))).get
    val snr = snrDb(d.samples(0), s.map(_ / 32768.0))
    assert(snr > 12.0, s"top-band SNR $snr dB")
  }

  test("stereo: independent channels decode to their own signals") {
    val left = tone(4000, 330.0, 32000)
    val right = tone(4000, 710.0, 32000)
    val d = Mp2.decode(Mp2.encode(32000, Array(left, right), nb = 8)).get
    assert(d.channels === 2)
    assert(snrDb(d.samples(0), left.map(_ / 32768.0)) > 38.0)
    assert(snrDb(d.samples(1), right.map(_ / 32768.0)) > 38.0)
  }

  test("quiet tones force grouped classes and still clear 30 dB") {
    // amplitude far below the loudest band ⇒ small `want` ⇒ the 3/5/9-
    // level GROUPED quantizers carry the signal; a broken base-L digit
    // order or group width would crater the SNR
    val loud = tone(4608, 300.0, 32000, amp = 0.45)
    val quiet = tone(4608, 4100.0, 32000, amp = 0.45 / 64) // 6 octaves down
    val mix = Array.tabulate(4608)(i => loud(i) + quiet(i))
    val d = Mp2.decode(Mp2.encode(32000, Array(mix), nb = 8)).get
    val snr = snrDb(d.samples(0), mix.map(_ / 32768.0))
    assert(snr > 30.0, s"mixed SNR $snr dB")
  }

  test("allocation table dispatch follows the §2.4.2.2 rate matrix") {
    def nameOf(r: Int, br: Int, nch: Int) = Mp2.allocTable(r, br, nch).name
    assert(nameOf(48000, 192, 1) === "3-B.2a")
    assert(nameOf(48000, 384, 2) === "3-B.2a") // 192 per channel
    assert(nameOf(48000, 48, 1) === "3-B.2c") // 48 kHz never uses b or d
    assert(nameOf(44100, 96, 1) === "3-B.2b")
    assert(nameOf(44100, 128, 2) === "3-B.2a") // 64 per channel
    assert(nameOf(44100, 32, 1) === "3-B.2c")
    assert(nameOf(32000, 192, 1) === "3-B.2b")
    assert(nameOf(32000, 64, 1) === "3-B.2a")
    assert(nameOf(32000, 48, 1) === "3-B.2d")
    assert(Mp2.TableA.sbLimit === 27 && Mp2.TableB.sbLimit === 30)
    assert(Mp2.TableC.sbLimit === 8 && Mp2.TableD.sbLimit === 12)
    // c/d ladders: no 7-level class, no 16-bit escape; grouped 3/5/9 head
    assert(Mp2.TableC.ladder(0).map(_.levels).take(3).toSeq === Seq(3, 5, 9))
    assert(!Mp2.TableC.ladder(0).exists(q => q.levels == 7 || q.levels == 65535))
    assert(Mp2.TableD.ladder(2).map(_.levels).toSeq ===
      Seq(3, 5, 9, 15, 31, 63, 127))
  }

  test("streams land on each table shape and round-trip through it") {
    // the encoder picks the smallest fitting bitrate, so signal demand
    // steers which table the header dispatches; the header is the proof
    val Bitrates = Array(0, 32, 48, 56, 64, 80, 96, 112, 128,
      160, 192, 224, 256, 320, 384)
    def headerTable(bytes: Array[Byte], rate: Int, nch: Int): String = {
      val brIdx = (bytes(2) >> 4) & 0xf
      Mp2.allocTable(rate, Bitrates(brIdx), nch).name
    }
    // table c: a lone tone at modest resolution needs only 48 kbps
    val sc = tone(4608, 440.0, 48000)
    val bc = Mp2.encode(48000, Array(sc), nb = 4)
    assert(headerTable(bc, 48000, 1) === "3-B.2c")
    assert(snrDb(Mp2.decode(bc).get.samples(0), sc.map(_ / 32768.0)) > 18.0)
    // table d: same at 32 kHz
    val sd = tone(4608, 440.0, 32000)
    val bd = Mp2.encode(32000, Array(sd), nb = 4)
    assert(headerTable(bd, 32000, 1) === "3-B.2d")
    assert(snrDb(Mp2.decode(bd).get.samples(0), sd.map(_ / 32768.0)) > 18.0)
    // table a: a three-tone chord needs a mid bitrate at 48 kHz
    val sa = Array.tabulate(4608) { t =>
      (Seq(440.0, 2300.0, 6100.0).map(f =>
        math.sin(2 * math.Pi * f * t / 48000)).sum * 32768.0 * 0.3).toInt
    }
    val ba = Mp2.encode(48000, Array(sa), nb = 12)
    assert(headerTable(ba, 48000, 1) === "3-B.2a")
    assert(snrDb(Mp2.decode(ba).get.samples(0), sa.map(_ / 32768.0)) > 40.0)
    // table b: dense wideband noise at 44.1 kHz pushes past 96 kbps/ch
    val rnd = new scala.util.Random(5)
    val parts = Array.fill(300)(
      (50.0 + rnd.nextDouble() * 10850.0, rnd.nextDouble() * 2 * math.Pi))
    val sb = Array.tabulate(4 * 1152) { t =>
      val v = parts.map { case (f, ph) =>
        math.sin(2 * math.Pi * f * t / 44100 + ph) }.sum / 30.0
      (v * 32768.0 * 0.35).toInt
    }
    val bb = Mp2.encode(44100, Array(sb), nb = 6)
    assert(headerTable(bb, 44100, 1) === "3-B.2b")
    assert(snrDb(Mp2.decode(bb).get.samples(0), sb.map(_ / 32768.0)) > 20.0)
  }

  test("header facts: Layer II bits, bitrate index, frame slot walk") {
    val bytes = Mp2.encode(48000, Array(tone(3000, 440.0, 48000)))
    assert(Mp2.isMp2(bytes))
    assert(!Mp3.isMp3(bytes)) // layer bits keep the codecs disjoint
    assert((bytes(0) & 0xff) === 0xff)
    assert(((bytes(1) >> 1) & 3) === 2) // Layer II
    assert(((bytes(3) >> 6) & 3) === 3) // single channel
  }

  test("graceful None: truncation, corruption, joint stereo, trailing garbage") {
    val good = Mp2.encode(48000, Array(tone(3000, 440.0, 48000)))
    assert(Mp2.decode(good).isDefined)
    assert(Mp2.decode("definitely not audio".getBytes).isEmpty)
    assert(Mp2.decode(good.take(40)).isEmpty)
    val joint = good.clone()
    joint(3) = ((joint(3) & 0x3f) | 0x40).toByte // mode = 01 joint stereo
    assert(Mp2.decode(joint).isEmpty)
    val badLayer = good.clone()
    badLayer(1) = (badLayer(1) & ~0x06 | 0x06).toByte // Layer I bits
    assert(Mp2.decode(badLayer).isEmpty)
    assert(Mp2.decode(good ++ "junk".getBytes).isEmpty)
  }

  test("scfsi compression round-trips every transmission pattern") {
    // a frame long enough for amplitude to move across parts exercises
    // scfsi 0/1/3; a steady tone exercises scfsi 2 — decode must agree
    // with encode regardless of which patterns the planner picked
    val swell = Array.tabulate(3 * 1152) { t =>
      val env = 0.05 + 0.4 * t.toDouble / (3 * 1152)
      (env * 32768.0 * math.sin(2 * math.Pi * 440.0 * t / 32000)).toInt
    }
    val d = Mp2.decode(Mp2.encode(32000, Array(swell))).get
    val snr = snrDb(d.samples(0), swell.map(_ / 32768.0))
    assert(snr > 35.0, s"swell SNR $snr dB")
  }
}
