package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Frequency-domain feature extraction ([[Multimodal.bandEnergies]],
  * gated as q153): bin math against closed forms a DFT must satisfy —
  * coherent-tone concentration, Parseval's identity over the full bin
  * set, linearity in signal energy, and the short/empty-input edge. */
class SpectralSpec extends AnyFunSuite {

  private def tone(n: Int, cycles: Double, amp: Double = 0.5): Array[Double] =
    Array.tabulate(n)(t => amp * math.sin(2 * math.Pi * cycles * t / n))

  test("a coherent tone concentrates all energy in its own bin") {
    val n = 128
    for (k <- Seq(2, 8, 40)) {
      val e = Multimodal.bandEnergies(tone(n, k), n,
        Array.tabulate(n / 2 - 1)(_ + 1))
      // |X_k|²/n² of an amplitude-A sine at exact bin k is (A/2)²
      assert(math.abs(e(k - 1) - 0.0625) < 1e-12)
      for ((v, i) <- e.zipWithIndex if i != k - 1)
        assert(math.abs(v) < 1e-20, s"leakage at bin ${i + 1} for tone $k")
    }
  }

  test("Parseval: energies over ALL n bins sum to the mean power") {
    val n = 64
    val rnd = new scala.util.Random(11)
    val x = Array.fill(n)(rnd.nextDouble() * 2 - 1)
    val e = Multimodal.bandEnergies(x, n, Array.tabulate(n)(identity))
    val meanPower = x.map(v => v * v).sum / n
    assert(math.abs(e.sum - meanPower) < 1e-12)
  }

  test("scaling the signal by a scales every band energy by a²") {
    val n = 64
    val x = tone(n, 5.0, 0.3)
    val y = x.map(_ * 2.0)
    val bins = Array(3, 5, 9)
    val ex = Multimodal.bandEnergies(x, n, bins)
    val ey = Multimodal.bandEnergies(y, n, bins)
    for ((a, b) <- ex.zip(ey)) assert(math.abs(b - 4 * a) < 1e-15)
  }

  test("signals shorter than the window zero-pad; empty is all-zero") {
    val n = 128
    val x = tone(64, 4.0) // 4 cycles over 64 samples = bin 8 at n=128
    val short = Multimodal.bandEnergies(x, n, Array(8))
    val padded = Multimodal.bandEnergies(x ++ Array.fill(64)(0.0), n, Array(8))
    assert(short(0) === padded(0))
    val empty = Multimodal.bandEnergies(Array.emptyByteArray.map(_.toDouble),
      n, Array(1, 2, 3))
    assert(empty.forall(_ == 0.0))
  }

  test("the q153 shape: WAV round-trip tone dominates its DFT bin") {
    val k = 7
    val samples = Array.tabulate(300)(t =>
      0.5 * math.sin(2 * math.Pi * k * t / 64.0))
    val payload = Codecs.encodeWav(8000, samples)
    val (rate, mono) = Multimodal.decodeAudio(payload).get
    assert(rate === 8000)
    val e = Multimodal.bandEnergies(mono, 128, Array.tabulate(20)(i => 2 * (i + 1)))
    val dom = e.indexOf(e.max) + 1
    assert(dom === k)
    assert(e(dom - 1) > 1000.0 * (e.sum - e(dom - 1))) // tonality margin
    assert(e.sum - e(dom - 1) < 1e-6) // off-band is quantizer noise only
  }
}
