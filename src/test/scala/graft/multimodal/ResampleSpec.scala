package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Sample-rate conversion ([[Multimodal.resampleLinear]], gated as
  * q154): the closed forms linear interpolation must satisfy —
  * identity at equal rates, exact subsampling at integer ratios,
  * exactness on linear signals, the output-length formula, and edge
  * handling. */
class ResampleSpec extends AnyFunSuite {

  test("equal rates are the identity") {
    val x = Array.tabulate(100)(t => math.sin(t / 7.0))
    assert(Multimodal.resampleLinear(x, 8000, 8000).sameElements(x))
  }

  test("2:1 downsample is exact subsampling (frac is always zero)") {
    val x = Array.tabulate(64)(t => math.cos(t / 5.0))
    val y = Multimodal.resampleLinear(x, 16000, 8000)
    assert(y.length === 32)
    for (i <- y.indices) assert(y(i) === x(2 * i))
  }

  test("linear signals resample exactly at any rational ratio") {
    // lerp is exact on affine functions: out(i) = a + b*(i*src/dst)
    val a = 0.25; val b = 0.0125
    val x = Array.tabulate(90)(t => a + b * t)
    val y = Multimodal.resampleLinear(x, 8000, 6000)
    assert(y.length === (90L * 6000 / 8000).toInt)
    for (i <- y.indices) {
      val pos = i * 8000.0 / 6000.0
      assert(math.abs(y(i) - (a + b * pos)) < 1e-12)
    }
  }

  test("upsampling interpolates between neighbors and clamps the tail") {
    val x = Array(0.0, 1.0)
    val y = Multimodal.resampleLinear(x, 1000, 3000)
    assert(y.length === 6)
    val want = Seq(0.0, 1.0 / 3, 2.0 / 3, 1.0, 1.0, 1.0) // last two clamp
    for ((v, w) <- y.zip(want)) assert(math.abs(v - w) < 1e-12)
  }

  test("empty input and length formula") {
    assert(Multimodal.resampleLinear(Array.emptyDoubleArray, 8000, 6000).isEmpty)
    for (n <- Seq(50, 51, 52, 53, 449))
      assert(Multimodal.resampleLinear(new Array[Double](n), 8000, 6000)
        .length === (n.toLong * 6000 / 8000).toInt)
  }

  // ---- windowed-sinc path (Multimodal.resampleSinc, gated as q160) ----

  /** SNR of `got` vs the ideal closed-form tone at the OUTPUT rate,
    * interior samples only (the zero-padded kernel edges are excluded
    * by `guard` samples on each side — edge rolloff is by design). */
  private def toneSnrDb(got: Array[Double], k: Int, srcRate: Int,
      dstRate: Int, guard: Int): Double = {
    var sig = 0.0; var err = 0.0
    for (i <- guard until got.length - guard) {
      val pos = i.toDouble * srcRate / dstRate
      val want = 0.5 * math.sin(2 * math.Pi * k * pos / 64.0)
      sig += want * want; err += (got(i) - want) * (got(i) - want)
    }
    10.0 * math.log10(sig / math.max(err, 1e-300))
  }

  test("sinc: planted band-limited tone reconstructs at > 40 dB SNR") {
    // k = 5 → 625 Hz at 8 kHz: well inside the 0.75-cutoff passband
    val k = 5
    val x = Array.tabulate(400)(t => 0.5 * math.sin(2 * math.Pi * k * t / 64.0))
    val y = Multimodal.resampleSinc(x, 8000, 6000)
    assert(y.length === 300)
    assert(toneSnrDb(y, k, 8000, 6000, guard = 12) > 40.0)
  }

  test("sinc beats linear on a mid-band tone") {
    val k = 10 // 1250 Hz
    val x = Array.tabulate(400)(t => 0.5 * math.sin(2 * math.Pi * k * t / 64.0))
    val sinc = toneSnrDb(Multimodal.resampleSinc(x, 8000, 6000), k, 8000, 6000, 12)
    val lin = toneSnrDb(Multimodal.resampleLinear(x, 8000, 6000), k, 8000, 6000, 12)
    assert(sinc > lin + 10.0, s"sinc=$sinc dB lin=$lin dB")
  }

  test("sinc: DC passes at unit gain (interior)") {
    val x = Array.fill(200)(0.8)
    val y = Multimodal.resampleSinc(x, 8000, 6000)
    for (i <- 12 until y.length - 12)
      assert(math.abs(y(i) - 0.8) < 1e-3, s"i=$i y=${y(i)}")
  }

  test("sinc: upsampling keeps cutoff 1 and reproduces source points") {
    // at a 1:2 upsample every even output lands ON a source sample,
    // where sinc(integer) = 0 kills every cross term
    val x = Array.tabulate(64)(t => math.sin(t / 3.0))
    val y = Multimodal.resampleSinc(x, 8000, 16000)
    assert(y.length === 128)
    for (i <- 24 until 104 by 2)
      assert(math.abs(y(i) - x(i / 2)) < 1e-12)
  }

  test("sinc: empty input and length formula match the lerp path") {
    assert(Multimodal.resampleSinc(Array.emptyDoubleArray, 8000, 6000).isEmpty)
    for (n <- Seq(50, 53, 449))
      assert(Multimodal.resampleSinc(new Array[Double](n), 8000, 6000)
        .length === (n.toLong * 6000 / 8000).toInt)
  }
}
