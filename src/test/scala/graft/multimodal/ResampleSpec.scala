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
}
