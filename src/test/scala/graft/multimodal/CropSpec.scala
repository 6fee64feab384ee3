package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Center crop ([[Multimodal.centerCrop]], gated as q155): offset
  * parity, row stride, clamping, and identity closed forms. */
class CropSpec extends AnyFunSuite {

  // pixel (y, x) of a w-wide grid encodes its own coordinates
  private def grid(w: Int, h: Int): Array[Double] =
    Array.tabulate(w * h)(i => (i / w) * 100.0 + (i % w))

  test("even-even: crop window is exactly centered") {
    val (cw, ch, out) = Multimodal.centerCrop(grid(8, 6), 8, 6, 4, 2)
    assert((cw, ch) === (4, 2))
    // ox = (8-4)/2 = 2, oy = (6-2)/2 = 2
    for (y <- 0 until 2; x <- 0 until 4)
      assert(out(y * 4 + x) === (y + 2) * 100.0 + (x + 2))
  }

  test("odd remainder floors the leading offset") {
    // w=7, cw=4 -> ox = 1 (floor(3/2)); h=5, ch=2 -> oy = 1
    val (cw, ch, out) = Multimodal.centerCrop(grid(7, 5), 7, 5, 4, 2)
    assert((cw, ch) === (4, 2))
    for (y <- 0 until 2; x <- 0 until 4)
      assert(out(y * 4 + x) === (y + 1) * 100.0 + (x + 1))
  }

  test("a crop larger than the image clamps to the whole image") {
    val g = grid(5, 4)
    val (cw, ch, out) = Multimodal.centerCrop(g, 5, 4, 9, 9)
    assert((cw, ch) === (5, 4))
    assert(out.sameElements(g))
  }

  test("full-size crop is the identity") {
    val g = grid(6, 3)
    val (_, _, out) = Multimodal.centerCrop(g, 6, 3, 6, 3)
    assert(out.sameElements(g))
  }

  test("buffer length is validated") {
    intercept[IllegalArgumentException] {
      Multimodal.centerCrop(new Array[Double](10), 4, 4, 2, 2)
    }
    intercept[IllegalArgumentException] {
      Multimodal.centerCrop(grid(4, 4), 4, 4, 0, 2)
    }
  }

  test("letterbox centers the image and fills the border") {
    val g = grid(3, 2)
    val (tw, th, out) = Multimodal.letterbox(g, 3, 2, 7, 5, -1.0)
    assert((tw, th) === (7, 5))
    // ox = (7-3)/2 = 2, oy = (5-2)/2 = 1
    for (y <- 0 until 5; x <- 0 until 7) {
      val v = out(y * 7 + x)
      if (x >= 2 && x < 5 && y >= 1 && y < 3)
        assert(v === (y - 1) * 100.0 + (x - 2))
      else assert(v === -1.0)
    }
  }

  test("letterbox to the same size is the identity; crop∘letterbox too") {
    val g = grid(4, 3)
    assert(Multimodal.letterbox(g, 4, 3, 4, 3, 0.0)._3.sameElements(g))
    // padding then center-cropping back recovers the image EXACTLY when
    // both remainders are even (offsets align); 4->8, 3->5 qualifies
    val (tw, th, padded) = Multimodal.letterbox(g, 4, 3, 8, 5, 0.0)
    val (_, _, back) = Multimodal.centerCrop(padded, tw, th, 4, 3)
    assert(back.sameElements(g))
  }

  test("letterbox refuses to discard pixels") {
    intercept[IllegalArgumentException] {
      Multimodal.letterbox(grid(4, 3), 4, 3, 3, 5, 0.0)
    }
  }
}
