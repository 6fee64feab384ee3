package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The hand-rolled PNG codec: lossless round-trips (exact on ARBITRARY
  * images, not just DC-only ones), cross-validation against the JDK
  * ImageIO codec in both directions (including its filtered color
  * output), and graceful refusal of what we don't implement. */
class PngSpec extends AnyFunSuite {

  private def noisy(w: Int, h: Int, seed: Int): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(w * h)(rnd.nextInt(256) / 255.0)
  }

  test("arbitrary grayscale images round-trip EXACTLY (lossless)") {
    for ((w, h) <- Seq((17, 9), (64, 48), (1, 1))) {
      val px = noisy(w, h, w * 31 + h)
      val dec = Png.decode(Png.encodeGray(w, h, px)).get
      assert(dec.width === w && dec.height === h && dec.channels === 1)
      val want = px.map(v => math.floor(v * 255.0 + 0.5).toInt)
      assert(dec.planes(0).toSeq === want.toSeq)
    }
  }

  test("cross-validation: our encoder -> JDK ImageIO decoder, exact") {
    val w = 40; val h = 25
    val px = noisy(w, h, 7)
    val want = px.map(v => math.floor(v * 255.0 + 0.5).toInt)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Png.encodeGray(w, h, px)))
    assert(img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.getRaster.getSample(x, y, 0) === want(y * w + x),
        s"mismatch at ($x,$y)")
  }

  test("cross-validation: JDK ImageIO color encoder -> our decoder, exact") {
    val w = 48; val h = 32
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(3)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rnd.nextInt())
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val dec = Png.decode(bos.toByteArray).get
    assert(dec.width === w && dec.height === h && dec.channels === 3)
    // PNG is lossless: every channel must match the source exactly, which
    // exercises whatever filters the JDK encoder chose per row
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y); val i = y * w + x
      assert(dec.planes(0)(i) === ((rgb >> 16) & 0xff))
      assert(dec.planes(1)(i) === ((rgb >> 8) & 0xff))
      assert(dec.planes(2)(i) === (rgb & 0xff))
    }
  }

  test("JDK gray 16-bit and gray+alpha variants decode (high-byte scaling)") {
    val w = 16; val h = 12
    val img16 = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img16.getRaster.setSample(x, y, 0, (x * 17 + y * 311) * 64 % 65536)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img16, "png", bos))
    val dec = Png.decode(bos.toByteArray).get
    assert(dec.width === w && dec.channels === 1)
    for (y <- 0 until h; x <- 0 until w)
      assert(dec.planes(0)(y * w + x) ===
        (img16.getRaster.getSample(x, y, 0) >> 8), s"16-bit at ($x,$y)")
    val imgA = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h; x <- 0 until w)
      imgA.setRGB(x, y, ((128 + x) << 24) | ((x * 5 + y * 3) & 0xff) * 0x010101)
    val bosA = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(imgA, "png", bosA))
    val decA = Png.decode(bosA.toByteArray).get
    assert(decA.channels === 4)
    for (y <- 0 until h; x <- 0 until w)
      assert(decA.planes(3)(y * w + x) === 128 + x, s"alpha at ($x,$y)")
  }

  test("Adam7 interlaced PNGs from the JDK progressive writer decode exactly") {
    for ((w, h) <- Seq((20, 14), (7, 5), (64, 33), (8, 8))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, (x * 13 + y * 31) % 256)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("png").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      writer.setOutput(new javax.imageio.stream.MemoryCacheImageOutputStream(bos))
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      writer.dispose()
      val bytes = bos.toByteArray
      assert((bytes(28) & 0xff) === 1, "JDK did not write interlaced") // IHDR interlace flag
      val dec = Png.decode(bytes).get
      assert(dec.width === w && dec.height === h)
      for (y <- 0 until h; x <- 0 until w)
        assert(dec.planes(0)(y * w + x) === (x * 13 + y * 31) % 256,
          s"${w}x$h mismatch at ($x,$y)")
    }
  }

  test("sub-byte depths from the JDK: 1-bit binary and 4-bit indexed") {
    val w = 37; val h = 11 // deliberately not byte-aligned at 1 bit/px
    val bw = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until h; x <- 0 until w)
      bw.getRaster.setSample(x, y, 0, (x * 3 + y * 5) % 7 % 2)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bw, "png", bos))
    val bytes = bos.toByteArray
    assert((bytes(24) & 0xff) === 1, "JDK did not write bit depth 1")
    val dec = Png.decode(bytes).get
    assert(dec.width === w && dec.height === h)
    for (y <- 0 until h; x <- 0 until w) {
      val want = if (bw.getRaster.getSample(x, y, 0) == 1) 255 else 0
      assert(dec.planes(0)(y * w + x) === want, s"1-bit at ($x,$y)")
    }
    // 4-bit palette: 16-color IndexColorModel
    val cmap = Array.tabulate(16)(i => (i * 17) << 16 | (255 - i * 17) << 8 | i * 8)
    val icm = new java.awt.image.IndexColorModel(4, 16,
      cmap.map(c => ((c >> 16) & 0xff).toByte),
      cmap.map(c => ((c >> 8) & 0xff).toByte),
      cmap.map(c => (c & 0xff).toByte))
    val idx = new java.awt.image.BufferedImage(23, 9,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY, icm)
    for (y <- 0 until 9; x <- 0 until 23)
      idx.getRaster.setSample(x, y, 0, (x + y * 3) % 16)
    val bos2 = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(idx, "png", bos2))
    val bytes2 = bos2.toByteArray
    assert((bytes2(24) & 0xff) === 4, "JDK did not write bit depth 4")
    assert((bytes2(25) & 0xff) === 3, "JDK did not write palette type")
    val dec2 = Png.decode(bytes2).get
    assert(dec2.channels === 3)
    for (y <- 0 until 9; x <- 0 until 23) {
      val c = cmap((x + y * 3) % 16); val i = y * 23 + x
      assert(dec2.planes(0)(i) === ((c >> 16) & 0xff), s"R at ($x,$y)")
      assert(dec2.planes(1)(i) === ((c >> 8) & 0xff), s"G at ($x,$y)")
      assert(dec2.planes(2)(i) === (c & 0xff), s"B at ($x,$y)")
    }
  }

  test("interlaced 1-bit PNG decodes (sub-byte pass strides)") {
    val w = 21; val h = 13
    val bw = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until h; x <- 0 until w)
      bw.getRaster.setSample(x, y, 0, ((x * x + y) / 2) % 2)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    writer.setOutput(new javax.imageio.stream.MemoryCacheImageOutputStream(bos))
    writer.write(null, new javax.imageio.IIOImage(bw, null, null), param)
    writer.dispose()
    val bytes = bos.toByteArray
    assert((bytes(28) & 0xff) === 1 && (bytes(24) & 0xff) === 1,
      "want interlaced 1-bit")
    val dec = Png.decode(bytes).get
    for (y <- 0 until h; x <- 0 until w) {
      val want = if (bw.getRaster.getSample(x, y, 0) == 1) 255 else 0
      assert(dec.planes(0)(y * w + x) === want, s"at ($x,$y)")
    }
  }

  test("multimodal dispatch routes PNG payloads to the real decoder") {
    val w = 12; val h = 10
    val px = noisy(w, h, 11)
    val payload = Png.encodeGray(w, h, px)
    val (dw, dh, lum) = Multimodal.decodeImage(payload, 0, 0)
    assert(dw === w && dh === h)
    assert(lum.toSeq === px.map(v =>
      math.floor(v * 255.0 + 0.5) / 255.0).toSeq)
  }

  test("graceful None: bad CRC, truncated stream, non-PNG bytes") {
    val good = Png.encodeGray(16, 16, noisy(16, 16, 1))
    assert(Png.decode("not a png".getBytes).isEmpty)
    assert(Png.decode(good.take(30)).isEmpty)
    val bad = good.clone()
    bad(40) = (bad(40) ^ 0xff).toByte // corrupt IDAT payload -> CRC fails
    assert(Png.decode(bad).isEmpty)
  }
}
