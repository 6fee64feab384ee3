package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The hand-rolled T.81 baseline JPEG codec, verified three ways:
  * exact round-trips on DC-only images, bounded-error round-trips on
  * full-spectrum images, and cross-validation in BOTH directions against
  * the JDK's independent ImageIO codec (our encoder → their decoder,
  * their encoder → our decoder, including ImageIO's default chroma
  * subsampling). */
class JpegSpec extends AnyFunSuite {

  private def mosaic(w: Int, h: Int, seed: Int): Array[Double] =
    Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; val by = (i / w) / 8
      ((bx * 7 + by * 13 + seed) % 256) / 255.0
    }

  test("8x8-block-constant images round-trip EXACTLY (DC-only path)") {
    for ((w, h) <- Seq((16, 16), (24, 8), (8, 32))) {
      val px = mosaic(w, h, 3)
      val bytes = Jpeg.encodeGray(w, h, px)
      val dec = Jpeg.decode(bytes).get
      assert(dec.width === w && dec.height === h && dec.nComponents === 1)
      val got = dec.planes(0)
      val want = px.map(v => math.floor(v * 255.0 + 0.5).toInt)
      assert(got.toSeq === want.toSeq)
    }
  }

  test("full-spectrum images round-trip within ±1 sample at quant 1") {
    val rnd = new scala.util.Random(5)
    val w = 40; val h = 24
    // smooth gradient + a Gaussian bump + mild noise: every AC band lit
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val g = 60 + x * 3 + y * 2 +
        120 * math.exp(-((x - 20) * (x - 20) + (y - 12) * (y - 12)) / 18.0) +
        rnd.nextGaussian() * 4
      math.max(0.0, math.min(1.0, g / 255.0))
    }
    val want = px.map(v => math.floor(v * 255.0 + 0.5).toInt)
    val dec = Jpeg.decode(Jpeg.encodeGray(w, h, px)).get
    val errs = dec.planes(0).zip(want).map { case (a, b) => math.abs(a - b) }
    assert(errs.max <= 1, s"max round-trip error ${errs.max}")
  }

  test("non-multiple-of-8 dimensions crop correctly") {
    val w = 13; val h = 11
    val px = Array.tabulate(w * h)(i => (i % 256) / 255.0)
    val dec = Jpeg.decode(Jpeg.encodeGray(w, h, px)).get
    assert(dec.width === 13 && dec.height === 11)
    assert(dec.planes(0).length === 13 * 11)
  }

  test("restart markers: DRI stream decodes identically to unrestarted") {
    val w = 48; val h = 16
    val px = mosaic(w, h, 9)
    val plain = Jpeg.decode(Jpeg.encodeGray(w, h, px)).get.planes(0)
    val withRst = Jpeg.encodeGray(w, h, px, restartInterval = 2)
    // the restarted stream really contains RSTn markers
    assert(withRst.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7))
    assert(Jpeg.decode(withRst).get.planes(0).toSeq === plain.toSeq)
  }

  test("T.81 fill bytes and parameterless markers decode unchanged") {
    // B.1.1.2 allows any number of 0xFF fill bytes before a marker code,
    // and TEM (FF 01) carries no length field — both are legal in real
    // encoder output and must not derail the marker walk
    val w = 16; val h = 16
    val px = mosaic(w, h, 4)
    val good = Jpeg.encodeGray(w, h, px)
    val want = Jpeg.decode(good).get.planes(0).toSeq
    val at = good.sliding(2).indexWhere(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xdb)
    assert(at >= 0)
    val padded = good.take(at) ++
      Array[Byte](0xff.toByte, 0x01, 0xff.toByte, 0xff.toByte) ++
      good.drop(at)
    val dec = Jpeg.decode(padded)
    assert(dec.isDefined, "fill bytes / TEM broke the marker walk")
    assert(dec.get.planes(0).toSeq === want)
  }

  test("coarse quantization stays lossy-but-close (8x8 tables)") {
    val w = 32; val h = 32
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (128 + 80 * math.sin(x / 5.0) * math.cos(y / 7.0)) / 255.0
    }
    val want = px.map(v => math.floor(v * 255.0 + 0.5).toInt)
    val q = Array.fill(64)(8)
    val dec = Jpeg.decode(Jpeg.encodeGray(w, h, px, quantZigZag = q)).get
    val rms = math.sqrt(dec.planes(0).zip(want)
      .map { case (a, b) => (a - b).toDouble * (a - b) }.sum / (w * h))
    assert(rms < 4.0, s"rms $rms too high for quant step 8")
  }

  test("cross-validation: our encoder -> JDK ImageIO decoder") {
    val w = 40; val h = 24
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      math.max(0.0, math.min(1.0, (40 + 4 * x + 3 * y) / 255.0))
    }
    val want = px.map(v => math.floor(v * 255.0 + 0.5).toInt)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Jpeg.encodeGray(w, h, px)))
    assert(img.getWidth === w && img.getHeight === h)
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w) {
      // raw raster sample: getRGB would gamma-map the JDK's linear gray
      // space to sRGB and skew every value
      val lum = img.getRaster.getSample(x, y, 0)
      maxErr = math.max(maxErr, math.abs(lum - want(y * w + x)))
    }
    assert(maxErr <= 1, s"JDK decoder disagrees by $maxErr")
  }

  test("cross-validation: JDK ImageIO color encoder -> our decoder") {
    val w = 64; val h = 48
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 4) << 16) | ((y * 5) << 8) | ((x + y) & 0xff))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val dec = Jpeg.decode(bytes).get
    assert(dec.width === w && dec.height === h && dec.nComponents === 3)
    // their decode of their encode is the reference; compare per channel.
    // Both decoders implement the same spec with different IDCT/upsample
    // arithmetic — the spec's accuracy clause allows small differences,
    // and ImageIO interpolates chroma where we replicate: tolerate a
    // small mean error and a moderate per-sample bound.
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    val ours = dec.rgb
    var sumErr = 0L; var maxErr = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rp = ref.getRGB(x, y)
      for ((c, shift) <- Seq(0 -> 16, 1 -> 8, 2 -> 0)) {
        val e = math.abs(((rp >> shift) & 0xff) - ours(3 * (y * w + x) + c))
        sumErr += e; maxErr = math.max(maxErr, e)
      }
    }
    val meanErr = sumErr.toDouble / (w * h * 3)
    assert(meanErr <= 2.0, s"mean |err| $meanErr vs JDK decoder")
    assert(maxErr <= 32, s"max |err| $maxErr vs JDK decoder")
    // luminance (the pipeline's surface) must agree tightly: Y is not
    // chroma-upsampled, so only IDCT arithmetic differs
    val refLum = Array.tabulate(w * h) { i =>
      val rp = ref.getRGB(i % w, i / w)
      // JFIF forward luma of their decoded RGB
      0.299 * ((rp >> 16) & 0xff) + 0.587 * ((rp >> 8) & 0xff) +
        0.114 * (rp & 0xff)
    }
    val ourLum = dec.planes(0)
    val lumErr = refLum.zip(ourLum).map { case (a, b) => math.abs(a - b) }
    assert(lumErr.sum / (w * h) <= 2.0,
      s"mean luminance err ${lumErr.sum / (w * h)}")
  }

  test("multimodal dispatch routes JPEG payloads to the real decoder") {
    val w = 16; val h = 16
    val px = mosaic(w, h, 1)
    val payload = Jpeg.encodeGray(w, h, px)
    val (dw, dh, lum) = Multimodal.decodeImage(payload, 0, 0)
    assert(dw === w && dh === h)
    assert(lum.toSeq === px.map(v =>
      math.floor(v * 255.0 + 0.5) / 255.0).toSeq)
    val f = Multimodal.features(payload)
    assert(f.length === Multimodal.FeatureLen)
    assert(math.abs(f.sum - 1.0) < 1e-9) // L1-normalized histogram
  }

  test("graceful None: truncated, arithmetic-coded and non-JPEG bytes") {
    val good = Jpeg.encodeGray(16, 16, mosaic(16, 16, 2))
    assert(Jpeg.decode(good.take(20)).isEmpty)
    assert(Jpeg.decode("not a jpeg".getBytes).isEmpty)
    // flip SOF0 (C0) to SOF9 (C9, arithmetic-coded): must refuse
    val arith = good.clone()
    val sofAt = arith.indices.find(i =>
      (arith(i) & 0xff) == 0xff && (arith(i + 1) & 0xff) == 0xc0).get
    arith(sofAt + 1) = 0xc9.toByte
    assert(Jpeg.decode(arith).isEmpty)
  }

  test("PROGRESSIVE (SOF2) from the JDK writer decodes: gray and color") {
    def progressiveBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      writer.setOutput(new javax.imageio.stream.MemoryCacheImageOutputStream(bos))
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      writer.dispose()
      val bytes = bos.toByteArray
      assert(bytes.sliding(2).exists(s =>
        (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xc2), "no SOF2 emitted")
      bytes
    }
    // grayscale: spectral-selection + successive-approximation scans
    val w = 40; val h = 28
    val gray = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gray.getRaster.setSample(x, y, 0,
        (128 + 90 * math.sin(x / 4.0) * math.cos(y / 5.0)).toInt)
    val gbytes = progressiveBytes(gray)
    val gdec = Jpeg.decode(gbytes).get
    assert(gdec.width === w && gdec.height === h)
    // their own decode of the same bytes is the reference
    val gref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(gbytes))
    var gMax = 0
    for (y <- 0 until h; x <- 0 until w)
      gMax = math.max(gMax, math.abs(
        gref.getRaster.getSample(x, y, 0) - gdec.planes(0)(y * w + x)))
    assert(gMax <= 1, s"progressive gray differs from JDK by $gMax")
    // color with default subsampling: interleaved DC scan + per-component
    // AC scans + refinements
    val cimg = new java.awt.image.BufferedImage(48, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 48)
      cimg.setRGB(x, y, ((x * 5) << 16) | ((y * 7) << 8) | ((x + 2 * y) & 0xff))
    val cbytes = progressiveBytes(cimg)
    val cdec = Jpeg.decode(cbytes).get
    assert(cdec.nComponents === 3)
    val cref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(cbytes))
    val refLum = Array.tabulate(48 * 32) { i =>
      val rp = cref.getRGB(i % 48, i / 48)
      0.299 * ((rp >> 16) & 0xff) + 0.587 * ((rp >> 8) & 0xff) +
        0.114 * (rp & 0xff)
    }
    val lumErr = refLum.zip(cdec.planes(0))
      .map { case (a, b) => math.abs(a - b) }
    assert(lumErr.sum / lumErr.length <= 2.0,
      s"progressive color mean luminance err ${lumErr.sum / lumErr.length}")
  }
}
