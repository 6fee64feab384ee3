package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** PNG codec implemented from the public W3C/ISO specification (RFC 2083):
  * the LOSSLESS image modality — unlike JPEG, every decoded sample is
  * bit-exact, so round-trip certificates hold for arbitrary images.
  *
  *   - DECODER: signature + chunk walk (CRC-checked), IHDR, PLTE, tRNS
  *     ignored-safely, concatenated IDAT through the JDK Inflater (zlib is
  *     in-JVM, like the PDF writer's Deflater), all five scanline filters
  *     (None/Sub/Up/Average/Paeth), every legal bit depth (1/2/4-bit
  *     packed grayscale and palette, 8, and 16 taking the high byte),
  *     color types grayscale / RGB / palette / gray+alpha / RGBA, and
  *     Adam7 interlacing (seven independently-filtered sub-images
  *     scattered by the spec's pass geometry).
  *   - ENCODER: 8-bit grayscale, filter None, one IDAT — enough to
  *     certify the decoder end to end (q116) and cross-validate against
  *     the JDK ImageIO codec in both directions.
  */
object Png {

  private val Signature =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && b.take(8).sameElements(Signature)

  /** Decoded image: per-channel planes at full resolution, samples scaled
    * to 0–255 (16-bit sources take the high byte, per the spec's sample
    * depth scaling). */
  final case class Decoded(width: Int, height: Int, channels: Int,
      planes: Array[Array[Int]]) {
    /** Luminance in [0,1]: BT.601 luma for color, the gray plane
      * otherwise (alpha ignored). */
    def luminance: Array[Double] = {
      val n = width * height
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        out(i) =
          (if (channels >= 3)
            0.299 * planes(0)(i) + 0.587 * planes(1)(i) + 0.114 * planes(2)(i)
          else planes(0)(i).toDouble) / 255.0
        i += 1
      }
      out
    }
  }

  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (!isPng(bytes)) return None
    try decodeInner(bytes) catch { case _: Exception => None }
  }

  private def decodeInner(bytes: Array[Byte]): Option[Decoded] = {
    def u32(i: Int): Long =
      ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
    var p = 8
    var width = 0; var height = 0
    var bitDepth = 0; var colorType = 0; var interlace = 0
    var palette: Array[Int] = null // packed RGB
    val idat = new java.io.ByteArrayOutputStream()
    var seenIend = false
    while (p + 8 <= bytes.length && !seenIend) {
      val len = u32(p).toInt
      val typ = new String(bytes, p + 4, 4, "US-ASCII")
      if (len < 0 || p + 12 + len > bytes.length) return None
      // CRC covers type + data (spec 3.4); corrupt chunks invalidate
      val crc = new CRC32()
      crc.update(bytes, p + 4, 4 + len)
      if (crc.getValue != u32(p + 8 + len)) return None
      typ match {
        case "IHDR" =>
          width = u32(p + 8).toInt; height = u32(p + 12).toInt
          bitDepth = bytes(p + 16) & 0xff
          colorType = bytes(p + 17) & 0xff
          if ((bytes(p + 18) & 0xff) != 0 || (bytes(p + 19) & 0xff) != 0)
            return None // compression/filter methods: only 0 defined
          interlace = bytes(p + 20) & 0xff
        case "PLTE" =>
          palette = Array.tabulate(len / 3)(i =>
            ((bytes(p + 8 + 3 * i) & 0xff) << 16) |
              ((bytes(p + 9 + 3 * i) & 0xff) << 8) |
              (bytes(p + 10 + 3 * i) & 0xff))
        case "IDAT" => idat.write(bytes, p + 8, len)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks skipped
      }
      p += 12 + len
    }
    if (width <= 0 || height <= 0 || interlace > 1) return None
    // header-declared dimensions allocate buffers BEFORE any pixel data
    // validates: cap them so a crafted tiny payload can't OOM the task
    // (an Error would escape the decode() Exception guard)
    if (width.toLong * height > (1L << 26)) return None
    val channels = colorType match {
      case 0 => 1 // grayscale
      case 2 => 3 // RGB
      case 3 => 1 // palette index
      case 4 => 2 // gray + alpha
      case 6 => 4 // RGBA
      case _ => return None
    }
    // legal depths per color type (spec 11.2.2): sub-byte only for
    // grayscale and palette
    val depthOk = colorType match {
      case 0 => Seq(1, 2, 4, 8, 16).contains(bitDepth)
      case 3 => Seq(1, 2, 4, 8).contains(bitDepth)
      case _ => bitDepth == 8 || bitDepth == 16
    }
    if (!depthOk) return None
    if (colorType == 3 && palette == null) return None
    // second cap with the now-known channel count and sample width: a
    // 16-bit RGBA declaration multiplies the raw/sample/plane buffers 8×
    // over the grayscale case the pixel cap alone assumed
    if (width.toLong * height * channels * math.max(1, bitDepth / 8) >
        (1L << 27)) return None

    val bitsPerPx = channels * bitDepth
    val bpp = math.max(1, bitsPerPx / 8) // filter step, ≥1 byte (spec 6.2)
    // Adam7 pass geometry (spec 8.2): (x0, y0, dx, dy) per pass
    val passes: Seq[(Int, Int, Int, Int)] =
      if (interlace == 0) Seq((0, 0, 1, 1))
      else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    def passDims(p: (Int, Int, Int, Int)): (Int, Int) = {
      val (x0, y0, dx, dy) = p
      (math.max(0, (width - x0 + dx - 1) / dx),
        math.max(0, (height - y0 + dy - 1) / dy))
    }
    def passStride(pw: Int): Int = (pw * bitsPerPx + 7) / 8
    val rawLen = passes.map { p =>
      val (pw, ph) = passDims(p)
      if (pw == 0 || ph == 0) 0L else ph.toLong * (1 + passStride(pw).toLong)
    }.sum
    if (rawLen > Int.MaxValue) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    while (off < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, off, raw.length - off)
      // n == 0 covers truncation AND stalls (e.g. an FDICT preset
      // dictionary, illegal in PNG): bail instead of spinning forever
      if (n == 0) return None
      off += n
    }
    inf.end()
    if (off < raw.length) return None

    // un-filter each (sub-)image independently, extract its samples
    // (bit-packed for depths <8, high byte for 16) and scatter them into
    // the full-resolution sample grid; non-interlaced images are the
    // single pass covering everything
    val samples = new Array[Int](width * height * channels) // raw samples
    var rawOff = 0
    passes.foreach { p =>
      val (x0, y0, dx, dy) = p
      val (pw, ph) = passDims(p)
      if (pw > 0 && ph > 0) {
        val pStride = passStride(pw)
        val rec = unfilter(raw, rawOff, ph, pStride, bpp).getOrElse(return None)
        rawOff += ph * (1 + pStride)
        var j = 0
        while (j < ph) {
          var i = 0
          while (i < pw) {
            var c = 0
            while (c < channels) {
              val v = bitDepth match {
                case 8 => rec(j * pStride + i * channels + c)
                case 16 => rec(j * pStride + (i * channels + c) * 2)
                case d => // sub-byte (channels == 1): MSB-first packing
                  val bitOff = i * d
                  (rec(j * pStride + bitOff / 8) >>
                    (8 - d - bitOff % 8)) & ((1 << d) - 1)
              }
              samples(((y0 + j * dy) * width + (x0 + i * dx)) * channels + c) = v
              c += 1
            }
            i += 1
          }
          j += 1
        }
      }
    }

    // resolve to per-channel planes at 8-bit depth: palette lookup, or
    // sample-depth scaling (v·255/(2^d−1); 16-bit already took the high
    // byte, 8-bit is the identity)
    val outChannels = if (colorType == 3) 3 else channels
    val planes = Array.fill(outChannels)(new Array[Int](width * height))
    val maxVal = (1 << math.min(bitDepth, 8)) - 1
    var i = 0
    while (i < width * height) {
      if (colorType == 3) {
        val idx = samples(i)
        if (idx >= palette.length) return None
        val rgb = palette(idx)
        planes(0)(i) = (rgb >> 16) & 0xff
        planes(1)(i) = (rgb >> 8) & 0xff
        planes(2)(i) = rgb & 0xff
      } else {
        var c = 0
        while (c < channels) {
          planes(c)(i) =
            if (maxVal == 255) samples(i * channels + c)
            else samples(i * channels + c) * 255 / maxVal
          c += 1
        }
      }
      i += 1
    }
    Some(Decoded(width, height, outChannels, planes))
  }

  /** Un-filter `rows` scanlines of `stride` bytes (each preceded by its
    * filter-type byte) starting at raw(off) — spec 6: reconstruction
    * references the PRIOR reconstructed row of the SAME (sub-)image and
    * the left/up-left bytes at distance bpp. None on an unknown filter
    * type. */
  private def unfilter(raw: Array[Byte], off: Int, rows: Int, stride: Int,
      bpp: Int): Option[Array[Int]] = {
    val rec = new Array[Int](rows * stride)
    var y = 0
    while (y < rows) {
      val ft = raw(off + y * (stride + 1)) & 0xff
      val rowOff = off + y * (stride + 1) + 1
      var x = 0
      while (x < stride) {
        val cur = raw(rowOff + x) & 0xff
        val left = if (x >= bpp) rec(y * stride + x - bpp) else 0
        val up = if (y > 0) rec((y - 1) * stride + x) else 0
        val upLeft = if (y > 0 && x >= bpp) rec((y - 1) * stride + x - bpp) else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 =>
            // Paeth predictor (spec 6.6)
            val pa = math.abs(up - upLeft)
            val pb = math.abs(left - upLeft)
            val pc = math.abs(left + up - 2 * upLeft)
            cur + (if (pa <= pb && pa <= pc) left
                   else if (pb <= pc) up else upLeft)
          case _ => return None
        }
        rec(y * stride + x) = v & 0xff
        x += 1
      }
      y += 1
    }
    Some(rec)
  }

  /** Encode an 8-bit grayscale image (values [0,1], half-up quantized
    * like the PGM/JPEG encoders): IHDR + one filter-None IDAT + IEND. */
  def encodeGray(w: Int, h: Int, px: Array[Double]): Array[Byte] = {
    require(px.length == w * h, "pixel count mismatch")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def b32(v: Long): Unit = {
        out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      }
      b32(data.length.toLong)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new CRC32()
      crc.update(tb); crc.update(data)
      b32(crc.getValue)
    }
    val ihdr = new Array[Byte](13)
    def put32(a: Array[Byte], o: Int, v: Int): Unit = {
      a(o) = (v >> 24).toByte; a(o + 1) = (v >> 16).toByte
      a(o + 2) = (v >> 8).toByte; a(o + 3) = v.toByte
    }
    put32(ihdr, 0, w); put32(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // grayscale
    // compression 0, filter 0, interlace 0 already zero
    chunk("IHDR", ihdr)
    val raw = new Array[Byte]((w + 1) * h)
    var y = 0
    while (y < h) {
      raw(y * (w + 1)) = 0 // filter None
      var x = 0
      while (x < w) {
        val q = math.floor(px(y * w + x) * 255.0 + 0.5).toInt
        raw(y * (w + 1) + 1 + x) = math.max(0, math.min(255, q)).toByte
        x += 1
      }
      y += 1
    }
    val def_ = new Deflater()
    def_.setInput(raw); def_.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!def_.finished()) comp.write(buf, 0, def_.deflate(buf))
    def_.end()
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
