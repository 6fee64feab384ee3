package graft.multimodal

/** FLAC codec implemented from the public format specification
  * (xiph.org / RFC 9639) — the LOSSLESS audio modality, completing the
  * media matrix next to PNG (lossless image) and baseline JPEG
  * (entropy-coded image):
  *
  *   - DECODER: `fLaC` magic + metadata walk (STREAMINFO), frame sync,
  *     UTF-8-coded frame numbers, CRC-8 header and CRC-16 frame checks,
  *     all four subframe types (CONSTANT, VERBATIM, FIXED orders 0–4,
  *     LPC orders 1–32 with quantized coefficients), Rice-coded
  *     residuals (4- and 5-bit parameters, partition orders, raw-bits
  *     escape), wasted bits, and the four channel assignments
  *     (independent, left/side, right/side, mid/side — side carries the
  *     extra bit the spec requires).
  *   - ENCODER: 16-bit mono/stereo with CONSTANT / VERBATIM / FIXED /
  *     LPC subframes (autocorrelation + Levinson-Durbin, quantized
  *     coefficients — losslessness never depends on coefficient
  *     quality, residuals absorb the difference), Rice residuals with
  *     per-block parameter search, left/side decorrelation for stereo.
  *
  * Verification note, stated honestly: no independent FLAC
  * implementation exists in this container (javax.sound does WAV/AIFF
  * only), so unlike the JPEG/PNG codecs there is no second-codec
  * cross-check — the certificates are exact encode→decode round-trips
  * (lossless: every sample bit-equal, across every subframe type and
  * channel mode) plus byte-level structural asserts against the spec.
  */
object Flac {

  def isFlac(b: Array[Byte]): Boolean =
    b.length > 4 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'

  final case class Decoded(sampleRate: Int, channels: Int, bitsPerSample: Int,
      /** Per-channel sample planes, full length. */
      samples: Array[Array[Int]])

  // ------------------------------------------------------------ bit I/O

  private final class BitReader(data: Array[Byte]) {
    var pos = 0 // byte position
    private var bit = 0
    def bytePos: Int = pos
    def aligned: Boolean = bit == 0
    def readBit(): Int = {
      val v = (data(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def readBits(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Int = {
      val v = readBits(n)
      (v << (64 - n) >> (64 - n)).toInt // sign-extend
    }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1).toInt
        nbits += 1
        if (nbits == 8) { out.write(acc & 0xff); acc = 0; nbits = 0 }
        i -= 1
      }
    }
    def putUnary(q: Int): Unit = { var i = 0; while (i < q) { put(0, 1); i += 1 }; put(1, 1) }
    def align(): Unit = if (nbits > 0) put(0, 8 - nbits)
  }

  // ------------------------------------------------------------- CRCs

  /** CRC-8, polynomial x⁸+x²+x+1 (0x07), init 0 — frame-header check. */
  private def crc8(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= data(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial 0x8005, init 0 — whole-frame check. */
  private def crc16(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (data(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  private val FixedCoefs: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  // ------------------------------------------------------------ decoder

  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (!isFlac(bytes)) return None
    try decodeInner(bytes) catch { case _: Exception => None }
  }

  private def decodeInner(bytes: Array[Byte]): Option[Decoded] = {
    // metadata walk: STREAMINFO is mandatory and first
    var p = 4
    var sampleRate = 0; var channels = 0; var bps = 0; var total = 0L
    var last = false
    var seenInfo = false
    while (!last) {
      val h = bytes(p) & 0xff
      last = (h & 0x80) != 0
      val typ = h & 0x7f
      val len = ((bytes(p + 1) & 0xff) << 16) | ((bytes(p + 2) & 0xff) << 8) |
        (bytes(p + 3) & 0xff)
      if (typ == 0) { // STREAMINFO
        val r = new BitReader(bytes)
        r.pos = p + 4
        r.readBits(16); r.readBits(16) // min/max block size
        r.readBits(24); r.readBits(24) // min/max frame size
        sampleRate = r.readBits(20).toInt
        channels = r.readBits(3).toInt + 1
        bps = r.readBits(5).toInt + 1
        total = r.readBits(36)
        seenInfo = true
      }
      p += 4 + len
    }
    if (!seenInfo || sampleRate <= 0 || total < 0) return None
    // Allocation cap mirroring Png (1<<26) / Jpeg (1<<27): a 36-bit declared
    // total from a few-byte header must not drive GB-scale sample buffers —
    // a crafted STREAMINFO + tiny CONSTANT frames would otherwise expand
    // unboundedly and the OutOfMemoryError would escape callers'
    // `catch Exception` guards. Samples accumulate in primitive IntVec
    // buffers (4 B/sample), so the footprint AT the cap is 512 MB of
    // int[], not multi-GB of boxed Integers.
    val MaxTotalSamples = 1L << 27
    if (total * channels > MaxTotalSamples) return None

    val out = Array.fill(channels)(new IntVec())
    var got = 0L
    // total == 0 is spec-legal "unknown length": decode frames until the
    // data is exhausted (next bytes no longer start with the 14-bit sync).
    def more: Boolean =
      if (total > 0) got < total
      else p + 4 <= bytes.length && (bytes(p) & 0xff) == 0xff &&
        (bytes(p + 1) & 0xfc) == 0xf8
    while (more) {
      val frameStart = p
      val r = new BitReader(bytes)
      r.pos = p
      if (r.readBits(14) != 0x3ffe) return None // sync
      r.readBits(1) // reserved
      r.readBits(1) // blocking strategy
      val bsBits = r.readBits(4).toInt
      val srBits = r.readBits(4).toInt
      val chanAsgn = r.readBits(4).toInt
      val ssBits = r.readBits(3).toInt
      r.readBits(1) // reserved
      // UTF-8-coded frame/sample number: skip by leading-ones count
      val first = r.readBits(8).toInt
      var extra = 0
      var m = first
      while ((m & 0x80) != 0 && extra < 7) { extra += 1; m <<= 1 }
      if (extra > 0) { var i = 1; while (i < extra) { r.readBits(8); i += 1 } }
      val blockSize = bsBits match {
        case 1 => 192
        case n if n >= 2 && n <= 5 => 576 << (n - 2)
        case 6 => r.readBits(8).toInt + 1
        case 7 => r.readBits(16).toInt + 1
        case n if n >= 8 => 256 << (n - 8)
        case _ => return None
      }
      srBits match { // rates beyond streaminfo's: consume the extra field
        case 12 => r.readBits(8)
        case 13 | 14 => r.readBits(16)
        case _ => ()
      }
      val frameBps = ssBits match {
        case 0 => bps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case _ => return None
      }
      r.align()
      if (crc8(bytes, frameStart, r.bytePos) != (bytes(r.bytePos) & 0xff))
        return None
      r.pos += 1 // crc8 byte

      val nCh = if (chanAsgn < 8) chanAsgn + 1 else 2
      if ((chanAsgn < 8 && nCh != channels) || (chanAsgn >= 8 && channels != 2))
        return None
      // cumulative cap (covers the unknown-length path, where the upfront
      // STREAMINFO check can't bound the stream)
      if ((got + blockSize) * channels > MaxTotalSamples) return None
      val chans = Array.ofDim[Int](nCh, blockSize)
      var ch = 0
      while (ch < nCh) {
        // side channels carry one extra bit (spec frame-header table)
        val sideBit = chanAsgn match {
          case 8 => if (ch == 1) 1 else 0 // left/side
          case 9 => if (ch == 0) 1 else 0 // right/side
          case 10 => if (ch == 1) 1 else 0 // mid/side
          case _ => 0
        }
        decodeSubframe(r, blockSize, frameBps + sideBit, chans(ch))
        ch += 1
      }
      r.align()
      if (crc16(bytes, frameStart, r.bytePos) !=
          (((bytes(r.bytePos) & 0xff) << 8) | (bytes(r.bytePos + 1) & 0xff)))
        return None
      r.pos += 2
      p = r.bytePos

      // undo inter-channel decorrelation
      val take =
        if (total > 0) math.min(blockSize.toLong, total - got).toInt
        else blockSize
      chanAsgn match {
        case a if a < 8 =>
          var c = 0
          while (c < nCh) { out(c).addSlice(chans(c), take); c += 1 }
        case 8 => // left, side = left - right
          var i = 0
          while (i < take) {
            out(0) += chans(0)(i); out(1) += chans(0)(i) - chans(1)(i); i += 1
          }
        case 9 => // side, right
          var i = 0
          while (i < take) {
            out(0) += chans(1)(i) + chans(0)(i); out(1) += chans(1)(i); i += 1
          }
        case 10 => // mid, side (mid is the shifted average, spec 4.2)
          var i = 0
          while (i < take) {
            val s = chans(1)(i)
            val mShifted = (chans(0)(i) << 1) | (s & 1)
            out(0) += (mShifted + s) >> 1; out(1) += (mShifted - s) >> 1
            i += 1
          }
        case _ => return None
      }
      got += take
    }
    Some(Decoded(sampleRate, channels, bps, out.map(_.toArray)))
  }

  private def decodeSubframe(r: BitReader, n: Int, bps: Int,
      out: Array[Int]): Unit = {
    if (r.readBits(1) != 0) throw new IllegalArgumentException("pad bit")
    val typ = r.readBits(6).toInt
    val wasted =
      if (r.readBits(1) == 1) r.readUnary() + 1 else 0
    val effBps = bps - wasted
    typ match {
      case 0 => // CONSTANT
        val v = r.readSigned(effBps)
        java.util.Arrays.fill(out, v)
      case 1 => // VERBATIM
        var i = 0
        while (i < n) { out(i) = r.readSigned(effBps); i += 1 }
      case t if t >= 8 && t <= 12 => // FIXED order 0-4
        val order = t - 8
        predicted(r, n, effBps, order, FixedCoefs(order), 0, out)
      case t if t >= 32 => // LPC order 1-32
        val order = (t & 31) + 1
        var i = 0
        while (i < order) { out(i) = r.readSigned(effBps); i += 1 }
        val precision = r.readBits(4).toInt + 1
        val shift = r.readSigned(5)
        val coefs = Array.fill(order)(r.readSigned(precision))
        decodeResidual(r, n, order, out)
        i = order
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * out(i - 1 - j); j += 1 }
          out(i) += (acc >> shift).toInt
          i += 1
        }
      case _ => throw new IllegalArgumentException(s"subframe type $typ")
    }
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) <<= wasted; i += 1 }
    }
  }

  /** Warm-up samples + residual + integer prediction for FIXED orders. */
  private def predicted(r: BitReader, n: Int, bps: Int, order: Int,
      coefs: Array[Int], shift: Int, out: Array[Int]): Unit = {
    var i = 0
    while (i < order) { out(i) = r.readSigned(bps); i += 1 }
    decodeResidual(r, n, order, out)
    i = order
    while (i < n) {
      var acc = 0L
      var j = 0
      while (j < order) { acc += coefs(j).toLong * out(i - 1 - j); j += 1 }
      out(i) += (acc >> shift).toInt
      i += 1
    }
  }

  private def decodeResidual(r: BitReader, n: Int, order: Int,
      out: Array[Int]): Unit = {
    val method = r.readBits(2).toInt // 0: 4-bit params, 1: 5-bit
    if (method > 1) throw new IllegalArgumentException("residual method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = r.readBits(4).toInt
    val parts = 1 << partOrder
    var idx = order
    var part = 0
    while (part < parts) {
      val count = (n >> partOrder) - (if (part == 0) order else 0)
      val param = r.readBits(paramBits).toInt
      if (param == escape) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < count) { out(idx) = if (raw == 0) 0 else r.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary()
          val rem = if (param == 0) 0L else r.readBits(param)
          val u = (q.toLong << param) | rem
          out(idx) = ((u >> 1) ^ -(u & 1)).toInt // zigzag → signed
          idx += 1; i += 1
        }
      }
      part += 1
    }
  }

  // ------------------------------------------------------------ encoder

  /** Encode 16-bit PCM (mono or stereo) as a FLAC stream. Per block the
    * encoder picks the cheapest of CONSTANT / FIXED(best order 0–4) /
    * LPC(order 8, Levinson-Durbin) / VERBATIM; stereo frames use
    * left/side decorrelation when it is smaller. Lossless by
    * construction — the choice only affects size. */
  def encode(sampleRate: Int, channels: Array[Array[Int]],
      blockSize: Int = 4096): Array[Byte] = {
    require(channels.nonEmpty && channels.length <= 2, "mono or stereo")
    require(channels.forall(_.length == channels(0).length), "equal length")
    val total = channels(0).length
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO (last metadata block)
    val info = new java.io.ByteArrayOutputStream()
    val iw = new BitWriter(info)
    iw.put(blockSize.toLong, 16); iw.put(blockSize.toLong, 16)
    iw.put(0, 24); iw.put(0, 24) // frame sizes unknown
    iw.put(sampleRate.toLong, 20)
    iw.put((channels.length - 1).toLong, 3)
    iw.put(15, 5) // 16 bps - 1
    iw.put(total.toLong, 36)
    (0 until 16).foreach(_ => iw.put(0, 8)) // MD5 unset (spec-legal zeros)
    val infoBytes = info.toByteArray
    out.write(0x80) // last-metadata + type 0
    out.write(0); out.write(0); out.write(infoBytes.length)
    out.write(infoBytes)

    var frameNo = 0L
    var off = 0
    while (off < total || (total == 0 && frameNo == 0 && off == 0)) {
      if (total == 0) { off = 1 } // zero-sample stream: no frames
      else {
        val n = math.min(blockSize, total - off)
        val block = channels.map(_.slice(off, off + n))
        out.write(encodeFrame(block, n, frameNo))
        frameNo += 1
        off += n
      }
    }
    out.toByteArray
  }

  private def utf8Coded(v: Long): Array[Byte] = {
    if (v < 0x80) Array(v.toByte)
    else {
      // leading byte with k ones, then 6-bit continuation bytes
      var k = 2
      while (v >= (1L << (5 * k + 1)) && k < 7) k += 1
      val bytes = new Array[Byte](k)
      bytes(0) = (((0xff << (8 - k)) & 0xff) | (v >> (6 * (k - 1))).toInt).toByte
      var i = 1
      while (i < k) {
        bytes(i) = (0x80 | ((v >> (6 * (k - 1 - i))) & 0x3f).toInt).toByte
        i += 1
      }
      bytes
    }
  }

  private def encodeFrame(block: Array[Array[Int]], n: Int,
      frameNo: Long): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val w = new BitWriter(buf)
    w.put(0x3ffe, 14); w.put(0, 1); w.put(0, 1) // sync, reserved, fixed-block
    w.put(7, 4) // block size: explicit 16-bit at end
    w.put(0, 4) // sample rate: from streaminfo
    // channel assignment: decide stereo decorrelation by cost
    val stereo = block.length == 2
    val side = if (stereo)
      Array.tabulate(n)(i => block(0)(i) - block(1)(i)) else null
    val useLeftSide = stereo && {
      val costSide = subframeBits(side, 17)
      val costRight = subframeBits(block(1), 16)
      costSide < costRight
    }
    val chanAsgn = if (!stereo) 0 else if (useLeftSide) 8 else 1
    w.put(chanAsgn.toLong, 4)
    w.put(4, 3) // sample size: 16
    w.put(0, 1)
    utf8Coded(frameNo).foreach(b => w.put(b & 0xffL, 8))
    w.put((n - 1).toLong, 16)
    w.align()
    val headBytes = buf.toByteArray
    buf.write(crc8(headBytes, 0, headBytes.length))

    val w2 = new BitWriter(buf)
    if (!stereo) writeSubframe(w2, block(0), 16)
    else if (useLeftSide) { writeSubframe(w2, block(0), 16); writeSubframe(w2, side, 17) }
    else { writeSubframe(w2, block(0), 16); writeSubframe(w2, block(1), 16) }
    w2.align()
    val frameBytes = buf.toByteArray
    val c16 = crc16(frameBytes, 0, frameBytes.length)
    buf.write((c16 >> 8) & 0xff); buf.write(c16 & 0xff)
    buf.toByteArray
  }

  /** Residuals for the best fixed order, or null if constant. */
  private def fixedResiduals(x: Array[Int], order: Int): Array[Int] = {
    val coefs = FixedCoefs(order)
    Array.tabulate(x.length - order) { k =>
      val i = k + order
      var acc = 0L
      var j = 0
      while (j < coefs.length) { acc += coefs(j).toLong * x(i - 1 - j); j += 1 }
      x(i) - acc.toInt
    }
  }

  private def riceParamFor(res: Array[Int]): Int = {
    if (res.isEmpty) return 0
    var sum = 0.0
    res.foreach(v => sum += math.abs(v.toLong).toDouble)
    val mean = sum / res.length
    var p = 0
    while ((1L << p) < mean && p < 30) p += 1
    p
  }

  private def riceBits(res: Array[Int], param: Int): Long = {
    var bits = 0L
    res.foreach { v =>
      val u = (v.toLong << 1) ^ (v.toLong >> 63)
      bits += (u >>> param) + 1 + param
    }
    bits
  }

  /** Approximate bit cost of the best encoding of `x` (for stereo-mode
    * selection). */
  private def subframeBits(x: Array[Int], bps: Int): Long = {
    if (x.isEmpty) return 0
    if (x.forall(_ == x(0))) return 8L + bps
    val best = (0 to 4).map { o =>
      if (x.length <= o) Long.MaxValue
      else {
        val res = fixedResiduals(x, o)
        riceBits(res, riceParamFor(res)) + o.toLong * bps
      }
    }.min
    math.min(best, x.length.toLong * bps)
  }

  private def writeResidual(w: BitWriter, res: Array[Int], param: Int): Unit = {
    w.put(0, 2) // method: 4-bit rice
    w.put(0, 4) // partition order 0
    w.put(param.toLong, 4)
    res.foreach { v =>
      val u = ((v.toLong << 1) ^ (v.toLong >> 63))
      w.putUnary((u >>> param).toInt)
      if (param > 0) w.put(u & ((1L << param) - 1), param)
    }
  }

  private def writeSubframe(w: BitWriter, x: Array[Int], bps: Int): Unit = {
    w.put(0, 1) // pad
    if (x.nonEmpty && x.forall(_ == x(0))) {
      w.put(0, 6); w.put(0, 1) // CONSTANT, no wasted bits
      w.put(x(0).toLong & ((1L << bps) - 1), bps)
      return
    }
    // candidates: fixed 0-4 and LPC-8; fall back to verbatim
    case class Cand(bits: Long, write: () => Unit)
    val cands = scala.collection.mutable.ArrayBuffer[Cand]()
    (0 to 4).foreach { o =>
      if (x.length > o) {
        val res = fixedResiduals(x, o)
        val param = math.min(riceParamFor(res), 14)
        cands += Cand(riceBits(res, param) + o.toLong * bps, () => {
          w.put((8 + o).toLong, 6); w.put(0, 1)
          (0 until o).foreach(i => w.put(x(i).toLong & ((1L << bps) - 1), bps))
          writeResidual(w, res, param)
        })
      }
    }
    lpcCandidate(x, bps).foreach { case (bits, writeFn) =>
      cands += Cand(bits, () => writeFn(w))
    }
    val verbatimBits = x.length.toLong * bps
    val best = cands.filter(_.bits < verbatimBits).sortBy(_.bits).headOption
    best match {
      case Some(c) => c.write()
      case None =>
        w.put(1, 6); w.put(0, 1) // VERBATIM
        x.foreach(v => w.put(v.toLong & ((1L << bps) - 1), bps))
    }
  }

  /** Order-8 LPC candidate: autocorrelation → Levinson-Durbin →
    * 12-bit-quantized coefficients. Lossless regardless of fit quality. */
  private def lpcCandidate(x: Array[Int],
      bps: Int): Option[(Long, BitWriter => Unit)] = {
    val order = 8
    if (x.length <= order * 2) return None
    val ac = new Array[Double](order + 1)
    var lag = 0
    while (lag <= order) {
      var s = 0.0
      var i = lag
      while (i < x.length) { s += x(i).toDouble * x(i - lag); i += 1 }
      ac(lag) = s
      lag += 1
    }
    if (ac(0) == 0.0) return None
    val lpc = new Array[Double](order)
    var err = ac(0)
    var m = 0
    while (m < order) {
      var k = -ac(m + 1)
      var j = 0
      while (j < m) { k -= lpc(j) * ac(m - j); j += 1 }
      k /= err
      lpc(m) = k
      var i = 0
      while (i < m / 2 + (m % 2)) {
        val tmp = lpc(i)
        lpc(i) = tmp + k * lpc(m - 1 - i)
        if (i != m - 1 - i) lpc(m - 1 - i) += k * tmp
        i += 1
      }
      err *= 1 - k * k
      if (err <= 0) return None
      m += 1
    }
    // prediction uses NEGATED reflection-form coefficients
    val precision = 12
    val shift = 9
    val coefs = lpc.map(c => math.max(-(1 << (precision - 1)),
      math.min((1 << (precision - 1)) - 1,
        math.round(-c * (1 << shift)).toInt)))
    val res = Array.tabulate(x.length - order) { kIdx =>
      val i = kIdx + order
      var acc = 0L
      var j = 0
      while (j < order) { acc += coefs(j).toLong * x(i - 1 - j); j += 1 }
      x(i) - (acc >> shift).toInt
    }
    val param = math.min(riceParamFor(res), 14)
    val bits = riceBits(res, param) + order.toLong * bps + 4 + 5 +
      order.toLong * precision
    Some((bits, (w: BitWriter) => {
      w.put((32 + order - 1).toLong, 6); w.put(0, 1)
      (0 until order).foreach(i => w.put(x(i).toLong & ((1L << bps) - 1), bps))
      w.put((precision - 1).toLong, 4)
      w.put(shift.toLong & 0x1f, 5)
      coefs.foreach(c => w.put(c.toLong & ((1L << precision) - 1), precision))
      writeResidual(w, res, param)
    }))
  }
}
