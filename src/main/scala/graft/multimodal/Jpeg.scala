package graft.multimodal

/** JPEG codec implemented from the public ITU-T T.81 (1992)
  * specification — the entropy-coded image modality that was a documented
  * stub in earlier rounds, now real and pure-JVM:
  *
  *   - DECODER: baseline, extended sequential AND progressive DCT
  *     (SOF0/SOF1/SOF2), canonical Huffman entropy decode (spec
  *     §F.2.2.3), any number of components with arbitrary 1–4 h/v
  *     sampling factors (4:4:4, 4:2:2, 4:2:0 …), interleaved MCUs, byte
  *     unstuffing (FF 00), restart markers (DRI + RSTn with DC-predictor
  *     reset), dequantize → inverse zigzag → separable 8×8 IDCT → level
  *     shift → clamp. The decoder is scan-generic: every scan
  *     accumulates into per-component coefficient buffers (progressive
  *     spectral selection + successive approximation with EOBn runs and
  *     AC refinement, spec §G.1.2; baseline is the one-scan special
  *     case) and reconstruction runs once at EOI. Hierarchical and
  *     arithmetic-coded frames are out of scope and return None.
  *   - ENCODER: grayscale baseline with the spec's Annex K typical
  *     luminance Huffman tables, selectable quantization table and
  *     restart interval — enough to certify the decoder end to end
  *     (q115) and to exercise every decoder path from ScalaTests.
  *
  * The numeric contract the driver gate relies on: an 8×8-block-constant
  * image has only DC energy, DC quantized at step 1 is an exact integer,
  * and the IDCT of a DC-only block is flat to ~1e-13 — so after the
  * spec's round-to-integer sample reconstruction the encode→decode round
  * trip is EXACT, closed-form-reproducible in SQL. General images round
  * trip within ±1 sample (coefficient rounding), asserted in tests and
  * cross-validated against the JDK's independent ImageIO codec.
  */
object Jpeg {

  /** Zig-zag scan order (T.81 Figure A.6): zigzag index → natural index. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.3.1 typical luminance DC table: code counts by length 1–16,
    * then the symbol values (categories 0–11). */
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  /** Annex K.3.2 typical luminance AC table. */
  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** 1-D IDCT basis: cosTab(u)(x) = c(u)/2 · cos((2x+1)uπ/16). */
  private val CosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  def isJpeg(b: Array[Byte]): Boolean =
    b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff

  // ------------------------------------------------------------- Huffman

  /** Canonical Huffman table in the spec's F.2.2.3 DECODE representation
    * plus an encode map (symbol → (code, length)). */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val values: Array[Int] = vals
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    val encCode = new Array[Int](256)
    val encLen = new Array[Int](256)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) > 0) {
          valPtr(l) = k; minCode(l) = code
          var i = 0
          while (i < bits(l)) {
            encCode(vals(k)) = code; encLen(vals(k)) = l
            code += 1; k += 1; i += 1
          }
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  private final class BitReader(data: Array[Byte], start: Int) {
    var pos: Int = start
    private var acc = 0
    private var nbits = 0
    /** True while positioned at a marker (FF xx, xx ≠ 00) — the entropy
      * segment ended; truncated reads beyond it pad with zeros (F.2.2.5). */
    def atMarker: Boolean =
      pos + 1 < data.length && (data(pos) & 0xff) == 0xff &&
        (data(pos + 1) & 0xff) != 0
    def readBit(): Int = {
      if (nbits == 0) {
        if (pos >= data.length || atMarker) return 0
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xff) pos += 1 // stuffed 00 after a literal FF byte
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Byte-align, scan past any padding to the RSTn marker, consume it
      * (restart boundary; spec E.2.4 allows pad bytes before markers). */
    def restart(): Unit = {
      nbits = 0
      while (pos + 1 < data.length && !((data(pos) & 0xff) == 0xff && {
        val m = data(pos + 1) & 0xff; m >= 0xd0 && m <= 0xd7
      })) pos += 1
      if (pos + 1 < data.length) pos += 2
    }
  }

  /** EXTEND (spec F.2.2.1): map the `t` received magnitude bits to the
    * signed coefficient value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  // ------------------------------------------------------------- decoder

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int,
      var dc: Int = 0, var ac: Int = 0)

  final case class Decoded(width: Int, height: Int, nComponents: Int,
      /** Per-component sample planes at FULL image resolution (upsampled
        * by sample replication), row-major, integer samples 0–255. */
      planes: Array[Array[Int]]) {
    /** Luminance in [0,1]: component 0 (Y in JFIF YCbCr, the sample plane
      * itself for grayscale). */
    def luminance: Array[Double] = planes(0).map(_ / 255.0)
    /** Interleaved sRGB (JFIF YCbCr→RGB matrix); grayscale replicates. */
    def rgb: Array[Int] = {
      val n = width * height
      val out = new Array[Int](n * 3)
      var i = 0
      while (i < n) {
        if (nComponents >= 3) {
          val y = planes(0)(i); val cb = planes(1)(i) - 128
          val cr = planes(2)(i) - 128
          out(3 * i) = clamp255(math.round(y + 1.402 * cr).toInt)
          out(3 * i + 1) = clamp255(math.round(y - 0.344136 * cb - 0.714136 * cr).toInt)
          out(3 * i + 2) = clamp255(math.round(y + 1.772 * cb).toInt)
        } else {
          out(3 * i) = planes(0)(i); out(3 * i + 1) = planes(0)(i)
          out(3 * i + 2) = planes(0)(i)
        }
        i += 1
      }
      out
    }
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Decode a baseline, extended-sequential or PROGRESSIVE JPEG
    * (SOF0/SOF1/SOF2). None for non-JPEG bytes, hierarchical/arithmetic
    * frames, or structurally broken streams. */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (!isJpeg(bytes)) return None
    try decodeInner(bytes) catch { case _: Exception => None }
  }

  /** The decoder is scan-generic: every scan — a baseline interleaved
    * scan, a progressive DC/AC first scan, or a successive-approximation
    * refinement — accumulates into per-component COEFFICIENT buffers, and
    * dequantize+IDCT run once at EOI. Baseline is simply the one-scan
    * special case (Ss=0, Se=63, Ah=Al=0). */
  private def decodeInner(bytes: Array[Byte]): Option[Decoded] = {
    val quant = Array.ofDim[Int](4, 64) // zigzag order, as stored
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Comp] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var maxH = 1; var maxV = 1
    var mcusX = 0; var mcusY = 0
    var blocksW: Array[Int] = null // padded block grid dims per component
    var blocksH: Array[Int] = null
    var coefs: Array[Array[Int]] = null // 64 per block, natural order
    var sawScan = false
    var p = 2
    def u8(i: Int) = bytes(i) & 0xff
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)

    while (p + 1 < bytes.length) {
      if (u8(p) != 0xff) return None
      // T.81 B.1.1.2: any number of 0xFF fill bytes may precede the marker
      // code — skip them so the code byte, not a fill byte, is interpreted
      var mk = p + 1
      while (mk < bytes.length && u8(mk) == 0xff) mk += 1
      if (mk >= bytes.length) return None
      p = mk - 1 // re-anchor so the shared p-relative offsets below hold
      val marker = u8(p + 1)
      if (marker == 0xd9) { // EOI: reconstruct from the coefficient state
        if (!sawScan) return None
        return Some(reconstruct(comps, quant, coefs, blocksW, blocksH,
          width, height, maxH, maxV))
      }
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
        // TEM / RSTn / stray SOI are parameterless: no length field to read
        p += 2
      } else {
      if (p + 3 >= bytes.length) return None
      val len = u16(p + 2)
      val seg = p + 4
      marker match {
        case 0xdb => // DQT: one or more (Pq/Tq, 64 entries) tables
          var q = seg
          while (q < p + 2 + len) {
            val pq = u8(q) >> 4; val tq = u8(q) & 0x0f
            var i = 0
            while (i < 64) {
              quant(tq)(i) = if (pq == 0) u8(q + 1 + i) else u16(q + 1 + 2 * i)
              i += 1
            }
            q += 1 + (if (pq == 0) 64 else 128)
          }
        case 0xc4 => // DHT: one or more (class/id, counts, symbols)
          var q = seg
          while (q < p + 2 + len) {
            val tc = u8(q) >> 4; val th = u8(q) & 0x0f
            val bits = new Array[Int](17)
            var total = 0
            var l = 1
            while (l <= 16) { bits(l) = u8(q + l); total += bits(l); l += 1 }
            val vals = Array.tabulate(total)(i => u8(q + 17 + i))
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            q += 17 + total
          }
        case 0xc0 | 0xc1 | 0xc2 => // SOF0/1 sequential, SOF2 progressive
          if (u8(seg) != 8) return None // 8-bit samples only
          height = u16(seg + 1); width = u16(seg + 3)
          if (width <= 0 || height <= 0) return None
          // cap header-declared size: coefficient buffers allocate before
          // any entropy data validates, and an OutOfMemoryError would
          // escape the Exception guard and kill the task
          if (width.toLong * height > (1L << 26)) return None
          val n = u8(seg + 5)
          comps = Array.tabulate(n) { i =>
            val o = seg + 6 + 3 * i
            Comp(u8(o), u8(o + 1) >> 4, u8(o + 1) & 0x0f, u8(o + 2))
          }
          maxH = comps.map(_.h).max; maxV = comps.map(_.v).max
          mcusX = (width + 8 * maxH - 1) / (8 * maxH)
          mcusY = (height + 8 * maxV - 1) / (8 * maxV)
          blocksW = comps.map(c => mcusX * c.h)
          blocksH = comps.map(c => mcusY * c.v)
          // cap the TOTAL coefficient allocation, not just the pixel
          // count: the component count is an unvalidated u8 and sampling
          // factors multiply the padded block grids
          val totalCoefs = comps.indices
            .map(i => blocksW(i).toLong * blocksH(i) * 64).sum
          if (totalCoefs > (1L << 27)) return None
          coefs = comps.indices.map(i =>
            new Array[Int](blocksW(i) * blocksH(i) * 64)).toArray
        case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
            0xcd | 0xce | 0xcf =>
          return None // lossless / hierarchical / arithmetic: unsupported
        case 0xdd => restartInterval = u16(seg)
        case 0xda => // SOS: scan header then entropy-coded data
          if (comps == null) return None
          val ns = u8(seg)
          val scanComps = new Array[Int](ns)
          var i = 0
          while (i < ns) {
            val cid = u8(seg + 1 + 2 * i)
            val tabs = u8(seg + 2 + 2 * i)
            val ci = comps.indexWhere(_.id == cid)
            if (ci < 0) return None
            comps(ci).dc = tabs >> 4
            comps(ci).ac = tabs & 0x0f
            scanComps(i) = ci
            i += 1
          }
          val ss = u8(seg + 1 + 2 * ns)
          val se = u8(seg + 2 + 2 * ns)
          val ah = u8(seg + 3 + 2 * ns) >> 4
          val al = u8(seg + 3 + 2 * ns) & 0x0f
          if (ss > 63 || se > 63 || se < ss) return None
          val scanEnd = decodeScanData(bytes, p + 2 + len, comps, scanComps,
            dcTabs, acTabs, coefs, blocksW, blocksH, mcusX, mcusY,
            width, height, maxH, maxV, ss, se, ah, al, restartInterval)
          sawScan = true
          // scanEnd is the terminating marker; offset the loop's shared
          // `p += 2 + len` advance so the next iteration lands on it
          p = scanEnd - (2 + len)
        case _ => () // APPn / COM / others: skip
      }
      p += 2 + len
      }
    }
    None
  }

  /** Decode one scan's entropy-coded data into the coefficient buffers;
    * returns the byte offset of the marker that terminated the scan. */
  private def decodeScanData(bytes: Array[Byte], dataStart: Int,
      comps: Array[Comp], scanComps: Array[Int], dcTabs: Array[HuffTable],
      acTabs: Array[HuffTable], coefs: Array[Array[Int]],
      blocksW: Array[Int], blocksH: Array[Int], mcusX: Int, mcusY: Int,
      width: Int, height: Int, maxH: Int, maxV: Int,
      ss: Int, se: Int, ah: Int, al: Int, restartInterval: Int): Int = {
    val r = new BitReader(bytes, dataStart)
    val preds = new Array[Int](comps.length)
    var eobrun = 0

    // one block of one component; `off` is the block's 64-coef offset
    def block(ci: Int, off: Int): Unit = {
      val coef = coefs(ci)
      if (ss == 0 && ah == 0) {
        // DC first (baseline DC is the Al=0 case)
        val dcT = dcTabs(comps(ci).dc)
        val t = huffDecode(r, dcT)
        preds(ci) += extend(r.receive(t), t)
        coef(off) = preds(ci) << al
        // baseline/sequential scans continue straight into AC
        if (se > 0) acFirst(ci, off, 1)
      } else if (ss == 0 && ah > 0) {
        // DC refinement: one more magnitude bit (two's complement OR)
        if (r.receive(1) == 1) coef(off) |= 1 << al
      } else if (ah == 0) {
        acFirst(ci, off, ss)
      } else {
        acRefine(ci, off)
      }
    }

    // AC first pass (also the baseline AC path at al=0): run/size with
    // progressive EOBn run lengths (spec G.1.2.2)
    def acFirst(ci: Int, off: Int, from: Int): Unit = {
      val coef = coefs(ci)
      if (eobrun > 0) { eobrun -= 1; return }
      val acT = acTabs(comps(ci).ac)
      var k = from
      var done = false
      while (!done && k <= se) {
        val rs = huffDecode(r, acT)
        val run = rs >> 4; val size = rs & 0x0f
        if (size == 0) {
          if (run == 15) k += 16 // ZRL
          else {
            // EOBn: (1<<run)-1 additional all-done blocks follow
            eobrun = (1 << run) - 1
            if (run > 0) eobrun += r.receive(run).toInt
            done = true
          }
        } else {
          k += run
          if (k <= se) {
            coef(off + ZigZag(k)) = extend(r.receive(size), size) << al
            k += 1
          } else done = true
        }
      }
    }

    // AC successive-approximation refinement (spec G.1.2.3): newly
    // nonzero coefficients arrive as ±1<<al; already-nonzero ones take
    // one correction bit each as the scan passes over them
    def acRefine(ci: Int, off: Int): Unit = {
      val coef = coefs(ci)
      val acT = acTabs(comps(ci).ac)
      val p1 = 1 << al
      def correct(k: Int): Unit = {
        val zi = off + ZigZag(k)
        if (r.receive(1) == 1 && (math.abs(coef(zi)) & p1) == 0)
          coef(zi) += (if (coef(zi) >= 0) p1 else -p1)
      }
      var k = ss
      if (eobrun == 0) {
        var done = false
        while (!done && k <= se) {
          val rs = huffDecode(r, acT)
          var run = rs >> 4
          val size = rs & 0x0f
          var newVal = 0
          if (size == 0) {
            if (run < 15) {
              eobrun = (1 << run) - 1
              if (run > 0) eobrun += r.receive(run).toInt
              done = true // rest of the block joins the EOB refinement
            }
            // run == 15: skip 16 zero-history positions
          } else {
            newVal = if (r.receive(1) == 1) p1 else -p1
          }
          if (!done) {
            // advance over `run` zero-history coefficients, correcting
            // every nonzero coefficient passed on the way
            var placed = false
            while (!placed && k <= se) {
              val zi = off + ZigZag(k)
              if (coef(zi) != 0) correct(k)
              else {
                if (run == 0) {
                  if (newVal != 0) coef(zi) = newVal
                  placed = true
                } else run -= 1
              }
              k += 1
            }
          }
        }
      } else eobrun -= 1
      // EOB refinement: correction bits for every remaining nonzero
      // coefficient of this block
      while (k <= se) {
        if (coef(off + ZigZag(k)) != 0) correct(k)
        k += 1
      }
    }

    val interleaved = scanComps.length > 1
    val nUnits =
      if (interleaved) mcusX * mcusY
      else {
        val c = comps(scanComps(0))
        val cw = (width * c.h + maxH - 1) / maxH
        val ch = (height * c.v + maxV - 1) / maxV
        ((cw + 7) / 8) * ((ch + 7) / 8)
      }
    var unit = 0
    while (unit < nUnits) {
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        r.restart()
        java.util.Arrays.fill(preds, 0)
        eobrun = 0
      }
      if (interleaved) {
        val my = unit / mcusX; val mx = unit % mcusX
        var s = 0
        while (s < scanComps.length) {
          val ci = scanComps(s)
          val c = comps(ci)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              block(ci, ((my * c.v + by) * blocksW(ci) + mx * c.h + bx) * 64)
              bx += 1
            }
            by += 1
          }
          s += 1
        }
      } else {
        val ci = scanComps(0)
        val c = comps(ci)
        val cw = (width * c.h + maxH - 1) / maxH
        val bw = (cw + 7) / 8
        block(ci, ((unit / bw) * blocksW(ci) + unit % bw) * 64)
      }
      unit += 1
    }
    // locate the marker that ends this scan (skip pad bytes)
    var q = r.pos
    while (q + 1 < bytes.length && !((bytes(q) & 0xff) == 0xff &&
      (bytes(q + 1) & 0xff) != 0)) q += 1
    // RSTn markers trailing the last restart segment belong to the scan
    while (q + 1 < bytes.length && (bytes(q) & 0xff) == 0xff && {
      val m = bytes(q + 1) & 0xff; m >= 0xd0 && m <= 0xd7
    }) {
      q += 2
      while (q + 1 < bytes.length && !((bytes(q) & 0xff) == 0xff &&
        (bytes(q + 1) & 0xff) != 0)) q += 1
    }
    q
  }

  /** Dequantize + IDCT every block, then upsample each component to full
    * resolution by sample replication. */
  private def reconstruct(comps: Array[Comp], quant: Array[Array[Int]],
      coefs: Array[Array[Int]], blocksW: Array[Int], blocksH: Array[Int],
      width: Int, height: Int, maxH: Int, maxV: Int): Decoded = {
    val tmp = Array.ofDim[Double](8, 8)
    val deq = new Array[Int](64)
    val planes = comps.indices.map { ci =>
      val c = comps(ci)
      val q = quant(c.tq)
      val pw = blocksW(ci) * 8
      val plane = new Array[Int](pw * blocksH(ci) * 8)
      var b = 0
      val nBlocks = blocksW(ci) * blocksH(ci)
      while (b < nBlocks) {
        val off = b * 64
        var k = 0
        while (k < 64) { // k runs in zigzag order like the quant table
          deq(ZigZag(k)) = coefs(ci)(off + ZigZag(k)) * q(k)
          k += 1
        }
        idctBlock(deq, tmp, plane, pw,
          (b / blocksW(ci)) * 8, (b % blocksW(ci)) * 8)
        b += 1
      }
      if (c.h == maxH && c.v == maxV && pw == width &&
          blocksH(ci) * 8 == height) plane.take(width * height)
      else {
        val out = new Array[Int](width * height)
        var y = 0
        while (y < height) {
          val sy = y * c.v / maxV
          var x = 0
          while (x < width) {
            out(y * width + x) = plane(sy * pw + x * c.h / maxH)
            x += 1
          }
          y += 1
        }
        out
      }
    }.toArray
    Decoded(width, height, comps.length, planes)
  }

  private def huffDecode(r: BitReader, t: HuffTable): Int = {
    var len = 1
    var code = r.readBit()
    while (code > t.maxCode(len)) {
      len += 1
      if (len > 16) // no 16-bit code matches: the stream is corrupt —
        throw new IllegalArgumentException("huffman code overflow")
      code = (code << 1) | r.readBit()
    }
    t.values(t.valPtr(len) + code - t.minCode(len))
  }

  /** Separable 8×8 IDCT (spec A.3.3) + level shift + round + clamp into
    * the plane at (oy, ox). */
  private def idctBlock(coeff: Array[Int], tmp: Array[Array[Double]],
      plane: Array[Int], planeW: Int, oy: Int, ox: Int): Unit = {
    // rows: for each v (block row of coefficients) → spatial x
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += CosTab(u)(x) * coeff(v * 8 + u); u += 1 }
        tmp(v)(x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var w = 0
        while (w < 8) { s += CosTab(w)(y) * tmp(w)(x); w += 1 }
        plane((oy + y) * planeW + ox + x) =
          clamp255(math.round(s + 128.0).toInt)
        x += 1
      }
      y += 1
    }
  }

  // ------------------------------------------------------------- encoder

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (spec F.1.2.3). */
    def flush(): Unit = if (nbits > 0) { put(0xff, 8 - nbits) }
  }

  private def category(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Encode an 8-bit grayscale image as baseline JPEG: JFIF header, the
    * given quantization table (zigzag order, default all-ones = maximum
    * fidelity), Annex K luminance Huffman tables, optional restart
    * interval (MCUs per restart segment). Pixels are [0,1], quantized
    * half-up to 8 bits like the PGM encoder. */
  def encodeGray(w: Int, h: Int, px: Array[Double],
      quantZigZag: Array[Int] = Array.fill(64)(1),
      restartInterval: Int = 0): Array[Byte] = {
    require(px.length == w * h, "pixel count mismatch")
    require(quantZigZag.length == 64, "quant table must have 64 entries")
    val out = new java.io.ByteArrayOutputStream()
    def m(code: Int): Unit = { out.write(0xff); out.write(code) }
    def b(v: Int): Unit = out.write(v & 0xff)
    def b16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8) // SOI
    m(0xe0); b16(16); out.write("JFIF".getBytes("US-ASCII")); b(0)
    b(1); b(1); b(0); b16(1); b16(1); b(0); b(0) // JFIF 1.1, no density
    m(0xdb); b16(2 + 1 + 64); b(0) // DQT table 0, 8-bit
    quantZigZag.foreach(b)
    m(0xc0); b16(8 + 3); b(8); b16(h); b16(w); b(1) // SOF0, 1 component
    b(1); b(0x11); b(0) // comp 1, 1×1 sampling, quant table 0
    def dht(tc: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      m(0xc4); b16(2 + 1 + 16 + vals.length); b((tc << 4) | 0)
      (1 to 16).foreach(l => b(bits(l)))
      vals.foreach(b)
    }
    dht(0, DcLumBits, DcLumVals)
    dht(1, AcLumBits, AcLumVals)
    if (restartInterval > 0) { m(0xdd); b16(4); b16(restartInterval) }
    m(0xda); b16(6 + 2); b(1); b(1); b(0x00); b(0); b(63); b(0) // SOS
    val dcT = new HuffTable(DcLumBits, DcLumVals)
    val acT = new HuffTable(AcLumBits, AcLumVals)
    val bw = new BitWriter(out)
    val blocksX = (w + 7) / 8; val blocksY = (h + 7) / 8
    var pred = 0
    val block = new Array[Double](64)
    val coefZ = new Array[Int](64)
    var mcu = 0
    val nMcus = blocksX * blocksY
    var rstIdx = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush()
        m(0xd0 + (rstIdx & 7)); rstIdx += 1
        pred = 0
      }
      val byI = mcu / blocksX; val bxI = mcu % blocksX
      // gather the block, edge-replicated (common padding choice; any
      // padding is legal — the decoder crops to the SOF dimensions)
      var y = 0
      while (y < 8) {
        val sy = math.min(byI * 8 + y, h - 1)
        var x = 0
        while (x < 8) {
          val sx = math.min(bxI * 8 + x, w - 1)
          val q8 = math.max(0, math.min(255,
            math.floor(px(sy * w + sx) * 255.0 + 0.5).toInt))
          block(y * 8 + x) = q8 - 128.0
          x += 1
        }
        y += 1
      }
      // forward DCT (A.3.3) via the same separable basis, then quantize
      var vv = 0
      while (vv < 8) {
        var uu = 0
        while (uu < 8) {
          var s = 0.0
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              s += block(yy * 8 + xx) * CosTab(uu)(xx) * CosTab(vv)(yy)
              xx += 1
            }
            yy += 1
          }
          val zi = ZigZagInv(vv * 8 + uu)
          coefZ(zi) = math.round(s / quantZigZag(zi)).toInt
          uu += 1
        }
        vv += 1
      }
      // DC difference
      val diff = coefZ(0) - pred
      pred = coefZ(0)
      val cat = category(diff)
      bw.put(dcT.encCode(cat), dcT.encLen(cat))
      if (cat > 0)
        bw.put(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
      // AC run-lengths
      var k = 1
      var run = 0
      while (k < 64) {
        if (coefZ(k) == 0) run += 1
        else {
          while (run >= 16) {
            bw.put(acT.encCode(0xf0), acT.encLen(0xf0)); run -= 16
          }
          val c = category(coefZ(k))
          val rs = (run << 4) | c
          bw.put(acT.encCode(rs), acT.encLen(rs))
          bw.put(if (coefZ(k) < 0) coefZ(k) + (1 << c) - 1 else coefZ(k), c)
          run = 0
        }
        k += 1
      }
      if (run > 0) bw.put(acT.encCode(0x00), acT.encLen(0x00)) // EOB
      mcu += 1
    }
    bw.flush()
    m(0xd9) // EOI
    out.toByteArray
  }

  /** Natural index → zigzag index (inverse of [[ZigZag]]). */
  private val ZigZagInv: Array[Int] = {
    val inv = new Array[Int](64)
    var i = 0
    while (i < 64) { inv(ZigZag(i)) = i; i += 1 }
    inv
  }
}
