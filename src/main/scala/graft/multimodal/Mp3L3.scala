package graft.multimodal

/** MPEG-1 Audio Layer III codec (ISO/IEC 11172-3 §2.4.1.7 / §2.4.2.7 /
  * §2.4.3.4), hand-rolled from the public spec on top of the shared
  * Layer I/II infrastructure in [[Mp3]] (32-subband polyphase
  * filterbank, bit I/O, frame-slot walking).
  *
  * Everything ALGORITHMIC in Layer III is implemented spec-exact:
  *   - the hybrid filterbank: polyphase analysis → per-subband 36-point
  *     MDCT with the sine window sin(π/36·(n+½)) (§2.4.3.4.10.3's
  *     long-block window — an equation, not a table), TDAC overlap-add,
  *     frequency inversion of odd samples in odd subbands;
  *   - aliasing-reduction butterflies with the spec's eight published
  *     coefficients cᵢ ∈ {−0.6, −0.535, −0.33, −0.185, −0.095, −0.041,
  *     −0.0142, −0.0037}, csᵢ = 1/√(1+cᵢ²), caᵢ = cᵢ·csᵢ (§2.4.3.4.10.1)
  *     — the encoder pre-applies the exact inverse rotation;
  *   - nonuniform requantization xr = sign·|ix|^{4/3} ·
  *     2^{(global_gain−210)/4} · 2^{−((scalefac_scale+1)/2)·scalefac}
  *     (§2.4.3.4.7.1) and its encoder-side inverse;
  *   - the full frame grammar: 9-bit main_data_begin, per-granule side
  *     info (part2_3_length, big_values, global_gain, scalefac_compress,
  *     table_select×3, region counts, scalefac_scale, count1 selector),
  *     the slen1/slen2 scalefac_compress map, scfsi share groups,
  *     big_values / count1 / rzero spectrum partitioning with
  *     region boundaries at scalefactor-band edges, sign bits, linbits
  *     escapes, and 144·bitrate/rate slot framing.
  *
  * Two documented deviations, same policy as [[Mp3Windows]] (derive
  * what is derivable; never transcribe large printed tables from memory
  * where a silent error would misrepresent conformance):
  *   1. The Huffman CODE TABLES are lookup data (~2000 printed
  *      codeword entries across 34 tables). This codec substitutes a
  *      DERIVED structured prefix code with the spec's exact table
  *      semantics: big-value pairs are coded per-component unary
  *      (v ones + terminating zero; value 15 escapes into linbits — the
  *      ESC-table contract), table ids 16-23 carry linbits
  *      {1,2,3,4,6,8,10,13}, and the count1 quadruple table is the flat
  *      4-bit (v,w,x,y) code (ISO's own count1 table B shape). Streams
  *      are therefore self-consistent and fully spec-SHAPED but not
  *      bit-compatible with third-party entropy decoding; any
  *      table_select outside the derived family returns None.
  *   2. Scalefactor-band boundaries are printed per-rate tables; a
  *      DERIVED 22-edge partition of the 576 lines (near-exponential
  *      widths, last band unscaled — the spec's sfb21 structure) is
  *      used for all three sample rates, identically on both sides.
  *
  * Restrictions (always explicit, decoder returns None): long blocks
  * only (window_switching_flag = 0), main_data_begin = 0 (no bit
  * reservoir — spec-legal framing every conformant decoder must
  * accept), LR stereo or mono (no joint stereo), preflag = 0.
  *
  * The encoder exists to certify the decoder (q146, Mp3L3Spec): planted
  * tones round-trip under an SNR gate. The non-ESC quantization target
  * caps |ix| around the derived code's sweet spot, giving a measured
  * tone SNR well above the 25 dB gate (lower than Layer I/II's 40 dB —
  * Layer III at this profile spends its bits on frequency resolution,
  * not amplitude resolution).
  */
object Mp3L3 {

  /** Layer III bitrates, kbit/s (header table 2.4.2.3). */
  private[multimodal] val Bitrates = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
    160, 192, 224, 256, 320)

  /** scalefac_compress → (slen1 for sfb 0-10, slen2 for sfb 11-20)
    * (§2.4.2.7 — a 16-row printed pair table, embedded like Layer II's
    * allocation ladders). */
  private val Slen1 = Array(0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4)
  private val Slen2 = Array(0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3)

  /** DERIVED scalefactor-band widths (deviation 2): 21 scaled bands +
    * the unscaled top band, near-exponential, Σ = 576. */
  private[multimodal] val SfbWidths = Array(4, 4, 4, 4, 4, 4, 6, 6, 8, 8,
    10, 12, 16, 20, 24, 28, 34, 42, 50, 54, 76, 158)
  /** Cumulative band edges: SfbEdge(b) = first line of band b. */
  private[multimodal] val SfbEdge: Array[Int] = SfbWidths.scanLeft(0)(_ + _)
  require(SfbEdge.last == 576)
  private def bandOfLine(i: Int): Int = {
    var b = 0
    while (b < 21 && SfbEdge(b + 1) <= i) b += 1
    b // 21 = the unscaled top band
  }
  private val BandOf: Array[Int] = Array.tabulate(576)(bandOfLine)

  /** ESC-family linbits by table id 16-23 (deviation 1). */
  private val Linbits = Array(1, 2, 3, 4, 6, 8, 10, 13)

  /** Aliasing-reduction coefficients (§2.4.3.4.10.1). */
  private val Ci = Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041,
    -0.0142, -0.0037)
  private val Cs = Ci.map(c => 1.0 / math.sqrt(1.0 + c * c))
  private val Ca = Ci.indices.map(i => Ci(i) * Cs(i)).toArray

  /** Long-block sine window and the 36×18 MDCT kernel. */
  private val Win = Array.tabulate(36)(n => math.sin(math.Pi / 36 * (n + 0.5)))
  private val Cos = Array.tabulate(36, 18)((n, k) =>
    math.cos(math.Pi / 72.0 * (2 * n + 1 + 18) * (2 * k + 1)))

  /** Forward MDCT: 36 windowed inputs (18 previous + 18 current subband
    * samples) → 18 lines. */
  private def mdct(prev: Array[Double], cur: Array[Double]): Array[Double] = {
    val z = new Array[Double](36)
    var n = 0
    while (n < 18) { z(n) = prev(n) * Win(n); n += 1 }
    while (n < 36) { z(n) = cur(n - 18) * Win(n); n += 1 }
    val out = new Array[Double](18)
    var k = 0
    while (k < 18) {
      var s = 0.0; var m = 0
      while (m < 36) { s += z(m) * Cos(m)(k); m += 1 }
      out(k) = s; k += 1
    }
    out
  }

  /** IMDCT (scale 4/36 for TDAC unity through the sine-window OLA) →
    * 36 windowed outputs; caller overlap-adds halves. */
  private def imdct(x: Array[Double]): Array[Double] = {
    val out = new Array[Double](36)
    var n = 0
    while (n < 36) {
      var s = 0.0; var k = 0
      while (k < 18) { s += x(k) * Cos(n)(k); k += 1 }
      out(n) = s * (4.0 / 36.0) * Win(n); n += 1
    }
    out
  }

  def isMp3L3(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xf0) == 0xf0 &&
      ((bytes(1) >> 3) & 1) == 1 && // MPEG-1
      ((bytes(1) >> 1) & 3) == 1 && // Layer III
      ((bytes(2) >> 4) & 0xf) != 0 && ((bytes(2) >> 4) & 0xf) != 15 &&
      ((bytes(2) >> 2) & 3) != 3

  // ------------------------------------------------------------ encode

  /** One granule-channel's quantized form. */
  private final case class GrPlan(globalGain: Int, scf: Array[Int],
      ix: Array[Int], bigValues: Int, count1: Int, tableId: Int,
      part3Bits: Int) {
    /** part2 (always-transmitted scalefactors at compress=15) + part3. */
    def part23: Int = 11 * 4 + 10 * 3 + part3Bits
  }

  /** Unary-ESC cost of one big-value component. */
  private def compBits(v: Int, linbits: Int): Int = {
    val base = if (v >= 15) 16 + linbits else v + 1
    base + (if (v != 0) 1 else 0) // sign bit
  }

  /** Quantize one granule-channel of 576 (alias-inverted) lines with
    * peak-|ix| target `v`. */
  private def quantizeGr(xr: Array[Double], v: Int): GrPlan = {
    var peak = 0.0
    var i = 0
    while (i < 576) { peak = math.max(peak, math.abs(xr(i))); i += 1 }
    if (peak <= 0.0)
      return GrPlan(0, new Array[Int](21), new Array[Int](576), 0, 0, 16, 0)
    // global gain: peak maps to ix ≈ v with scalefac 0 in its band
    val aBase = peak / math.pow(v.toDouble, 4.0 / 3.0)
    val gg = math.max(0, math.min(255,
      math.round(210.0 + 4.0 * math.log(aBase) / math.log(2.0)).toInt))
    val a0 = math.pow(2.0, (gg - 210) / 4.0)
    // per-band boost (scalefac_scale=1 → decoder multiplies 2^{−sf}):
    // HALF the band's deficit below the granule peak — quiet bands get
    // finer steps (their quantization noise drops with their signal)
    // without being driven to full-precision codes, whose near-linear
    // derived-code cost would explode the bit budget on leakage lines
    val scf = new Array[Int](21)
    var b = 0
    while (b < 21) {
      var pb = 0.0
      var j = SfbEdge(b)
      while (j < SfbEdge(b + 1)) { pb = math.max(pb, math.abs(xr(j))); j += 1 }
      if (pb > 0.0) {
        val deficit = math.log(peak / pb) / math.log(2.0)
        val sf = math.floor(deficit / 2.0).toInt
        scf(b) = math.max(0, math.min(if (b <= 10) 15 else 7, sf))
      }
      b += 1
    }
    val ix = new Array[Int](576)
    i = 0
    while (i < 576) {
      val band = BandOf(i)
      val ab = if (band < 21) a0 * math.pow(2.0, -scf(band)) else a0
      val q = math.round(math.pow(math.abs(xr(i)) / ab, 0.75)).toInt
      ix(i) = math.min(15 + (1 << 13) - 1, q) * (if (xr(i) < 0) -1 else 1)
      i += 1
    }
    // partition from the top: rzero pairs, then count1 quadruples
    // (|ix| ≤ 1), then big_values pairs
    var end = 576
    while (end > 1 && ix(end - 1) == 0 && ix(end - 2) == 0) end -= 2
    var c1start = end
    while (c1start >= 4 && math.abs(ix(c1start - 1)) <= 1 &&
        math.abs(ix(c1start - 2)) <= 1 && math.abs(ix(c1start - 3)) <= 1 &&
        math.abs(ix(c1start - 4)) <= 1) c1start -= 4
    if (c1start % 2 != 0) c1start += 1 // big-value region holds whole pairs
    val bigValues = c1start / 2
    val count1 = (end - c1start) / 4
    // table id: smallest linbits holding (max − 15)
    var mx = 0
    i = 0
    while (i < c1start) { mx = math.max(mx, math.abs(ix(i))); i += 1 }
    val lbNeed = if (mx <= 15) 0
      else 32 - Integer.numberOfLeadingZeros(mx - 15)
    val lbIdx = Linbits.indexWhere(_ >= math.max(1, lbNeed))
    require(lbIdx >= 0, s"big value $mx exceeds the 13-linbit cap")
    val lb = Linbits(lbIdx)
    var bits = 0
    i = 0
    while (i < c1start) { bits += compBits(math.abs(ix(i)), lb); i += 1 }
    i = c1start
    while (i < end) {
      bits += 4
      var j = 0
      while (j < 4) { if (ix(i + j) != 0) bits += 1; j += 1 }
      i += 4
    }
    GrPlan(gg, scf, ix, bigValues, count1, 16 + lbIdx, bits)
  }

  /** Encode mono or stereo PCM16 at 32/44.1/48 kHz. `v` is the peak
    * quantized-magnitude target (precision/bits tradeoff); granules that
    * would overflow part2_3_length degrade themselves by halving it. */
  def encode(sampleRate: Int, channels: Array[Array[Int]], v: Int = 90): Array[Byte] = {
    val rateIdx = Mp3.Rates.indexOf(sampleRate)
    require(rateIdx >= 0, s"unsupported rate $sampleRate")
    require(v >= 1 && v <= 8000, s"target v=$v out of range")
    val nch = channels.length
    require(nch == 1 || nch == 2, "mono or stereo only")
    require(nch == 1 || channels(0).length == channels(1).length)
    val nIn = channels(0).length
    // delay: 481 (polyphase round trip) + 576 (MDCT overlap-add half
    // window: 18 subband samples × 32) — pad so the whole input emerges
    val nFrames = math.max(1, (nIn + 1057 + 1151) / 1152)
    val nGr = nFrames * 2
    val pcm = Array.tabulate(nch) { c =>
      val a = new Array[Double](nFrames * 1152)
      var i = 0
      while (i < nIn) { a(i) = channels(c)(i) / 32768.0; i += 1 }
      a
    }
    val analyzers = Array.fill(nch)(new Mp3.Analyzer)
    val prevSb = Array.fill(nch, 32)(new Array[Double](18))

    // per granule-channel: analysis → freq inversion → MDCT → inverse
    // alias butterflies; the spectra are fixed, quantization retries on
    // them without re-running the filterbank
    val spectra = Array.tabulate(nGr, nch) { (g, c) =>
      val sb = Array.ofDim[Double](32, 18) // [subband][time]
      var t = 0
      while (t < 18) {
        val out = analyzers(c).push(pcm(c), g * 576 + t * 32)
        var s = 0
        while (s < 32) {
          sb(s)(t) = if (s % 2 == 1 && t % 2 == 1) -out(s) else out(s)
          s += 1
        }
        t += 1
      }
      val xr = new Array[Double](576)
      var s = 0
      while (s < 32) {
        val lines = mdct(prevSb(c)(s), sb(s))
        System.arraycopy(lines, 0, xr, s * 18, 18)
        prevSb(c)(s) = sb(s)
        s += 1
      }
      // inverse butterflies (transpose of the decoder's rotation)
      var sbb = 1
      while (sbb < 32) {
        var i = 0
        while (i < 8) {
          val lo = 18 * sbb - 1 - i; val hi = 18 * sbb + i
          val a = xr(lo); val b = xr(hi)
          xr(lo) = a * Cs(i) - b * Ca(i)
          xr(hi) = b * Cs(i) + a * Ca(i)
          i += 1
        }
        sbb += 1
      }
      xr
    }

    // degrade ladder: per-granule the part2_3_length cap, then globally
    // the best standard bitrate — if even 320 kbps cannot hold the worst
    // frame at this precision target, halve the target and replan
    val sideBits = if (nch == 1) 136 else 256
    var vTry = v
    var plans: Array[Array[GrPlan]] = null
    var brIdx = -1
    while (brIdx < 0) {
      plans = Array.tabulate(nGr, nch) { (g, c) =>
        var vv = vTry
        var p = quantizeGr(spectra(g)(c), vv)
        while (p.part23 > 4095 && vv > 1) {
          vv = math.max(1, vv / 2); p = quantizeGr(spectra(g)(c), vv)
        }
        require(p.part23 <= 4095, "granule will not fit part2_3_length")
        p
      }
      val worst = (0 until nFrames).map { f =>
        32 + sideBits +
          (0 until nch).map(c =>
            plans(2 * f)(c).part23 + plans(2 * f + 1)(c).part23).sum
      }.max
      brIdx = (1 until 15).find(bi =>
        (144 * Bitrates(bi) * 1000 / sampleRate) * 8 >= worst).getOrElse(-1)
      if (brIdx < 0) {
        require(vTry > 1,
          s"frame needs $worst bits at v=1 — no Layer III bitrate fits")
        vTry = math.max(1, vTry / 2)
      }
    }
    val slotBytes = 144 * Bitrates(brIdx) * 1000 / sampleRate

    val w = new Mp3.BitWriter
    for (f <- 0 until nFrames) {
      val start = w.size
      w.write(0xfff, 12); w.write(1, 1); w.write(1, 2); w.write(1, 1)
      w.write(brIdx, 4); w.write(rateIdx, 2); w.write(0, 1); w.write(0, 1)
      w.write(if (nch == 1) 3 else 0, 2); w.write(0, 2)
      w.write(0, 1); w.write(0, 1); w.write(0, 2)
      // side info: no bit reservoir, no scalefactor sharing
      w.write(0, 9) // main_data_begin
      w.write(0, if (nch == 1) 5 else 3) // private_bits
      for (_ <- 0 until nch) w.write(0, 4) // scfsi
      for (g <- 0 until 2; c <- 0 until nch) {
        val p = plans(2 * f + g)(c)
        w.write(p.part23, 12)
        w.write(p.bigValues, 9)
        w.write(p.globalGain, 8)
        w.write(15, 4) // scalefac_compress: slen1=4, slen2=3
        w.write(0, 1) // window_switching_flag: long blocks
        w.write(p.tableId, 5); w.write(p.tableId, 5); w.write(p.tableId, 5)
        w.write(4, 4); w.write(3, 3) // region0/1_count (any legal split)
        w.write(0, 1) // preflag
        w.write(1, 1) // scalefac_scale → multiplier 1
        w.write(1, 1) // count1table_select: the flat 4-bit table
      }
      // main data
      for (g <- 0 until 2; c <- 0 until nch) {
        val p = plans(2 * f + g)(c)
        var b = 0
        while (b < 21) { w.write(p.scf(b), if (b <= 10) 4 else 3); b += 1 }
        val lb = Linbits(p.tableId - 16)
        var i = 0
        while (i < p.bigValues * 2) {
          val av = math.abs(p.ix(i))
          if (av >= 15) {
            w.write((1 << 15) - 1, 15); w.write(0, 1) // 15 ones + stop
            w.write(av - 15, lb)
          } else w.write(((1 << av) - 1) << 1, av + 1) // av ones + stop
          if (av != 0) w.write(if (p.ix(i) < 0) 1 else 0, 1)
          i += 1
        }
        i = p.bigValues * 2
        val c1end = p.bigValues * 2 + p.count1 * 4
        while (i < c1end) {
          var j = 0
          while (j < 4) { w.write(math.abs(p.ix(i + j)), 1); j += 1 }
          j = 0
          while (j < 4) {
            if (p.ix(i + j) != 0) w.write(if (p.ix(i + j) < 0) 1 else 0, 1)
            j += 1
          }
          i += 4
        }
      }
      w.padToByte()
      w.padZeroBytes(start + slotBytes - w.size)
    }
    w.result()
  }

  // ------------------------------------------------------------ decode

  private final case class SideGr(part23: Int, bigValues: Int,
      globalGain: Int, scalefacCompress: Int, tableSelect: Array[Int],
      region0: Int, region1: Int, scalefacScale: Int, count1Table: Int)

  /** Counting reader: part2_3_length is a BIT budget per granule-channel
    * and the stuffing skip needs exact consumption accounting. */
  private final class CountingReader(r: Mp3.BitReader) {
    var consumed = 0
    def read(n: Int): Int = { consumed += n; r.read(n) }
  }

  /** Decode a Layer III stream; None on anything malformed or outside
    * the documented profile (bit reservoir, joint stereo, short blocks,
    * preflag, non-derived table ids). */
  def decode(bytes: Array[Byte]): Option[Mp3.Decoded] = {
    if (!isMp3L3(bytes)) return None
    try {
      val MaxTotalSamples = 1L << 27
      var p = 0
      var rate = -1; var nch = -1
      var out: Array[IntVec] = null
      var synths: Array[Mp3.Synthesizer] = null
      var overlap: Array[Array[Array[Double]]] = null // [ch][sb][18]
      while (p + 4 <= bytes.length &&
          (bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xf0) == 0xf0) {
        val b1 = bytes(p + 1) & 0xff; val b2 = bytes(p + 2) & 0xff
        val b3 = bytes(p + 3) & 0xff
        if (((b1 >> 3) & 1) != 1 || ((b1 >> 1) & 3) != 1) return None
        val protection = b1 & 1
        val brIdx = (b2 >> 4) & 0xf
        val rIdx = (b2 >> 2) & 3
        val padding = (b2 >> 1) & 1
        val mode = (b3 >> 6) & 3
        if (brIdx == 0 || brIdx == 15 || rIdx == 3) return None
        if (mode == 1) return None // joint stereo: unsupported
        val frameCh = if (mode == 3) 1 else 2
        if (rate < 0) {
          rate = Mp3.Rates(rIdx); nch = frameCh
          out = Array.fill(nch)(new IntVec())
          synths = Array.fill(nch)(new Mp3.Synthesizer)
          overlap = Array.fill(nch, 32)(new Array[Double](18))
        } else if (Mp3.Rates(rIdx) != rate || frameCh != nch) return None
        val slotBytes = 144 * Bitrates(brIdx) * 1000 / rate + padding
        if (p + slotBytes > bytes.length) return None
        if ((out(0).length + 1152L) * nch > MaxTotalSamples) return None

        val raw = new Mp3.BitReader(bytes,
          p + 4 + (if (protection == 0) 2 else 0))
        if (raw.read(9) != 0) return None // bit reservoir: unsupported
        raw.read(if (nch == 1) 5 else 3)
        val scfsi = Array.fill(nch)(Array.fill(4)(raw.read(1)))
        val side = Array.tabulate(2, nch) { (_, _) =>
          val part23 = raw.read(12)
          val bigValues = raw.read(9)
          val gg = raw.read(8)
          val sfc = raw.read(4)
          if (raw.read(1) != 0) return None // short blocks: unsupported
          val tabs = Array.fill(3)(raw.read(5))
          val r0 = raw.read(4); val r1 = raw.read(3)
          if (raw.read(1) != 0) return None // preflag: unsupported
          val sfs = raw.read(1)
          val c1t = raw.read(1)
          if (bigValues > 288) return None
          SideGr(part23, bigValues, gg, sfc, tabs, r0, r1, sfs, c1t)
        }
        val scf = Array.ofDim[Int](2, nch, 21)
        val pcmOut = Array.ofDim[Double](nch, 1152)
        for (g <- 0 until 2; c <- 0 until nch) {
          val s = side(g)(c)
          val cr = new CountingReader(raw)
          // part2: scalefactors (scfsi group sharing honored)
          val slen1 = Slen1(s.scalefacCompress)
          val slen2 = Slen2(s.scalefacCompress)
          var b = 0
          while (b < 21) {
            val group = if (b < 6) 0 else if (b < 11) 1
              else if (b < 16) 2 else 3
            val share = g == 1 && scfsi(c)(group) == 1
            if (share) scf(1)(c)(b) = scf(0)(c)(b)
            else scf(g)(c)(b) = cr.read(if (b <= 10) slen1 else slen2)
            b += 1
          }
          // part3: big values (derived unary-ESC family), count1, rzero
          val ix = new Array[Int](576)
          val nBig = s.bigValues * 2
          // region boundaries (checked for table-id consistency only —
          // all three selects must be in the derived family)
          for (t <- s.tableSelect)
            if (t != 0 && (t < 16 || t > 23)) return None
          var i = 0
          while (i < nBig) {
            val region = if (i < SfbEdge(math.min(21, s.region0 + 1))) 0
              else if (i < SfbEdge(math.min(21, s.region0 + 1 + s.region1 + 1))) 1
              else 2
            val tid = s.tableSelect(region)
            if (tid == 0) { ix(i) = 0 }
            else {
              val lb = Linbits(tid - 16)
              var v = 0
              while (v < 15 && cr.read(1) == 1) v += 1
              if (v == 15) {
                if (cr.read(1) != 0) return None // 16th one: malformed
                v += cr.read(lb)
              }
              if (v != 0 && cr.read(1) == 1) v = -v
              ix(i) = v
            }
            i += 1
          }
          if (s.count1Table != 1) return None // only the flat table
          while (cr.consumed < s.part23 && i + 3 < 576) {
            val q = cr.read(4)
            var j = 0
            while (j < 4) {
              var v = (q >> (3 - j)) & 1
              if (v != 0 && cr.read(1) == 1) v = -v
              ix(i + j) = v
              j += 1
            }
            i += 4
          }
          if (cr.consumed > s.part23) return None
          while (cr.consumed < s.part23) cr.read(1) // stuffing
          // requantize
          val mult = (s.scalefacScale + 1) / 2.0
          val xr = new Array[Double](576)
          i = 0
          while (i < 576) {
            if (ix(i) != 0) {
              val band = BandOf(i)
              val sf = if (band < 21) scf(g)(c)(band) else 0
              val mag = math.pow(math.abs(ix(i)).toDouble, 4.0 / 3.0) *
                math.pow(2.0, (s.globalGain - 210) / 4.0 - mult * sf)
              xr(i) = if (ix(i) < 0) -mag else mag
            }
            i += 1
          }
          // alias reduction
          var sbb = 1
          while (sbb < 32) {
            var k = 0
            while (k < 8) {
              val lo = 18 * sbb - 1 - k; val hi = 18 * sbb + k
              val a = xr(lo); val bb = xr(hi)
              xr(lo) = a * Cs(k) + bb * Ca(k)
              xr(hi) = bb * Cs(k) - a * Ca(k)
              k += 1
            }
            sbb += 1
          }
          // IMDCT + overlap-add, frequency inversion, synthesis
          val sbSamples = Array.ofDim[Double](18, 32) // [time][subband]
          var sb2 = 0
          while (sb2 < 32) {
            val lines = new Array[Double](18)
            System.arraycopy(xr, sb2 * 18, lines, 0, 18)
            val y = imdct(lines)
            var t = 0
            while (t < 18) {
              var vv = y(t) + overlap(c)(sb2)(t)
              overlap(c)(sb2)(t) = y(t + 18)
              if (sb2 % 2 == 1 && t % 2 == 1) vv = -vv
              sbSamples(t)(sb2) = vv
              t += 1
            }
            sb2 += 1
          }
          var t = 0
          while (t < 18) {
            synths(c).push(sbSamples(t), pcmOut(c), g * 576 + t * 32)
            t += 1
          }
        }
        for (c <- 0 until nch; i <- 0 until 1152) {
          val v = math.round(pcmOut(c)(i) * 32768.0).toInt
          out(c) += math.max(-32768, math.min(32767, v))
        }
        p += slotBytes
      }
      if (out == null || out(0).isEmpty || p != bytes.length) None
      else Some(Mp3.Decoded(rate, nch, 16, out.map(_.toArray)))
    } catch {
      case _: Exception => None
    }
  }
}
