package graft.multimodal

/** MPEG-1 Audio Layer II codec (ISO/IEC 11172-3 §2.4.1.6 / §2.4.2.4 /
  * §2.4.3.2), hand-rolled from the public spec on top of the Layer I
  * infrastructure in [[Mp3]] (shared 32-subband polyphase filterbank,
  * bit I/O, Table B.1 scalefactors).
  *
  * What Layer II adds over Layer I — all implemented here:
  *   - 1152-sample frames (36 subband samples = 12 granules of 3), 1-byte
  *     slots, frame length = 144·bitrate/rate bytes (§2.4.2.3).
  *   - Per-subband allocation codes of VARIABLE width (nbal = 4/4/3/2 by
  *     band group) indexing a ladder of quantization classes (§2.4.1.6).
  *   - Three scalefactors per frame (one per 12-sample part) compressed
  *     by 2-bit scfsi transmission patterns (§2.4.2.4: 0 → three, 1 →
  *     {0,1} share + {2}, 3 → {0} + {1,2} share, 2 → one for all).
  *   - GROUPED quantization: classes with 3/5/9 levels pack a granule's
  *     3 samples into one base-L code of 5/7/10 bits (3³ ≤ 2⁵, 5³ ≤ 2⁷,
  *     9³ ≤ 2¹⁰), first-in-time sample in the least-significant digit.
  *
  * Requantization constants are DERIVED, not transcribed: the spec's
  * s'' = C·(s''' + D) with s''' the MSB-inverted two's-complement
  * fraction of the raw code c reduces algebraically to
  * `decode(c, L) = (2c − (L−1)) / L` — a uniform midtread lattice over
  * the L steps. Solving the identity gives C = 2H/L and
  * D = 1 − (L−1)/(2H) with H = 2^(bits−1), which reproduces every row of
  * Table 3-B.4 to its printed precision (anchored in Mp2Spec). The
  * encoder inverts it: c = round((y/scf·L + L − 1)/2).
  *
  * All four rate-dependent allocation tables 3-B.2a–d are implemented
  * (sblimit 27/30/8/12; nbal and class-ladder shapes below) with the
  * spec's dispatch on sampling frequency × per-channel bitrate
  * (§2.4.2.2) applied identically on both sides — encoder and decoder
  * derive the table from the same header fields, so spec-legal
  * third-party streams at any rate/bitrate combination land on the
  * right table. Layer III's hybrid MDCT + Huffman stage remains out of
  * scope (see Multimodal).
  */
object Mp2 {

  /** Layer II bitrates, kbit/s (header table 2.4.2.3); index 0 = free. */
  private[multimodal] val Bitrates = Array(0, 32, 48, 56, 64, 80, 96, 112, 128,
    160, 192, 224, 256, 320, 384)

  /** One quantization class: L steps; grouped classes carry 3 samples in
    * one `bits`-wide code, ungrouped carry one sample per `bits`. */
  private[multimodal] final case class QClass(levels: Int, grouped: Boolean,
      bits: Int) {
    /** Granule cost: bits for one subband's 3 samples. */
    def granuleBits: Int = if (grouped) bits else 3 * bits
    /** Width of ONE sample's code: grouped classes unpack to base-L
      * digits whose notional code width is ceil(log2(L+1)). */
    private def sampleBits: Int =
      if (grouped) 32 - Integer.numberOfLeadingZeros(levels) else bits
    /** Derived Table 3-B.4 constants (see object scaladoc). */
    def cConst: Double = { val h = 1 << (sampleBits - 1); 2.0 * h / levels }
    def dConst: Double =
      { val h = 1 << (sampleBits - 1); 1.0 - (levels - 1.0) / (2 * h) }
  }
  private def ug(l: Int, b: Int) = QClass(l, grouped = false, b)
  private val G3 = QClass(3, grouped = true, 5)
  private val G5 = QClass(5, grouped = true, 7)
  private val G9 = QClass(9, grouped = true, 10)

  /** Class ladders per band group (alloc code 1.. → class); code 0 = no
    * allocation. Ladder lengths exactly fill the nbal code space. */
  private val LadderLow: Array[QClass] = // a/b subbands 0-2, nbal 4
    Array(G3, ug(7, 3), ug(15, 4), ug(31, 5), ug(63, 6), ug(127, 7),
      ug(255, 8), ug(511, 9), ug(1023, 10), ug(2047, 11), ug(4095, 12),
      ug(8191, 13), ug(16383, 14), ug(32767, 15), ug(65535, 16))
  private val LadderMid: Array[QClass] = // a/b subbands 3-10, nbal 4
    Array(G3, G5, ug(7, 3), G9, ug(15, 4), ug(31, 5), ug(63, 6),
      ug(127, 7), ug(255, 8), ug(511, 9), ug(1023, 10), ug(2047, 11),
      ug(4095, 12), ug(8191, 13), ug(65535, 16))
  private val LadderHigh: Array[QClass] = // a/b subbands 11-22, nbal 3
    Array(G3, G5, ug(7, 3), G9, ug(15, 4), ug(31, 5), ug(65535, 16))
  private val LadderTop: Array[QClass] = // a/b subbands 23-26/29, nbal 2
    Array(G3, G5, ug(65535, 16))
  // the low-bitrate tables c/d drop the 7-level class and the 16-bit
  // escape: every step is grouped-3/5/9 then the plain power ladder
  private val LadderLowCD: Array[QClass] = // c/d subbands 0-1, nbal 4
    Array(G3, G5, G9, ug(15, 4), ug(31, 5), ug(63, 6), ug(127, 7),
      ug(255, 8), ug(511, 9), ug(1023, 10), ug(2047, 11), ug(4095, 12),
      ug(8191, 13), ug(16383, 14), ug(32767, 15))
  private val LadderHighCD: Array[QClass] = // c/d subbands 2-7/11, nbal 3
    Array(G3, G5, G9, ug(15, 4), ug(31, 5), ug(63, 6), ug(127, 7))

  /** One of the four rate-dependent allocation tables 3-B.2a–d: the
    * coded bandwidth (sblimit), per-subband allocation-field width, and
    * per-subband quantization-class ladder. */
  private[multimodal] final case class AllocTable(name: String, sbLimit: Int,
      nbalBySb: Array[Int], ladders: Array[Array[QClass]]) {
    def nbal(sb: Int): Int = nbalBySb(sb)
    def ladder(sb: Int): Array[QClass] = ladders(sb)
  }
  private def abTable(name: String, sbLimit: Int) = AllocTable(name, sbLimit,
    Array.tabulate(sbLimit)(sb => if (sb < 11) 4 else if (sb < 23) 3 else 2),
    Array.tabulate(sbLimit)(sb =>
      if (sb < 3) LadderLow else if (sb < 11) LadderMid
      else if (sb < 23) LadderHigh else LadderTop))
  private def cdTable(name: String, sbLimit: Int) = AllocTable(name, sbLimit,
    Array.tabulate(sbLimit)(sb => if (sb < 2) 4 else 3),
    Array.tabulate(sbLimit)(sb =>
      if (sb < 2) LadderLowCD else LadderHighCD))
  private[multimodal] val TableA = abTable("3-B.2a", 27)
  private[multimodal] val TableB = abTable("3-B.2b", 30)
  private[multimodal] val TableC = cdTable("3-B.2c", 8)
  private[multimodal] val TableD = cdTable("3-B.2d", 12)

  /** Table dispatch (§2.4.2.2): selected by sampling frequency and
    * bitrate PER CHANNEL — 48 kHz never uses b (its 27 subbands already
    * span 20.25 kHz); 32 kHz swaps c for d at the low rates (d's 12
    * subbands keep 6 kHz of its narrower spectrum). Encoder and decoder
    * derive the table from the same header fields, so the choice never
    * needs signaling. */
  private[multimodal] def allocTable(sampleRate: Int, bitrateKbps: Int,
      nch: Int): AllocTable = {
    val perCh = bitrateKbps / nch
    if (sampleRate == 48000) { if (perCh >= 56) TableA else TableC }
    else if (perCh >= 96) TableB
    else if (perCh >= 56) TableA
    else if (sampleRate == 32000) TableD
    else TableC
  }

  /** Uniform midtread requantization (≡ spec C·(s''' + D), see scaladoc):
    * raw code c of class L → value in (−1, 1). */
  private def dequant(c: Int, levels: Int): Double =
    (2.0 * c - (levels - 1)) / levels
  private def quant(y: Double, levels: Int): Int = {
    val c = math.round((y * levels + (levels - 1)) / 2.0).toInt
    math.max(0, math.min(levels - 1, c))
  }

  def isMp2(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xf0) == 0xf0 &&
      ((bytes(1) >> 3) & 1) == 1 && // MPEG-1
      ((bytes(1) >> 1) & 3) == 2 && // Layer II
      ((bytes(2) >> 4) & 0xf) != 0 && ((bytes(2) >> 4) & 0xf) != 15 &&
      ((bytes(2) >> 2) & 3) != 3

  /** Encode mono or stereo PCM16 at 32/44.1/48 kHz. `nb` steers the
    * per-subband resolution exactly like Layer I's encoder: the loudest
    * subband gets ~nb bits of resolution, quieter bands proportionally
    * fewer (floor 2 ≡ the 3-level class), digital silence gets
    * allocation 0 — then each target is snapped to the subband ladder's
    * smallest class of at least that resolution. The smallest standard
    * bitrate whose slot count fits the worst frame is selected. */
  def encode(sampleRate: Int, channels: Array[Array[Int]], nb: Int = 8): Array[Byte] = {
    val rateIdx = Mp3.Rates.indexOf(sampleRate)
    require(rateIdx >= 0, s"unsupported rate $sampleRate")
    require(nb >= 2 && nb <= 16, s"nb $nb out of Layer II range")
    val nch = channels.length
    require(nch == 1 || nch == 2, "mono or stereo only")
    require(nch == 1 || channels(0).length == channels(1).length)
    val nIn = channels(0).length
    // pad past the filterbank's 481-sample delay so the whole input
    // emerges from the decoder
    val nFrames = math.max(1, (nIn + 481 + 1151) / 1152)
    val pcm = Array.tabulate(nch) { c =>
      val a = new Array[Double](nFrames * 1152)
      var i = 0
      while (i < nIn) { a(i) = channels(c)(i) / 32768.0; i += 1 }
      a
    }
    val analyzers = Array.fill(nch)(new Mp3.Analyzer)
    // per frame: 36 subband-sample times × ch × 32 subbands
    val frames = Array.tabulate(nFrames) { f =>
      Array.tabulate(36) { t =>
        Array.tabulate(nch)(c => analyzers(c).push(pcm(c), f * 1152 + t * 32))
      }
    }

    case class Plan(cls: Array[Array[Int]], // alloc code per (ch, sb); 0 = off
        scf: Array[Array[Array[Int]]], // (ch, sb, part 0-2)
        scfsi: Array[Array[Int]], bits: Int)
    def plansUnder(tab: AllocTable, nbEff: Int): Array[Plan] = frames.map { fr =>
      val SbLimit = tab.sbLimit
      def nbal(sb: Int) = tab.nbal(sb)
      def ladder(sb: Int) = tab.ladder(sb)
      val alloc = Array.ofDim[Int](nch, SbLimit)
      val scf = Array.ofDim[Int](nch, SbLimit, 3)
      val scfsi = Array.ofDim[Int](nch, SbLimit)
      var bits = 32
      for (sb <- 0 until SbLimit) bits += nbal(sb) * nch
      var framePeak = 0.0
      for (t <- 0 until 36; c <- 0 until nch; sb <- 0 until SbLimit)
        framePeak = math.max(framePeak, math.abs(fr(t)(c)(sb)))
      for (c <- 0 until nch; sb <- 0 until SbLimit) {
        var peak = 0.0
        var t = 0
        while (t < 36) { peak = math.max(peak, math.abs(fr(t)(c)(sb))); t += 1 }
        val deficit = if (peak <= 0.0) Int.MaxValue
          else math.floor(math.log(framePeak / peak) / math.log(2.0)).toInt
        if (peak >= 1e-9 && deficit <= 16) {
          // cap at 15: log2(65535) ≈ 16 − ε, so a 16-bit ask would walk
          // past the top class the 1e-9 slack is meant to admit
          val want = math.max(2, math.min(15, nbEff - math.max(0, deficit)))
          val lad = ladder(sb)
          // smallest class with ≥ want bits of resolution (log2 levels) —
          // but the short ladders jump straight from 31 levels to the
          // 16-bit escape class, and escaping a 6-bit ask to 16 bits
          // triples the subband's cost for inaudible gain, so when the
          // snap overshoots by > 4 bits settle for the class just below
          // (the standard encoder tradeoff on tables with escape gaps)
          def res(q: QClass): Double =
            math.log(q.levels.toDouble) / math.log(2.0)
          var code = 1
          while (code < lad.length && res(lad(code - 1)) < want - 1e-9)
            code += 1
          code = math.min(code, lad.length)
          if (code > 1 && res(lad(code - 1)) > want + 4) code -= 1
          alloc(c)(sb) = code
          // per-part scalefactors (12-sample parts) + scfsi compression
          for (p <- 0 until 3) {
            var pk = 0.0
            var tt = 12 * p
            while (tt < 12 * (p + 1)) {
              pk = math.max(pk, math.abs(fr(tt)(c)(sb))); tt += 1
            }
            val idx = if (pk <= 0.0) 62
              else math.floor(3.0 * (math.log(2.0 / pk) / math.log(2.0))).toInt
            scf(c)(sb)(p) = math.max(0, math.min(62, idx))
          }
          val s0 = scf(c)(sb)(0); val s1 = scf(c)(sb)(1)
          val s2 = scf(c)(sb)(2)
          scfsi(c)(sb) =
            if (s0 == s1 && s1 == s2) 2
            else if (s0 == s1) 1
            else if (s1 == s2) 3
            else 0
          val nScf = scfsi(c)(sb) match {
            case 2 => 1
            case 0 => 3
            case _ => 2
          }
          bits += 2 + 6 * nScf + 12 * ladder(sb)(alloc(c)(sb) - 1).granuleBits
        }
      }
      Plan(alloc, scf, scfsi, bits)
    }
    // bitrate and allocation table co-determine each other (§2.4.2.2):
    // walk the standard bitrates ascending, plan under each candidate's
    // table (memoized — at most three distinct tables per rate), take the
    // first whose slot count fits its own worst frame. The walk is
    // restricted to spec-legal (bitrate, mode) pairs (table 2.4.2.3's
    // mode column): 32/48/56/80 kbps are single-channel only, and
    // 224-384 kbps exist only for the two-channel modes — an illegal
    // pair would make allocTable dispatch on per-channel rates the
    // 3-B.2 matrix never defines, and conformant third-party decoders
    // may reject such streams
    def modeLegal(kbps: Int): Boolean =
      if (nch == 2) kbps >= 64 && kbps != 80 else kbps <= 192
    // the legal ceiling (192 mono / 384 stereo) may be below what the
    // requested nb demands on dense content — degrade nb until a legal
    // bitrate fits rather than emit a spec-illegal (bitrate, mode) pair
    val planCache = scala.collection.mutable.Map.empty[(String, Int), Array[Plan]]
    val (brIdx, table, plans) = (nb to 2 by -1).iterator.flatMap { nbEff =>
      (1 until 15).iterator
        .filter(bi => modeLegal(Bitrates(bi))).map { bi =>
          val tab = allocTable(sampleRate, Bitrates(bi), nch)
          (bi, tab,
            planCache.getOrElseUpdate((tab.name, nbEff), plansUnder(tab, nbEff)))
        }.find { case (bi, _, ps) =>
          (144 * Bitrates(bi) * 1000 / sampleRate) * 8 >= ps.map(_.bits).max
        }
    }.nextOption().getOrElse(throw new IllegalArgumentException(
      "no Layer II bitrate fits the worst frame even at nb=2"))
    val slotBytes = 144 * Bitrates(brIdx) * 1000 / sampleRate

    val w = new Mp3.BitWriter
    for (f <- 0 until nFrames) {
      val SbLimit = table.sbLimit
      def nbal(sb: Int) = table.nbal(sb)
      def ladder(sb: Int) = table.ladder(sb)
      val start = w.size
      val p = plans(f)
      w.write(0xfff, 12); w.write(1, 1); w.write(2, 2); w.write(1, 1)
      w.write(brIdx, 4); w.write(rateIdx, 2); w.write(0, 1); w.write(0, 1)
      w.write(if (nch == 1) 3 else 0, 2); w.write(0, 2)
      w.write(0, 1); w.write(0, 1); w.write(0, 2)
      for (sb <- 0 until SbLimit; c <- 0 until nch)
        w.write(p.cls(c)(sb), nbal(sb))
      for (sb <- 0 until SbLimit; c <- 0 until nch if p.cls(c)(sb) != 0)
        w.write(p.scfsi(c)(sb), 2)
      for (sb <- 0 until SbLimit; c <- 0 until nch if p.cls(c)(sb) != 0) {
        val sf = p.scf(c)(sb)
        p.scfsi(c)(sb) match {
          case 0 => w.write(sf(0), 6); w.write(sf(1), 6); w.write(sf(2), 6)
          case 1 => w.write(sf(0), 6); w.write(sf(2), 6)
          case 2 => w.write(sf(0), 6)
          case 3 => w.write(sf(0), 6); w.write(sf(1), 6)
        }
      }
      for (g <- 0 until 12; sb <- 0 until SbLimit; c <- 0 until nch
          if p.cls(c)(sb) != 0) {
        val cls = ladder(sb)(p.cls(c)(sb) - 1)
        val sfv = Mp3.sfVal(p.scf(c)(sb)(g / 4))
        val codes = Array.tabulate(3) { i =>
          quant(frames(f)(3 * g + i)(c)(sb) / sfv, cls.levels)
        }
        if (cls.grouped)
          // first-in-time sample in the least-significant base-L digit
          w.write(codes(0) + cls.levels * (codes(1) + cls.levels * codes(2)),
            cls.bits)
        else { w.write(codes(0), cls.bits); w.write(codes(1), cls.bits)
          w.write(codes(2), cls.bits) }
      }
      w.padToByte()
      w.padZeroBytes(start + slotBytes - w.size)
    }
    w.result()
  }

  /** Decode a Layer II stream; None on anything malformed (bad sync,
    * forbidden scalefactor 63, joint-stereo frames, codes past the
    * payload, trailing non-frame bytes, or streams past the allocation
    * cap shared with the other codecs). */
  def decode(bytes: Array[Byte]): Option[Mp3.Decoded] = {
    if (!isMp2(bytes)) return None
    try {
      val MaxTotalSamples = 1L << 27
      var p = 0
      var rate = -1; var nch = -1
      var out: Array[IntVec] = null
      var synths: Array[Mp3.Synthesizer] = null
      while (p + 4 <= bytes.length &&
          (bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xf0) == 0xf0) {
        val b1 = bytes(p + 1) & 0xff; val b2 = bytes(p + 2) & 0xff
        val b3 = bytes(p + 3) & 0xff
        if (((b1 >> 3) & 1) != 1 || ((b1 >> 1) & 3) != 2) return None
        val protection = b1 & 1
        val brIdx = (b2 >> 4) & 0xf
        val rIdx = (b2 >> 2) & 3
        val padding = (b2 >> 1) & 1
        val mode = (b3 >> 6) & 3
        if (brIdx == 0 || brIdx == 15 || rIdx == 3) return None
        if (mode == 1) return None // intensity joint stereo: unsupported
        val frameCh = if (mode == 3) 1 else 2
        if (rate < 0) {
          rate = Mp3.Rates(rIdx); nch = frameCh
          out = Array.fill(nch)(new IntVec())
          synths = Array.fill(nch)(new Mp3.Synthesizer)
        } else if (Mp3.Rates(rIdx) != rate || frameCh != nch) return None
        val slotBytes = 144 * Bitrates(brIdx) * 1000 / rate + padding
        if (p + slotBytes > bytes.length) return None
        if ((out(0).length + 1152L) * nch > MaxTotalSamples) return None

        // the table is a pure function of the header fields the encoder
        // also sees, so per-frame (VBR-legal) dispatch needs no signaling
        val table = allocTable(rate, Bitrates(brIdx), nch)
        val SbLimit = table.sbLimit
        def nbal(sb: Int) = table.nbal(sb)
        def ladder(sb: Int) = table.ladder(sb)
        val r = new Mp3.BitReader(bytes, p + 4 + (if (protection == 0) 2 else 0))
        val alloc = Array.ofDim[Int](nch, SbLimit)
        val scfsi = Array.ofDim[Int](nch, SbLimit)
        val scf = Array.ofDim[Int](nch, SbLimit, 3)
        for (sb <- 0 until SbLimit; c <- 0 until nch)
          alloc(c)(sb) = r.read(nbal(sb))
        for (sb <- 0 until SbLimit; c <- 0 until nch if alloc(c)(sb) != 0)
          scfsi(c)(sb) = r.read(2)
        for (sb <- 0 until SbLimit; c <- 0 until nch if alloc(c)(sb) != 0) {
          def s6(): Int = {
            val s = r.read(6)
            if (s == 63) throw new IllegalArgumentException("scf 63")
            s
          }
          scfsi(c)(sb) match {
            case 0 =>
              scf(c)(sb)(0) = s6(); scf(c)(sb)(1) = s6(); scf(c)(sb)(2) = s6()
            case 1 =>
              val a = s6(); val b = s6()
              scf(c)(sb)(0) = a; scf(c)(sb)(1) = a; scf(c)(sb)(2) = b
            case 2 =>
              val a = s6()
              scf(c)(sb)(0) = a; scf(c)(sb)(1) = a; scf(c)(sb)(2) = a
            case 3 =>
              val a = s6(); val b = s6()
              scf(c)(sb)(0) = a; scf(c)(sb)(1) = b; scf(c)(sb)(2) = b
          }
        }
        // 12 granules × 3 samples → 36 subband-sample times
        val sbS = Array.ofDim[Double](nch, 36, 32)
        for (g <- 0 until 12; sb <- 0 until SbLimit; c <- 0 until nch
            if alloc(c)(sb) != 0) {
          val cls = ladder(sb)(alloc(c)(sb) - 1)
          val sfv = Mp3.sfVal(scf(c)(sb)(g / 4))
          if (cls.grouped) {
            var v = r.read(cls.bits)
            var i = 0
            while (i < 3) {
              sbS(c)(3 * g + i)(sb) = dequant(v % cls.levels, cls.levels) * sfv
              v /= cls.levels
              i += 1
            }
          } else {
            var i = 0
            while (i < 3) {
              sbS(c)(3 * g + i)(sb) =
                dequant(r.read(cls.bits), cls.levels) * sfv
              i += 1
            }
          }
        }
        // a frame whose allocation demands more bits than its slot holds
        // is malformed — without this bound the reader would silently
        // consume the NEXT frame's bytes as sample data
        if (r.bytesConsumedTo > p + slotBytes) return None
        val pcm = Array.ofDim[Double](nch, 1152)
        for (c <- 0 until nch; t <- 0 until 36)
          synths(c).push(sbS(c)(t), pcm(c), t * 32)
        for (c <- 0 until nch; i <- 0 until 1152) {
          val v = math.round(pcm(c)(i) * 32768.0).toInt
          out(c) += math.max(-32768, math.min(32767, v))
        }
        p += slotBytes
      }
      // trailing garbage is malformed, not silently-ignored partial audio
      if (out == null || out(0).isEmpty || p != bytes.length) None
      else Some(Mp3.Decoded(rate, nch, 16, out.map(_.toArray)))
    } catch {
      case _: Exception => None // truncation/corruption, like the others
    }
  }
}
