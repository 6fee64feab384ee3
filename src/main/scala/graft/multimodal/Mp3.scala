package graft.multimodal

/** MPEG-1 Audio Layer I codec (ISO/IEC 11172-3), hand-rolled from the
  * public spec: frame header (2.4.1.3), bit allocation / scalefactors /
  * sample packing (2.4.1.5-2.4.2.1), requantization (2.4.3.2) and the
  * 32-subband polyphase filterbank (2.4.2.2 analysis, Annex A synthesis).
  *
  * One documented deviation: the 512-tap prototype windows are the
  * numerically derived pair in [[Mp3Windows]], NOT the ISO Table 3-B.3
  * constants (which are lookup data, not derivable). Bitstream layout and
  * requantization are spec-exact; reconstruction through our own window
  * pair carries a ~51 dB filterbank bound (held-out measurement in
  * Mp3Windows) — above Layer I's default 8-bit quantization noise, below
  * ISO-window fidelity. Layer II/III (grouped quantization tables /
  * hybrid MDCT) remain out of scope — see Multimodal's stub note.
  *
  * Like [[Flac]]/[[Jpeg]]/[[Png]], the encoder exists to certify the
  * decoder: planted tones round-trip under an SNR gate (q120, Mp3Spec).
  */
object Mp3 {

  final case class Decoded(sampleRate: Int, channels: Int,
      bitsPerSample: Int, samples: Array[Array[Int]])

  private[multimodal] val Rates = Array(44100, 48000, 32000)
  /** Layer I bitrates, kbit/s (header table 2.4.2.3); index 0 = free. */
  private[multimodal] val Bitrates = Array(0, 32, 64, 96, 128, 160, 192, 224,
    256, 288, 320, 352, 384, 416, 448)
  /** Table B.1 scalefactors: idx 0..62 → 2·2^(−idx/3). */
  private[multimodal] def sfVal(idx: Int): Double = 2.0 * math.pow(2.0, -idx / 3.0)

  private val AnaM = Array.tabulate(32, 64)((k, j) =>
    math.cos((2 * k + 1) * (j - 16) * math.Pi / 64))
  private val SynM = Array.tabulate(64, 32)((i, k) =>
    math.cos((16 + i) * (2 * k + 1) * math.Pi / 64))

  /** 2.4.2.2 analysis dataflow: 512-sample FIFO (newest first), windowed
    * 8-fold partial sums, 32×64 matrixing. One call = 32 input samples →
    * 32 subband samples. */
  private[multimodal] final class Analyzer {
    private val fifo = new Array[Double](512)
    def push(x: Array[Double], off: Int): Array[Double] = {
      System.arraycopy(fifo, 0, fifo, 32, 480)
      var i = 0
      while (i < 32) { fifo(i) = x(off + 31 - i); i += 1 }
      val y = new Array[Double](64)
      var j = 0
      while (j < 64) {
        var s = 0.0; var m = 0
        while (m < 8) {
          s += Mp3Windows.AnaWin(j + 64 * m) * fifo(j + 64 * m); m += 1
        }
        y(j) = s; j += 1
      }
      val out = new Array[Double](32)
      var k = 0
      while (k < 32) {
        var s = 0.0; var jj = 0
        while (jj < 64) { s += AnaM(k)(jj) * y(jj); jj += 1 }
        out(k) = s; k += 1
      }
      out
    }
  }

  /** Annex A synthesis dataflow: 1024-sample V FIFO, 64×32 matrixing,
    * U remap, windowed 16-fold sums. One call = 32 subband samples →
    * 32 PCM samples at `out(off)`. */
  private[multimodal] final class Synthesizer {
    private val v = new Array[Double](1024)
    def push(sb: Array[Double], out: Array[Double], off: Int): Unit = {
      System.arraycopy(v, 0, v, 64, 960)
      var i = 0
      while (i < 64) {
        var s = 0.0; var k = 0
        while (k < 32) { s += SynM(i)(k) * sb(k); k += 1 }
        v(i) = s; i += 1
      }
      val u = new Array[Double](512)
      var m = 0
      while (m < 8) {
        var j = 0
        while (j < 32) {
          u(m * 64 + j) = v(m * 128 + j)
          u(m * 64 + 32 + j) = v(m * 128 + 96 + j)
          j += 1
        }
        m += 1
      }
      var j = 0
      while (j < 32) {
        var s = 0.0; var q = 0
        while (q < 16) { s += u(j + 32 * q) * Mp3Windows.SynWin(j + 32 * q); q += 1 }
        out(off + j) = s; j += 1
      }
    }
  }

  private[multimodal] final class BitWriter {
    private val buf = new scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0; private var nbits = 0
    def write(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1); nbits += 1
        if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def padToByte(): Unit = if (nbits > 0) write(0, 8 - nbits)
    def size: Int = buf.length
    def padZeroBytes(n: Int): Unit = { var i = 0; while (i < n) { buf += 0; i += 1 } }
    def result(): Array[Byte] = buf.toArray
  }

  private[multimodal] final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var bit = 0
    def read(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        v = (v << 1) | ((bytes(pos) >> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    /** First byte NOT fully consumed yet. */
    def bytesConsumedTo: Int = if (bit > 0) pos + 1 else pos
  }

  /** 2.4.3.2 Layer I requantization: code c of nb bits →
    * ((c/2^(nb−1)) − 1 + 2^(1−nb)) · 2^nb/(2^nb − 1), times scalefactor. */
  private def dequant(c: Int, nb: Int): Double = {
    val half = 1 << (nb - 1)
    ((c.toDouble / half) - 1.0 + 2.0 / (1 << nb)) *
      ((1 << nb).toDouble / ((1 << nb) - 1))
  }
  private def quant(y: Double, nb: Int): Int = {
    val half = 1 << (nb - 1)
    val yy = y * ((1 << nb) - 1).toDouble / (1 << nb) - 2.0 / (1 << nb) + 1.0
    math.max(0, math.min((1 << nb) - 1, math.round(yy * half).toInt))
  }

  def isMp3(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xf0) == 0xf0 &&
      ((bytes(1) >> 3) & 1) == 1 && // MPEG-1
      ((bytes(1) >> 1) & 3) == 3 && // Layer I
      ((bytes(2) >> 4) & 0xf) != 0 && ((bytes(2) >> 4) & 0xf) != 15 &&
      ((bytes(2) >> 2) & 3) != 3

  /** Encode mono or stereo PCM16 at 32/44.1/48 kHz; `nb` bits per sample
    * code (2..15, uniform over live subbands — silent subbands get
    * allocation 0). The smallest standard bitrate whose slot count fits
    * the worst frame is selected; every frame pads to exactly its slot
    * boundary so the decoder's slot arithmetic (not sync scanning) walks
    * the stream, matching conformant framing. */
  def encode(sampleRate: Int, channels: Array[Array[Int]], nb: Int = 8): Array[Byte] = {
    val rateIdx = Rates.indexOf(sampleRate)
    require(rateIdx >= 0, s"unsupported rate $sampleRate")
    require(nb >= 2 && nb <= 15, s"nb $nb out of Layer I range")
    val nch = channels.length
    require(nch == 1 || nch == 2, "mono or stereo only")
    require(nch == 1 || channels(0).length == channels(1).length)
    val nIn = channels(0).length
    // pad past the filterbank's 481-sample delay so the whole input
    // emerges from the decoder (the analog of standard encoder delay)
    val nFrames = math.max(1, (nIn + 481 + 383) / 384)
    val pcm = Array.tabulate(nch) { c =>
      val a = new Array[Double](nFrames * 384)
      var i = 0
      while (i < nIn) { a(i) = channels(c)(i) / 32768.0; i += 1 }
      a
    }
    val analyzers = Array.fill(nch)(new Analyzer)

    // analyze everything first: per frame, 12 groups × 32 subbands × ch
    val frames = Array.tabulate(nFrames) { f =>
      Array.tabulate(12) { g =>
        Array.tabulate(nch)(c => analyzers(c).push(pcm(c), f * 384 + g * 32))
      }
    }
    // per frame: allocation (0 or nb), scalefactors, needed bits
    case class FramePlan(alloc: Array[Array[Int]], scf: Array[Array[Int]], bits: Int)
    val plans = frames.map { fr =>
      val alloc = Array.ofDim[Int](nch, 32)
      val scf = Array.ofDim[Int](nch, 32)
      var bits = 32 + 4 * 32 * nch
      // SMR-shaped allocation (the spirit of the spec's psychoacoustic
      // step, deterministic): the loudest subband gets the full `nb`
      // bits; a band `d` octaves below it gets nb − d (floor 2), so its
      // quantizer noise lands below the loud band's. Bands more than 16
      // octaves down (digital silence) get allocation 0 — the injected
      // error is ≤ framePeak·2⁻¹⁶, under everything else's noise floor.
      var framePeak = 0.0
      for (c <- 0 until nch; sb <- 0 until 32; g <- 0 until 12)
        framePeak = math.max(framePeak, math.abs(fr(g)(c)(sb)))
      for (c <- 0 until nch; sb <- 0 until 32) {
        var peak = 0.0
        var g = 0
        while (g < 12) { peak = math.max(peak, math.abs(fr(g)(c)(sb))); g += 1 }
        val deficit = if (peak <= 0.0) Int.MaxValue
          else math.floor(math.log(framePeak / peak) / math.log(2.0)).toInt
        if (peak >= 1e-9 && deficit <= 16) {
          val nbB = math.max(2, nb - math.max(0, deficit))
          alloc(c)(sb) = nbB - 1 // code = nb − 1 (2.4.2.1: nb = code + 1)
          val idx = math.floor(3.0 * (math.log(2.0 / peak) / math.log(2.0))).toInt
          scf(c)(sb) = math.max(0, math.min(62, idx))
          bits += 6 + 12 * nbB
        }
      }
      FramePlan(alloc, scf, bits)
    }
    val worst = plans.map(_.bits).max
    val brIdx = (1 until 15).find(bi =>
      4 * (12 * Bitrates(bi) * 1000 / sampleRate) * 8 >= worst)
      .getOrElse(throw new IllegalArgumentException(
        s"frame needs $worst bits — no Layer I bitrate fits (lower nb)"))
    val slotBytes = 4 * (12 * Bitrates(brIdx) * 1000 / sampleRate)

    val w = new BitWriter
    for (f <- 0 until nFrames) {
      val start = w.size
      val p = plans(f)
      w.write(0xfff, 12); w.write(1, 1); w.write(3, 2); w.write(1, 1)
      w.write(brIdx, 4); w.write(rateIdx, 2); w.write(0, 1); w.write(0, 1)
      w.write(if (nch == 1) 3 else 0, 2); w.write(0, 2)
      w.write(0, 1); w.write(0, 1); w.write(0, 2)
      for (sb <- 0 until 32; c <- 0 until nch) w.write(p.alloc(c)(sb), 4)
      for (sb <- 0 until 32; c <- 0 until nch if p.alloc(c)(sb) != 0)
        w.write(p.scf(c)(sb), 6)
      for (g <- 0 until 12; sb <- 0 until 32; c <- 0 until nch
          if p.alloc(c)(sb) != 0) {
        val nbB = p.alloc(c)(sb) + 1
        val y = frames(f)(g)(c)(sb) / sfVal(p.scf(c)(sb))
        w.write(quant(y, nbB), nbB)
      }
      w.padToByte()
      w.padZeroBytes(start + slotBytes - w.size)
    }
    w.result()
  }

  /** Decode a Layer I stream; None on anything malformed (bad sync,
    * forbidden allocation/scalefactor codes, joint-stereo frames, codes
    * past the payload, or streams past the allocation cap shared with
    * the other codecs). */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (!isMp3(bytes)) return None
    try {
      val MaxTotalSamples = 1L << 27
      var p = 0
      var rate = -1; var nch = -1
      var out: Array[IntVec] = null
      var synths: Array[Synthesizer] = null
      while (p + 4 <= bytes.length &&
          (bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xf0) == 0xf0) {
        val b1 = bytes(p + 1) & 0xff; val b2 = bytes(p + 2) & 0xff
        val b3 = bytes(p + 3) & 0xff
        if (((b1 >> 3) & 1) != 1 || ((b1 >> 1) & 3) != 3) return None
        val protection = b1 & 1
        val brIdx = (b2 >> 4) & 0xf
        val rIdx = (b2 >> 2) & 3
        val padding = (b2 >> 1) & 1
        val mode = (b3 >> 6) & 3
        if (brIdx == 0 || brIdx == 15 || rIdx == 3) return None
        if (mode == 1) return None // intensity joint stereo: unsupported
        val frameCh = if (mode == 3) 1 else 2
        if (rate < 0) {
          rate = Rates(rIdx); nch = frameCh
          out = Array.fill(nch)(new IntVec())
          synths = Array.fill(nch)(new Synthesizer)
        } else if (Rates(rIdx) != rate || frameCh != nch) return None
        val slotBytes = 4 * (12 * Bitrates(brIdx) * 1000 / rate + padding)
        if (p + slotBytes > bytes.length) return None
        if ((out(0).length + 384L) * nch > MaxTotalSamples) return None

        val r = new BitReader(bytes, p + 4 + (if (protection == 0) 2 else 0))
        val alloc = Array.ofDim[Int](nch, 32)
        val scf = Array.ofDim[Int](nch, 32)
        for (sb <- 0 until 32; c <- 0 until nch) {
          val a = r.read(4)
          if (a == 15) return None
          alloc(c)(sb) = a
        }
        for (sb <- 0 until 32; c <- 0 until nch if alloc(c)(sb) != 0) {
          val s = r.read(6)
          if (s == 63) return None
          scf(c)(sb) = s
        }
        val sb = new Array[Double](32)
        val pcm = Array.ofDim[Double](nch, 384)
        for (g <- 0 until 12) {
          val gx = Array.ofDim[Double](nch, 32)
          for (s <- 0 until 32; c <- 0 until nch if alloc(c)(s) != 0) {
            val nbB = alloc(c)(s) + 1
            gx(c)(s) = dequant(r.read(nbB), nbB) * sfVal(scf(c)(s))
          }
          for (c <- 0 until nch) {
            System.arraycopy(gx(c), 0, sb, 0, 32)
            synths(c).push(sb, pcm(c), g * 32)
          }
        }
        // a frame whose allocation demands more bits than its slot holds
        // is malformed — without this bound the reader would silently
        // consume the NEXT frame's bytes as sample data
        if (r.bytesConsumedTo > p + slotBytes) return None
        for (c <- 0 until nch; i <- 0 until 384) {
          val v = math.round(pcm(c)(i) * 32768.0).toInt
          out(c) += math.max(-32768, math.min(32767, v))
        }
        p += slotBytes
      }
      // the walk exits at the first non-sync byte; a stream whose tail is
      // corrupt or replaced with garbage must not decode to partial audio
      // reported as success — the contract is None on ANYTHING malformed
      if (out == null || out(0).isEmpty || p != bytes.length) None
      else Some(Decoded(rate, nch, 16, out.map(_.toArray)))
    } catch {
      case _: Exception => None // truncation/corruption, like Jpeg/Png/Flac
    }
  }
}
