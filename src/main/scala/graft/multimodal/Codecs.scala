package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** REAL media codecs implemented from public byte-level specifications —
  * no libraries required, so they run in this container and at scale:
  *
  *   - PGM (Netpbm grayscale): `P5` binary / `P2` ASCII — magic, whitespace-
  *     separated width/height/maxval with `#` comments, then raw or ASCII
  *     samples (1 or 2 bytes big-endian per sample by maxval).
  *   - WAV (RIFF PCM): `RIFF`/`WAVE` container, little-endian chunks;
  *     `fmt ` (audio format 1 = PCM, channels, sample rate, bits) and
  *     `data` (interleaved frames; 8-bit unsigned, 16-bit signed).
  *
  * These cover the "image" and "audio" modalities with genuine decode;
  * formats needing entropy coding (JPEG/MP3/H.264) remain behind the
  * documented stub in [[Multimodal]].
  */
object Codecs {

  // ---------------------------------------------------------------- PGM

  /** Encode a luminance grid (row-major, values in [0,1]) as binary PGM
    * (P5, maxval 255). Quantization is floor(v·255 + 0.5) — the same
    * explicit half-up both engines' SQL mirrors use. */
  def encodePgm(w: Int, h: Int, px: Array[Double]): Array[Byte] = {
    require(px.length == w * h, "pixel count mismatch")
    val head = s"P5\n$w $h\n255\n".getBytes(US_ASCII)
    val data = new Array[Byte](px.length)
    var i = 0
    while (i < px.length) {
      val q = math.floor(px(i) * 255.0 + 0.5).toInt
      data(i) = math.max(0, math.min(255, q)).toByte
      i += 1
    }
    head ++ data
  }

  /** Decode P5/P2 PGM to (width, height, luminance in [0,1]); None when
    * the payload is not a PGM. */
  def decodePgm(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    if (bytes.length < 2 || bytes(0) != 'P' ||
        (bytes(1) != '5' && bytes(1) != '2')) return None
    val binary = bytes(1) == '5'
    var p = 2
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    // next whitespace-separated token, skipping '#' comments to line end
    def nextInt(): Int = {
      while (p < bytes.length &&
        (isWs(bytes(p)) || bytes(p) == '#')) {
        if (bytes(p) == '#') while (p < bytes.length && bytes(p) != '\n') p += 1
        else p += 1
      }
      var v = 0
      while (p < bytes.length && !isWs(bytes(p))) {
        v = v * 10 + (bytes(p) - '0'); p += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    if (w <= 0 || h <= 0 || maxval <= 0) return None
    p += 1 // exactly one whitespace byte separates maxval from raster (P5)
    val n = w * h
    val out = new Array[Double](n)
    if (binary) {
      val twoByte = maxval > 255
      val need = n * (if (twoByte) 2 else 1)
      if (p + need > bytes.length) return None
      var i = 0
      while (i < n) {
        val raw =
          if (twoByte) ((bytes(p + 2 * i) & 0xff) << 8) | (bytes(p + 2 * i + 1) & 0xff)
          else bytes(p + i) & 0xff
        out(i) = raw.toDouble / maxval
        i += 1
      }
    } else {
      var i = 0
      while (i < n) { out(i) = nextInt().toDouble / maxval; i += 1 }
    }
    Some((w, h, out))
  }

  // ---------------------------------------------------------------- WAV

  /** Encode mono PCM16 WAV. Quantization floor(s·32767 + 0.5), clamped. */
  def encodeWav(sampleRate: Int, samples: Array[Double]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataLen)
      .put("WAVE".getBytes(US_ASCII))
    buf.put("fmt ".getBytes(US_ASCII)).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits
    buf.put("data".getBytes(US_ASCII)).putInt(dataLen)
    samples.foreach { s =>
      val q = math.floor(s * 32767.0 + 0.5).toInt
      buf.putShort(math.max(-32768, math.min(32767, q)).toShort)
    }
    buf.array()
  }

  /** Decode PCM WAV (8-bit unsigned / 16-bit signed, any channel count —
    * channels average to mono) to (sampleRate, samples in [−1,1]); None
    * when the payload is not a PCM WAV. */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Array[Double])] = {
    if (bytes.length < 44) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, US_ASCII)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    // chunk walk: fmt before data per spec, but scan defensively
    var p = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, length)
    while (p + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(p)
      val len = buf.getInt(p + 4)
      if (len < 0 || p + 8 + len > bytes.length) return None
      id match {
        case "fmt " =>
          if (buf.getShort(p + 8) != 1) return None // PCM only
          fmt = Some((buf.getShort(p + 10).toInt, buf.getInt(p + 12),
            buf.getShort(p + 22).toInt))
        case "data" => data = Some((p + 8, len))
        case _ => ()
      }
      p += 8 + len + (len & 1) // chunks pad to even length
    }
    (fmt, data) match {
      case (Some((ch, rate, bits)), Some((off, len)))
          if ch > 0 && (bits == 8 || bits == 16) =>
        val bytesPerSample = bits / 8
        val frames = len / (bytesPerSample * ch)
        val out = new Array[Double](frames)
        var f = 0
        while (f < frames) {
          var s = 0.0
          var c = 0
          while (c < ch) {
            val o = off + (f * ch + c) * bytesPerSample
            s += (if (bits == 16) buf.getShort(o) / 32768.0
                  else ((bytes(o) & 0xff) - 128) / 128.0)
            c += 1
          }
          out(f) = s / ch
          f += 1
        }
        Some((rate, out))
      case _ => None
    }
  }
}
