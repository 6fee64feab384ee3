package graft.multimodal

/** MPEG-1 audio stream framing (ISO/IEC 11172-3 §2.4.1.2): split a
  * concatenated elementary stream into its frames using only header
  * arithmetic — the carriage step between a container sample table
  * (one frame per MP4 sample, [[Mp4.audioSamples]]) and the Layer
  * I/II/III decoders. No payload bytes are inspected: frame length is
  * fully determined by (layer, bitrate index, sampling rate, padding),
  * exactly the fields the decoders themselves re-validate.
  *
  * Reference anchor: the walkthrough's opaque media columns
  * (documents/media payloads are decode-routed by magic, never
  * schema-typed) — this is the audio analog of the video sample walk.
  */
object MpegAudio {

  /** Frame byte-length from a 4-byte MPEG-1 header at `p`, or -1 when
    * the header is not a valid MPEG-1 Layer I/II/III frame start.
    * Layer I: 4·(12·bitrate/rate + padding) (slot = 4 bytes);
    * Layer II/III: 144·bitrate/rate + padding (slot = 1 byte). */
  def frameLength(bytes: Array[Byte], p: Int): Int = {
    if (p + 4 > bytes.length) return -1
    if ((bytes(p) & 0xff) != 0xff || (bytes(p + 1) & 0xf0) != 0xf0) return -1
    val b1 = bytes(p + 1) & 0xff
    val b2 = bytes(p + 2) & 0xff
    if (((b1 >> 3) & 1) != 1) return -1 // MPEG-1 only
    val layer = (b1 >> 1) & 3           // 3 = I, 2 = II, 1 = III
    val brIdx = (b2 >> 4) & 0xf
    val rIdx = (b2 >> 2) & 3
    val pad = (b2 >> 1) & 1
    if (layer == 0 || brIdx == 0 || brIdx == 15 || rIdx == 3) return -1
    val rate = Mp3.Rates(rIdx)
    val br = layer match {
      case 3 => Mp3.Bitrates(brIdx)
      case 2 => Mp2.Bitrates(brIdx)
      case _ => Mp3L3.Bitrates(brIdx)
    }
    if (br == 0) return -1
    if (layer == 3) 4 * (12 * br * 1000 / rate + pad)
    else 144 * br * 1000 / rate + pad
  }

  /** Split a whole stream into frames; None unless the frame grid tiles
    * the input EXACTLY (same malformed-means-None contract as the
    * decoders — a corrupt tail must not yield partial frames reported
    * as success). */
  def splitFrames(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    val out = Vector.newBuilder[Array[Byte]]
    var p = 0
    while (p < bytes.length) {
      val len = frameLength(bytes, p)
      if (len <= 4 || p + len > bytes.length) return None
      out += java.util.Arrays.copyOfRange(bytes, p, p + len)
      p += len
    }
    val frames = out.result()
    if (frames.isEmpty) None else Some(frames)
  }
}
