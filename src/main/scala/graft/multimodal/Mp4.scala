package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** ISO base-media-file-format (MP4) METADATA walker + writer, hand-rolled
  * from the public container spec (ISO/IEC 14496-12: box = 32-bit
  * big-endian size + fourcc, `size == 1` → 64-bit largesize, `size == 0`
  * → to end-of-enclosing; version-0/1 full boxes).
  *
  * Scope is deliberately the CONTAINER, not the codecs: a 100 TB
  * multimodal corpus filters/samples/routes videos by duration,
  * resolution, codec fourcc and track shape long before any frame is
  * decoded, and all of that lives in `moov` — typically a few KB at the
  * start or end of a multi-GB file, so metadata extraction reads
  * essentially none of the media. Parsed per track: handler class
  * (video/audio from `hdlr`), sample-entry fourcc (`stsd`), pixel
  * dimensions (`tkhd` 16.16 fixed), per-track timescale/duration
  * (`mdhd`), sample count (`stsz`/`stz2`). Frame DECODE (H.264 etc.)
  * remains the documented stub in [[Multimodal]].
  *
  * The writer emits a minimal-but-valid `ftyp`+`moov`+`mdat` tree (the
  * reference layout every mux tool produces) and exists to certify the
  * parser the same way the other codec pairs do (encoder→decoder
  * round-trip, q144). Reference surface: walkthrough.ipynb cell 0's
  * opaque media handling (multimodal columns carry bytes + typed
  * metadata).
  */
object Mp4 {

  /** One media track's metadata. */
  final case class Track(trackId: Long, handler: String, codec: String,
      width: Int, height: Int, timescale: Long, duration: Long,
      sampleCount: Long)

  /** Whole-file metadata: major brand, movie timescale/duration, tracks
    * in declaration order, and total `mdat` payload bytes. */
  final case class Meta(brand: String, timescale: Long, duration: Long,
      tracks: Seq[Track], mdatBytes: Long) {
    def durationMs: Long =
      if (timescale <= 0) 0L else duration * 1000L / timescale
    def videoTracks: Seq[Track] = tracks.filter(_.handler == "vide")
    def audioTracks: Seq[Track] = tracks.filter(_.handler == "soun")
  }

  def isMp4(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p'

  // ------------------------------------------------------------ parsing

  private final class Reader(val b: Array[Byte]) {
    def u8(p: Long): Int = b(p.toInt) & 0xff
    def u16(p: Long): Int = (u8(p) << 8) | u8(p + 1)
    def u32(p: Long): Long =
      ((u8(p).toLong << 24) | (u8(p + 1) << 16) | (u8(p + 2) << 8) |
        u8(p + 3)) & 0xffffffffL
    def u64(p: Long): Long = (u32(p) << 32) | u32(p + 4)
    def fourcc(p: Long): String =
      new String(b, p.toInt, 4, "US-ASCII")
  }

  /** The boxes at one nesting level: (type, payloadStart, payloadEnd). */
  private def boxes(r: Reader, start: Long, end: Long): Seq[(String, Long, Long)] = {
    val out = Seq.newBuilder[(String, Long, Long)]
    var p = start
    while (p < end) {
      require(p + 8 <= end, "truncated box header")
      val size32 = r.u32(p)
      val typ = r.fourcc(p + 4)
      // a compact size of 2-7 would place the box's recorded end before
      // its own payload start and turn later fixed-offset reads into
      // neighboring-byte garbage — malformed, not mappable
      require(size32 == 0L || size32 == 1L || size32 >= 8L,
        s"bad box size $size32")
      val (payload, next) =
        if (size32 == 1L) { require(p + 16 <= end, "truncated largesize")
          (p + 16, p + r.u64(p + 8)) }
        else if (size32 == 0L) (p + 8, end) // to end of enclosing box
        else (p + 8, p + size32)
      require(next > p && next <= end, s"box '$typ' overruns enclosure")
      out += ((typ, payload, next))
      p = next
    }
    out.result()
  }

  private def find(bs: Seq[(String, Long, Long)], typ: String) =
    bs.find(_._1 == typ)

  /** Parse metadata; None on anything malformed (bad magic, box overrun,
    * missing required boxes, truncation). Media payloads are never
    * touched beyond the mdat length arithmetic. */
  def parseMeta(bytes: Array[Byte]): Option[Meta] = {
    if (!isMp4(bytes)) return None
    try {
      val r = new Reader(bytes)
      val top = boxes(r, 0L, bytes.length.toLong)
      val (_, ftypS, _) = find(top, "ftyp").getOrElse(return None)
      val brand = r.fourcc(ftypS)
      val (_, moovS, moovE) = find(top, "moov").getOrElse(return None)
      val mdatBytes = top.filter(_._1 == "mdat").map(b => b._3 - b._2).sum
      val moov = boxes(r, moovS, moovE)
      val (_, mvhdS, _) = find(moov, "mvhd").getOrElse(return None)
      val mvhdV = r.u8(mvhdS)
      // v0: ctime/mtime 4+4, timescale 4, duration 4; v1: 8+8, 4, 8
      val (mvTs, mvDur) =
        if (mvhdV == 1) (r.u32(mvhdS + 20), r.u64(mvhdS + 24))
        else (r.u32(mvhdS + 12), r.u32(mvhdS + 16))
      val tracks = moov.filter(_._1 == "trak").map { case (_, tS, tE) =>
        val trak = boxes(r, tS, tE)
        val (_, tkS, _) = find(trak, "tkhd").getOrElse(
          throw new IllegalArgumentException("trak without tkhd"))
        val tkV = r.u8(tkS)
        val trackId = if (tkV == 1) r.u32(tkS + 20) else r.u32(tkS + 12)
        // width/height: 16.16 fixed, last 8 bytes of tkhd payload
        val tkFix = tkS + (if (tkV == 1) 96L else 84L) - 8
        val width = r.u32(tkFix).toInt >>> 16
        val height = r.u32(tkFix + 4).toInt >>> 16
        val (_, mdS, mdE) = find(trak, "mdia").getOrElse(
          throw new IllegalArgumentException("trak without mdia"))
        val mdia = boxes(r, mdS, mdE)
        val (_, mhS, _) = find(mdia, "mdhd").getOrElse(
          throw new IllegalArgumentException("mdia without mdhd"))
        val mhV = r.u8(mhS)
        val (ts, dur) =
          if (mhV == 1) (r.u32(mhS + 20), r.u64(mhS + 24))
          else (r.u32(mhS + 12), r.u32(mhS + 16))
        val (_, hdS, _) = find(mdia, "hdlr").getOrElse(
          throw new IllegalArgumentException("mdia without hdlr"))
        val handler = r.fourcc(hdS + 8)
        val (_, mnS, mnE) = find(mdia, "minf").getOrElse(
          throw new IllegalArgumentException("mdia without minf"))
        val (_, sbS, sbE) = find(boxes(r, mnS, mnE), "stbl").getOrElse(
          throw new IllegalArgumentException("minf without stbl"))
        val stbl = boxes(r, sbS, sbE)
        val (_, sdS, _) = find(stbl, "stsd").getOrElse(
          throw new IllegalArgumentException("stbl without stsd"))
        // stsd: fullbox header (4) + entry_count (4) + first sample entry
        val codec =
          if (r.u32(sdS + 4) == 0L) "none" else r.fourcc(sdS + 12)
        // stsz: fullbox(4) + sample_size(4) + sample_count; stz2:
        // fullbox(4) + reserved24/field_size8(4) + sample_count — the
        // count sits at payload+8 in both layouts
        val sampleCount = find(stbl, "stsz").orElse(find(stbl, "stz2"))
          .map { case (_, szS, _) => r.u32(szS + 8) }.getOrElse(0L)
        Track(trackId, handler, codec, width, height, ts, dur, sampleCount)
      }
      Some(Meta(brand, mvTs, mvDur, tracks, mdatBytes))
    } catch { case _: Exception => None }
  }

  // ------------------------------------------------- sample extraction

  /** Per-sample (absolute file offset, size) of one track, resolved from
    * the spec's three-table indirection: `stsz` (sizes; fixed or
    * per-sample), `stsc` (sample→chunk runs), `stco`/`co64` (chunk
    * offsets). This is the random-access path a frame decoder uses —
    * samples are located without reading any media bytes. None when the
    * track lacks a complete table set or the tables disagree. */
  def sampleTable(bytes: Array[Byte], trackIndex: Int): Option[Seq[(Long, Int)]] = {
    if (!isMp4(bytes)) return None
    try {
      val r = new Reader(bytes)
      val top = boxes(r, 0L, bytes.length.toLong)
      val (_, moovS, moovE) = find(top, "moov").getOrElse(return None)
      val traks = boxes(r, moovS, moovE).filter(_._1 == "trak")
      if (trackIndex < 0 || trackIndex >= traks.length) return None
      val (_, tS, tE) = traks(trackIndex)
      val (_, mdS, mdE) = find(boxes(r, tS, tE), "mdia").getOrElse(return None)
      val (_, mnS, mnE) = find(boxes(r, mdS, mdE), "minf").getOrElse(return None)
      val (_, sbS, sbE) = find(boxes(r, mnS, mnE), "stbl").getOrElse(return None)
      val stbl = boxes(r, sbS, sbE)
      // Counts are ALLOCATION BOUNDS and must be validated against the
      // file length BEFORE sizing arrays: a bit-flipped count would
      // otherwise attempt a multi-GB allocation whose OutOfMemoryError
      // is an Error (escapes the Exception→None guard) and kills the
      // task — the same cap discipline as the audio decoders'
      // MaxTotalSamples.
      def bounded(count: Long, bytesPerEntry: Int): Int = {
        // division, not multiplication: count·entry can overflow Long
        require(count >= 0 && bytesPerEntry > 0 &&
          count <= bytes.length / bytesPerEntry,
          s"table count $count exceeds the file")
        count.toInt
      }
      // stsz: fullbox(4) + sample_size(4) + sample_count(4) [+ sizes].
      // Each u32 size is validated AS A LONG before narrowing: a size
      // above Int.MaxValue would otherwise wrap negative, slip past the
      // additive bounds check below, and emit (offset, negative-length)
      // entries instead of rejecting the table.
      def validSize(sz: Long): Int = {
        require(sz >= 0 && sz <= bytes.length,
          s"sample size $sz exceeds the file")
        sz.toInt
      }
      val (_, szS, _) = find(stbl, "stsz").getOrElse(return None)
      val fixedSize = r.u32(szS + 4)
      // even fixed-size samples must physically fit in the file
      val n = bounded(r.u32(szS + 8),
        if (fixedSize != 0L) math.max(1, validSize(fixedSize)) else 4)
      val sizes: Array[Int] =
        if (fixedSize != 0L) Array.fill(n)(validSize(fixedSize))
        else Array.tabulate(n)(i => validSize(r.u32(szS + 12 + 4L * i)))
      // stco (u32) or co64 (u64): fullbox(4) + entry_count(4) + offsets
      val chunkOffsets: Array[Long] = find(stbl, "stco") match {
        case Some((_, coS, _)) =>
          Array.tabulate(bounded(r.u32(coS + 4), 4))(i =>
            r.u32(coS + 8 + 4L * i))
        case None =>
          val (_, coS, _) = find(stbl, "co64").getOrElse(return None)
          Array.tabulate(bounded(r.u32(coS + 4), 8))(i =>
            r.u64(coS + 8 + 8L * i))
      }
      // stsc: fullbox(4) + entry_count(4) + (first_chunk,
      // samples_per_chunk, sdi) triples; runs extend to the next entry
      val (_, scS, _) = find(stbl, "stsc").getOrElse(return None)
      val nRuns = bounded(r.u32(scS + 4), 12)
      val runs = Array.tabulate(nRuns)(i =>
        (r.u32(scS + 8 + 12L * i).toInt, r.u32(scS + 12 + 12L * i).toInt))
      val out = Vector.newBuilder[(Long, Int)]
      var sample = 0
      var chunk = 0
      while (sample < n && chunk < chunkOffsets.length) {
        val runIdx = runs.lastIndexWhere(_._1 <= chunk + 1)
        if (runIdx < 0) return None
        val perChunk = runs(runIdx)._2
        var off = chunkOffsets(chunk)
        var j = 0
        while (j < perChunk && sample < n) {
          if (off + sizes(sample) > bytes.length) return None
          out += ((off, sizes(sample)))
          off += sizes(sample)
          sample += 1; j += 1
        }
        chunk += 1
      }
      if (sample != n) return None
      Some(out.result())
    } catch { case _: Exception => None }
  }

  /** The sample-table (`stbl`) child boxes of one track, or None when
    * the track/box chain is absent — the shared walk under
    * [[syncSamples]]/[[sampleTimes]]. */
  private def stblBoxes(r: Reader, bytes: Array[Byte],
      trackIndex: Int): Option[Seq[(String, Long, Long)]] = {
    val top = boxes(r, 0L, bytes.length.toLong)
    val (_, moovS, moovE) = find(top, "moov").getOrElse(return None)
    val traks = boxes(r, moovS, moovE).filter(_._1 == "trak")
    if (trackIndex < 0 || trackIndex >= traks.length) return None
    val (_, tS, tE) = traks(trackIndex)
    val (_, mdS, mdE) = find(boxes(r, tS, tE), "mdia").getOrElse(return None)
    val (_, mnS, mnE) = find(boxes(r, mdS, mdE), "minf").getOrElse(return None)
    val (_, sbS, sbE) = find(boxes(r, mnS, mnE), "stbl").getOrElse(return None)
    Some(boxes(r, sbS, sbE))
  }

  /** 1-based sync-sample (keyframe) numbers of one track from its `stss`
    * box. `Some(Nil)` is a legal value (a degenerate stss claiming no
    * sync samples); **None means the track has NO stss box — which per
    * ISO 14496-12 §8.6.2 declares EVERY sample a sync sample** (the
    * all-intra case: MJPEG, I_PCM H.264). Callers sampling keyframes
    * must treat None as all-sync, not as empty. */
  def syncSamples(bytes: Array[Byte], trackIndex: Int): Option[Seq[Long]] = {
    if (!isMp4(bytes)) return None
    try {
      val r = new Reader(bytes)
      val stbl = stblBoxes(r, bytes, trackIndex).getOrElse(return None)
      val (_, ssS, _) = find(stbl, "stss").getOrElse(return None)
      val count = r.u32(ssS + 4)
      require(count >= 0 && count <= bytes.length / 4,
        s"stss count $count exceeds the file")
      Some((0 until count.toInt).map(i => r.u32(ssS + 8 + 4L * i)))
    } catch { case _: Exception => None }
  }

  /** Per-sample (decode time, presentation time) in the track timescale:
    * decode times from the mandatory `stts` delta runs, presentation =
    * decode + the `ctts` composition offset when that box is present
    * (v0 unsigned / v1 signed offsets; absent = zero offsets, pts ≡
    * dts). None when the track or its stts is absent/malformed. */
  def sampleTimes(bytes: Array[Byte],
      trackIndex: Int): Option[Seq[(Long, Long)]] = {
    if (!isMp4(bytes)) return None
    try {
      val r = new Reader(bytes)
      val stbl = stblBoxes(r, bytes, trackIndex).getOrElse(return None)
      // stts: fullbox(4) + entry_count + (sample_count, delta) runs
      val (_, ttS, _) = find(stbl, "stts").getOrElse(return None)
      val nRuns = r.u32(ttS + 4)
      require(nRuns >= 0 && nRuns <= bytes.length / 8,
        s"stts count $nRuns exceeds the file")
      val dts = Vector.newBuilder[Long]
      var t = 0L
      var i = 0
      var total = 0L // cumulative allocation bound across ALL runs
      while (i < nRuns.toInt) {
        val cnt = r.u32(ttS + 8 + 8L * i)
        val delta = r.u32(ttS + 12 + 8L * i)
        total += cnt
        require(cnt >= 0 && total <= bytes.length,
          s"stts samples $total exceed the file")
        var j = 0L
        while (j < cnt) { dts += t; t += delta; j += 1 }
        i += 1
      }
      val decodeTimes = dts.result()
      // ctts: fullbox(4) + entry_count + (sample_count, offset) runs
      val offsets: Seq[Long] = find(stbl, "ctts") match {
        case None => Seq.fill(decodeTimes.length)(0L)
        case Some((_, ctS, _)) =>
          val v = r.u8(ctS)
          val nC = r.u32(ctS + 4)
          require(nC >= 0 && nC <= bytes.length / 8,
            s"ctts count $nC exceeds the file")
          val b = Vector.newBuilder[Long]
          var k = 0
          var cTotal = 0L // cumulative allocation bound across ALL runs
          while (k < nC.toInt) {
            val cnt = r.u32(ctS + 8 + 8L * k)
            val raw = r.u32(ctS + 12 + 8L * k)
            // v1 offsets are SIGNED 32-bit (B-frame reordering)
            val off = if (v == 1) raw.toInt.toLong else raw
            cTotal += cnt
            require(cnt >= 0 && cTotal <= bytes.length,
              s"ctts samples $cTotal exceed the file")
            var j = 0L
            while (j < cnt) { b += off; j += 1 }
            k += 1
          }
          b.result()
      }
      require(offsets.length == decodeTimes.length,
        "ctts/stts sample counts disagree")
      Some(decodeTimes.zip(offsets).map { case (d, o) => (d, d + o) })
    } catch { case _: Exception => None }
  }

  /** A codec configuration box nested in a track's first (video) sample
    * entry — e.g. the `avcC` AVCDecoderConfigurationRecord of an `avc1`
    * track (ISO 14496-15 carriage: parameter sets live in the entry,
    * samples are length-prefixed NALs). Returns the box PAYLOAD. The
    * fixed VisualSampleEntry fields span 78 payload bytes; child boxes
    * follow. */
  def codecConfig(bytes: Array[Byte], trackIndex: Int,
      boxType: String): Option[Array[Byte]] = {
    if (!isMp4(bytes)) return None
    try {
      val r = new Reader(bytes)
      val top = boxes(r, 0L, bytes.length.toLong)
      val (_, moovS, moovE) = find(top, "moov").getOrElse(return None)
      val traks = boxes(r, moovS, moovE).filter(_._1 == "trak")
      if (trackIndex < 0 || trackIndex >= traks.length) return None
      val (_, tS, tE) = traks(trackIndex)
      val (_, mdS, mdE) = find(boxes(r, tS, tE), "mdia").getOrElse(return None)
      val (_, mnS, mnE) = find(boxes(r, mdS, mdE), "minf").getOrElse(return None)
      val (_, sbS, sbE) = find(boxes(r, mnS, mnE), "stbl").getOrElse(return None)
      val (_, sdS, _) = find(boxes(r, sbS, sbE), "stsd").getOrElse(return None)
      if (r.u32(sdS + 4) == 0L) return None
      val entryStart = sdS + 8
      val entryEnd = entryStart + r.u32(entryStart)
      find(boxes(r, entryStart + 8 + 78, entryEnd), boxType)
        .map { case (_, s, e) => bytes.slice(s.toInt, e.toInt) }
    } catch { case _: Exception => None }
  }

  /** The raw sample payloads of the FIRST video track (frame decode's
    * input — e.g. one complete JPEG per sample for an MJPEG track). */
  def videoSamples(bytes: Array[Byte]): Option[Seq[Array[Byte]]] =
    trackSamples(bytes, "vide")

  /** The raw sample payloads of the FIRST audio track (`soun` handler) —
    * e.g. one MPEG-1 audio frame per sample, the mp4a-style carriage a
    * corpus decoder routes into the Layer I/II/III codecs. */
  def audioSamples(bytes: Array[Byte]): Option[Seq[Array[Byte]]] =
    trackSamples(bytes, "soun")

  private def trackSamples(bytes: Array[Byte],
      handler: String): Option[Seq[Array[Byte]]] =
    for {
      meta <- parseMeta(bytes)
      idx = meta.tracks.indexWhere(_.handler == handler)
      if idx >= 0
      table <- sampleTable(bytes, idx)
    } yield table.map { case (off, len) =>
      bytes.slice(off.toInt, off.toInt + len)
    }

  // ------------------------------------------------------------ writing

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val len = 8 + payload.map(_.length).sum
    val buf = ByteBuffer.allocate(len).order(ByteOrder.BIG_ENDIAN)
    buf.putInt(len)
    buf.put(typ.getBytes("US-ASCII"))
    payload.foreach(buf.put)
    buf.array()
  }

  private def be32(v: Long): Array[Byte] =
    ByteBuffer.allocate(4).putInt(v.toInt).array()
  private def be16(v: Int): Array[Byte] =
    ByteBuffer.allocate(2).putShort(v.toShort).array()

  /** One track description for [[write]]. `handler` is "vide" or "soun";
    * dimensions only apply to video. */
  final case class TrackSpec(handler: String, codec: String, width: Int,
      height: Int, timescale: Long, duration: Long, sampleCount: Long)

  /** Write a minimal valid MP4: ftyp + moov(mvhd + one trak per spec)
    * + mdat carrying `payload` (opaque bytes — this writer certifies the
    * METADATA walk, not a codec). */
  def write(timescale: Long, duration: Long, tracks: Seq[TrackSpec],
      payload: Array[Byte]): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes, be32(512),
      "isomiso2".getBytes)
    val mvhd = box("mvhd", be32(0), // version 0 + flags
      be32(0), be32(0), be32(timescale), be32(duration),
      be32(0x00010000L), be16(0x0100), be16(0), be32(0), be32(0),
      // identity matrix
      be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
      be32(0), be32(0), be32(0), be32(0x40000000L),
      Array.fill(24)(0.toByte), // pre_defined
      be32(tracks.length + 1L)) // next_track_ID
    val traks = tracks.zipWithIndex.map { case (t, i) =>
      val tkhd = box("tkhd", be32(7), // version 0, flags: enabled+in-movie
        be32(0), be32(0), be32(i + 1L), be32(0), be32(t.duration),
        be32(0), be32(0), be16(0), be16(0),
        be16(if (t.handler == "soun") 0x0100 else 0), be16(0),
        be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
        be32(0), be32(0), be32(0), be32(0x40000000L),
        be32(t.width.toLong << 16), be32(t.height.toLong << 16))
      val mdhd = box("mdhd", be32(0), be32(0), be32(0),
        be32(t.timescale), be32(t.duration), be16(0x55c4), be16(0))
      val hdlr = box("hdlr", be32(0), be32(0),
        t.handler.getBytes("US-ASCII"), Array.fill(12)(0.toByte),
        Array[Byte](0)) // empty name
      val entry = {
        // generic sample entry: 6 reserved + data_reference_index, then
        // the video shape (pre_defined + dims) when applicable
        val common = Array.fill(6)(0.toByte) ++ be16(1)
        val body =
          if (t.handler == "vide")
            common ++ Array.fill(16)(0.toByte) ++
              be16(t.width) ++ be16(t.height) ++
              be32(0x00480000L) ++ be32(0x00480000L) ++ be32(0) ++
              be16(1) ++ Array.fill(32)(0.toByte) ++ be16(24) ++ be16(0xffff)
          else common ++ Array.fill(8)(0.toByte) ++ be16(2) ++ be16(16) ++
            be32(0) ++ be32(t.timescale << 16)
        box(t.codec, body)
      }
      val stsd = box("stsd", be32(0), be32(1), entry)
      val stts = box("stts", be32(0), be32(1), be32(t.sampleCount),
        be32(if (t.sampleCount == 0) 0 else t.duration / math.max(1, t.sampleCount)))
      val stsc = box("stsc", be32(0), be32(1), be32(1), be32(t.sampleCount),
        be32(1))
      val stsz = box("stsz", be32(0), be32(0), be32(t.sampleCount),
        Array.concat((0L until t.sampleCount).map(_ => be32(1)): _*))
      val stco = box("stco", be32(0), be32(1), be32(0))
      val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
      val minf = box("minf", box("nmhd", be32(0)),
        box("dinf", box("dref", be32(0), be32(1),
          box("url ", be32(1)))), stbl)
      box("trak", tkhd, box("mdia", mdhd, hdlr, minf))
    }
    val moov = box("moov", (mvhd +: traks): _*)
    val mdat = box("mdat", payload)
    ftyp ++ moov ++ mdat
  }

  /** Write an MP4 whose tracks carry REAL samples: per-track one chunk
    * in `mdat`, per-sample sizes in `stsz`, the chunk's absolute file
    * offset in `stco` (resolved by the standard two-pass layout — the
    * moov length is fixed once entry counts are known, so offsets are
    * filled on the second pass). [[sampleTable]]/[[videoSamples]] read
    * these back; an MJPEG-style track is simply one complete JPEG per
    * sample. */
  /** Optional timing/sync sidecars for [[writeWithSamples]], keyed by
    * track index: `syncs` = 1-based sync-sample numbers (emitted as an
    * `stss` box — OMIT the key for all-intra tracks, where the spec
    * says no stss at all); `cttsRuns` = (sample_count, composition
    * offset) runs (emitted as a v0 `ctts` box). */
  def writeWithSamples(timescale: Long, duration: Long,
      tracks: Seq[(TrackSpec, Seq[Array[Byte]])],
      configs: Map[Int, (String, Array[Byte])] = Map.empty,
      syncs: Map[Int, Seq[Long]] = Map.empty,
      cttsRuns: Map[Int, Seq[(Long, Long)]] = Map.empty): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes, be32(512),
      "isomiso2".getBytes)
    def moovOf(offsets: Seq[Long]): Array[Byte] = {
      val mvhd = box("mvhd", be32(0),
        be32(0), be32(0), be32(timescale), be32(duration),
        be32(0x00010000L), be16(0x0100), be16(0), be32(0), be32(0),
        be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
        be32(0), be32(0), be32(0), be32(0x40000000L),
        Array.fill(24)(0.toByte),
        be32(tracks.length + 1L))
      val traks = tracks.zipWithIndex.map { case ((t, samples), i) =>
        val n = samples.length
        val tkhd = box("tkhd", be32(7),
          be32(0), be32(0), be32(i + 1L), be32(0), be32(t.duration),
          be32(0), be32(0), be16(0), be16(0),
          be16(if (t.handler == "soun") 0x0100 else 0), be16(0),
          be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
          be32(0), be32(0), be32(0), be32(0x40000000L),
          be32(t.width.toLong << 16), be32(t.height.toLong << 16))
        val mdhd = box("mdhd", be32(0), be32(0), be32(0),
          be32(t.timescale), be32(t.duration), be16(0x55c4), be16(0))
        val hdlr = box("hdlr", be32(0), be32(0),
          t.handler.getBytes("US-ASCII"), Array.fill(12)(0.toByte),
          Array[Byte](0))
        val entry = {
          val common = Array.fill(6)(0.toByte) ++ be16(1)
          val body =
            if (t.handler == "vide")
              common ++ Array.fill(16)(0.toByte) ++
                be16(t.width) ++ be16(t.height) ++
                be32(0x00480000L) ++ be32(0x00480000L) ++ be32(0) ++
                be16(1) ++ Array.fill(32)(0.toByte) ++ be16(24) ++ be16(0xffff)
            else common ++ Array.fill(8)(0.toByte) ++ be16(2) ++ be16(16) ++
              be32(0) ++ be32(t.timescale << 16)
          configs.get(i) match {
            case Some((bt, cfg)) => box(t.codec, body, box(bt, cfg))
            case None => box(t.codec, body)
          }
        }
        val stsd = box("stsd", be32(0), be32(1), entry)
        val stts = box("stts", be32(0), be32(1), be32(n.toLong),
          be32(if (n == 0) 0 else t.duration / math.max(1, n)))
        val stsc =
          if (n == 0) box("stsc", be32(0), be32(0))
          else box("stsc", be32(0), be32(1), be32(1), be32(n.toLong), be32(1))
        val stsz = box("stsz", be32(0), be32(0), be32(n.toLong),
          Array.concat(samples.map(s => be32(s.length.toLong)): _*))
        val stco =
          if (n == 0) box("stco", be32(0), be32(0))
          else box("stco", be32(0), be32(1), be32(offsets(i)))
        val timing = Seq(
          syncs.get(i).map(ss => box("stss", be32(0), be32(ss.length.toLong),
            Array.concat(ss.map(be32): _*))),
          cttsRuns.get(i).map(rs => box("ctts", be32(0),
            be32(rs.length.toLong),
            Array.concat(rs.map { case (c, o) =>
              be32(c) ++ be32(o) }: _*)))).flatten
        val stbl = box("stbl",
          (Seq(stsd, stts, stsc, stsz, stco) ++ timing): _*)
        val minf = box("minf", box("nmhd", be32(0)),
          box("dinf", box("dref", be32(0), be32(1),
            box("url ", be32(1)))), stbl)
        box("trak", tkhd, box("mdia", mdhd, hdlr, minf))
      }
      box("moov", (mvhd +: traks): _*)
    }
    val moovLen = moovOf(tracks.map(_ => 0L)).length
    val payloadSizes = tracks.map(_._2.map(_.length).sum)
    val base = ftyp.length.toLong + moovLen + 8 // + mdat header
    val offsets = payloadSizes.scanLeft(base)(_ + _).init
    val moov = moovOf(offsets)
    require(moov.length == moovLen, "moov length changed between passes")
    val mdat = box("mdat", tracks.flatMap(_._2): _*)
    ftyp ++ moov ++ mdat
  }
}
