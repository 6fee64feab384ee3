package graft.sources

/** WARC (ISO 28500 / WARC/1.0) record walker — the container web
  * crawls actually arrive in (Common-Crawl-style ingestion; the q172
  * funnel runs WARC → HTTP → HTML → text end to end).
  *
  * The load-bearing rule is CONTENT-LENGTH FRAMING: a record's payload
  * is exactly `Content-Length` bytes, and the walker seeks past it to
  * the next record — it never scans for a "WARC/1.0" delimiter. A
  * payload may legally CONTAIN bytes that look like a record header
  * (a crawler archiving a page about WARC, a warcinfo record quoting
  * one); delimiter splitting would manufacture phantom records there,
  * and WarcSpec plants exactly that trap. Header names are matched
  * case-insensitively per the spec; header bytes are ISO-8859-1 (the
  * HTTP convention — no multi-byte decode before the body is framed).
  *
  * Reference behavior surface: JeremyBuchanan/telescope-data-pipeline
  * has no crawl ingestion; this extends the §2.10 LLM-data family the
  * same way the MP4/FLAC walkers extend §2.1 (container → payload →
  * decode, writer certifies reader).
  */
object Warc {

  final case class Record(headers: Map[String, String], payload: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      }
    def recordType: Option[String] = header("WARC-Type")
    def targetUri: Option[String] = header("WARC-Target-URI")
  }

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Index just past the next CRLF at/after `from`, with the line, or
    * None if no full line remains. */
  private def line(bytes: Array[Byte], from: Int): Option[(String, Int)] = {
    var i = from
    while (i + 1 < bytes.length) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n')
        return Some((new String(bytes, from, i - from, Latin1), i + 2))
      i += 1
    }
    None
  }

  /** Parse every complete record; a trailing incomplete record (header
    * block cut off, or fewer payload bytes than Content-Length — a
    * truncated fetch) is dropped, not guessed at. */
  def records(bytes: Array[Byte]): Seq[Record] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Record]
    var i = 0
    var ok = true
    while (ok && i < bytes.length) {
      // skip inter-record CRLFs
      while (i + 1 < bytes.length && bytes(i) == '\r' && bytes(i + 1) == '\n')
        i += 2
      if (i >= bytes.length) ok = false
      else line(bytes, i) match {
        case Some((version, afterVersion)) if version.startsWith("WARC/") =>
          var j = afterVersion
          val hdrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
          var headerDone = false
          var headerOk = true
          while (headerOk && !headerDone) {
            line(bytes, j) match {
              case Some(("", after)) => headerDone = true; j = after
              case Some((h, after)) =>
                val c = h.indexOf(':')
                if (c > 0) hdrs += h.substring(0, c).trim -> h.substring(c + 1).trim
                j = after
              case None => headerOk = false
            }
          }
          // A malformed or negative Content-Length is the same situation
          // as a missing one: the record cannot be framed, so the walker
          // stops and drops it rather than throwing out of the task.
          val len = hdrs.collectFirst {
            case (k, v) if k.equalsIgnoreCase("Content-Length") =>
              scala.util.Try(v.trim.toLong).toOption.filter(_ >= 0)
          }.flatten
          (len, headerOk) match {
            case (Some(n), true) if j + n <= bytes.length =>
              out += Record(hdrs.toMap,
                java.util.Arrays.copyOfRange(bytes, j, j + n.toInt))
              i = j + n.toInt
            case _ => ok = false // truncated or unframed: stop, drop
          }
        case _ => ok = false // not a record boundary: stop
      }
    }
    out.toSeq
  }

  /** The HTTP message body of a response record's payload: everything
    * past the first CRLFCRLF, provided the payload starts with an HTTP
    * status line. None for non-HTTP payloads — and None for a
    * headers-only envelope with no CRLFCRLF separator (a truncated HTTP
    * message is dropped like a truncated WARC record, not surfaced as a
    * "valid" empty body). */
  def httpBody(payload: Array[Byte]): Option[Array[Byte]] =
    httpHeaderEnd(payload).map(end =>
      java.util.Arrays.copyOfRange(payload, end + 4, payload.length))

  /** Index of the first CRLFCRLF of an HTTP message payload (the end of
    * the header block), or None when the payload is not HTTP or the
    * block is unterminated — the ONE framing scanner [[httpBody]] and
    * [[httpHeader]] both rule on, so a framing tweak (bounds, LF
    * tolerance) can never make them disagree about the same payload. */
  private def httpHeaderEnd(payload: Array[Byte]): Option[Int] = {
    if (!new String(payload, 0, math.min(5, payload.length), Latin1)
        .startsWith("HTTP/")) return None
    var i = 0
    while (i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') return Some(i)
      i += 1
    }
    None
  }

  /** A named header of an HTTP response payload (status line + header
    * block up to the first CRLFCRLF), matched case-insensitively per RFC
    * 9110. None for non-HTTP payloads, unterminated header blocks, or an
    * absent header — header bytes decode as ISO-8859-1 like the WARC
    * header block (no multi-byte decode before the body is framed). */
  def httpHeader(payload: Array[Byte], name: String): Option[String] =
    httpHeaderEnd(payload).flatMap { end =>
      // RFC 9110 obs-fold: a line starting with SP/HTAB continues the
      // previous header's value (deprecated but present in archived
      // traffic) — join it before splitting, as one space
      val lines = new String(payload, 0, end, Latin1).split("\r\n")
      val joined = lines.foldLeft(List.empty[String]) { (acc, l) =>
        if (l.nonEmpty && (l.head == ' ' || l.head == '\t') && acc.nonEmpty)
          (acc.head + " " + l.trim) :: acc.tail
        else l :: acc
      }.reverse
      joined.iterator.drop(1)
        .map { h => val c = h.indexOf(':'); if (c > 0)
          (h.substring(0, c).trim, h.substring(c + 1).trim) else ("", "") }
        .collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    }

  /** A WET "conversion" record — the text-extraction output container
    * crawl pipelines publish alongside `.warc.gz` (Common Crawl's
    * `.warc.wet.gz`): `WARC-Type: conversion`, the source page carried in
    * `WARC-Target-URI`, payload = the extracted plain text as UTF-8.
    * Feed a batch of these to [[writeGz]] for the seekable member-stream
    * shape WET files actually ship in. */
  def wetRecord(uri: String, text: String): (Seq[(String, String)], Array[Byte]) =
    (Seq("WARC-Type" -> "conversion", "WARC-Target-URI" -> uri,
      "Content-Type" -> "text/plain"),
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private val CharsetParamRe =
    "(?i)charset\\s*=\\s*[\"']?([A-Za-z0-9_.:+\\-]+)".r
  private val MetaCharsetRe =
    "(?i)<meta[^>]{0,512}?charset\\s*=\\s*[\"']?([A-Za-z0-9_.:+\\-]+)".r

  /** WHATWG Encoding-registry label → JVM charset. The load-bearing
    * registry rule for crawls: the `latin1` / `iso-8859-1` / `ascii`
    * label FAMILY decodes as windows-1252 (its superset — real pages
    * declare latin-1 and then emit 0x80-0x9F curly quotes and the euro
    * sign, which latin-1 proper maps to control characters). Unknown or
    * JVM-unsupported labels return None so the caller's precedence chain
    * falls through to the next evidence source. */
  def charsetForLabel(label: String): Option[java.nio.charset.Charset] = {
    val mapped = label.trim.toLowerCase match {
      case "latin1" | "latin-1" | "latin_1" | "iso-8859-1" | "iso8859-1" |
           "iso_8859-1" | "l1" | "ascii" | "us-ascii" => "windows-1252"
      case other => other
    }
    scala.util.Try(java.nio.charset.Charset.forName(mapped)).toOption
  }

  /** [[charsetForLabel]] with the two extra WHATWG `<meta charset>`
    * normalization rules that apply only to META-SOURCED labels: a
    * meta-declared UTF-16 family label is treated as UTF-8 (the prescan
    * that found the declaration decoded the bytes ASCII-compatibly, so
    * the body cannot actually be UTF-16 — taking the label literally
    * would decode it as mojibake), and `x-user-defined` maps to
    * windows-1252 (its byte-preserving superset for document decoding). */
  def metaCharsetForLabel(label: String): Option[java.nio.charset.Charset] = {
    val l = label.trim.toLowerCase
    if (l == "x-user-defined")
      Some(java.nio.charset.Charset.forName("windows-1252"))
    else charsetForLabel(label).map { cs =>
      if (cs.name.startsWith("UTF-16"))
        java.nio.charset.StandardCharsets.UTF_8
      else cs
    }
  }

  /** Charset sniffing for an archived HTTP text payload, WHATWG
    * precedence: a byte-order mark (UTF-8 / UTF-16LE / UTF-16BE — a BOM
    * overrides every declaration) > a `charset` parameter in the HTTP
    * `Content-Type` header > a `<meta charset=…>` / `http-equiv` charset
    * declaration within the first 1024 bytes (scanned as ISO-8859-1;
    * every registered declaration syntax is ASCII-compatible) >
    * windows-1252, the WHATWG default real crawl pipelines fall back to
    * (NOT the JVM's UTF-8 default — undeclared legacy pages are
    * overwhelmingly cp1252). */
  def sniffCharset(contentType: Option[String],
      body: Array[Byte]): java.nio.charset.Charset =
    sniffCharsetWithBom(contentType, body)._1

  /** [[sniffCharset]] plus the length of the BOM that drove the
    * detection (0 when none did) — the single source of truth for BOM
    * signatures, so detection and [[decodeText]]'s stripping can never
    * drift: a header-declared UTF-16 body WITHOUT a BOM reports bomLen 0
    * and keeps its first two content bytes. */
  def sniffCharsetWithBom(contentType: Option[String],
      body: Array[Byte]): (java.nio.charset.Charset, Int) = {
    import java.nio.charset.StandardCharsets._
    def b(i: Int) = body(i) & 0xFF
    if (body.length >= 3 && b(0) == 0xEF && b(1) == 0xBB && b(2) == 0xBF)
      (UTF_8, 3)
    else if (body.length >= 2 && b(0) == 0xFF && b(1) == 0xFE) (UTF_16LE, 2)
    else if (body.length >= 2 && b(0) == 0xFE && b(1) == 0xFF) (UTF_16BE, 2)
    else {
      val declared = contentType
        .flatMap(ct => CharsetParamRe.findFirstMatchIn(ct).map(_.group(1)))
        .flatMap(charsetForLabel)
        .orElse {
          val prefix = new String(body, 0, math.min(1024, body.length), Latin1)
          MetaCharsetRe.findFirstMatchIn(prefix).map(_.group(1))
            .flatMap(metaCharsetForLabel)
        }
        .getOrElse(java.nio.charset.Charset.forName("windows-1252"))
      (declared, 0)
    }
  }

  /** Decode an archived HTTP text body to a String via [[sniffCharset]],
    * stripping the byte-order mark when one drove the detection (the BOM
    * is an encoding signature, not content). */
  def decodeText(contentType: Option[String], body: Array[Byte]): String = {
    val (cs, bomLen) = sniffCharsetWithBom(contentType, body)
    new String(body, bomLen, body.length - bomLen, cs)
  }

  /** Serialize records with spec framing (version line, headers with a
    * computed Content-Length, CRLFCRLF, payload, CRLFCRLF) — the writer
    * that certifies [[records]] in WarcSpec and builds q172's fixture. */
  def write(recs: Seq[(Seq[(String, String)], Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    recs.foreach { case (hdrs, payload) =>
      val head = new StringBuilder("WARC/1.0\r\n")
      hdrs.filterNot(_._1.equalsIgnoreCase("Content-Length"))
        .foreach { case (k, v) => head.append(k).append(": ").append(v).append("\r\n") }
      head.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
      out.write(head.toString.getBytes(Latin1))
      out.write(payload)
      out.write("\r\n\r\n".getBytes(Latin1))
    }
    out.toByteArray
  }

  /** An HTTP/1.1 200 response envelope around `body` (the payload shape
    * of a WARC response record). */
  def httpResponse(body: Array[Byte], contentType: String): Array[Byte] = {
    val head = ("HTTP/1.1 200 OK\r\nContent-Type: " + contentType +
      "\r\nContent-Length: " + body.length + "\r\n\r\n").getBytes(Latin1)
    head ++ body
  }

  /** Serialize records as a GZIP MEMBER STREAM — one gzip member per
    * record, members concatenated — which is how crawl archives actually
    * ship (`.warc.gz`, Common Crawl): per-record members let a reader
    * seek to any record offset and decompress just that record without
    * inflating the file prefix. */
  def writeGz(recs: Seq[(Seq[(String, String)], Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    recs.foreach { r =>
      // per-member stream, close()d so each member's native Deflater is
      // released eagerly (finish() alone leaks it until finalization —
      // measurable on a high-volume writer)
      val member = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(member)
      try { gz.write(write(Seq(r))) } finally gz.close()
      member.writeTo(out)
    }
    out.toByteArray
  }

  /** Parse a `.warc.gz` member stream: inflate ALL members (the JDK
    * GZIPInputStream walks concatenated members transparently), then
    * walk the concatenation with the same Content-Length framing —
    * member boundaries and record boundaries coincide by construction,
    * so whole-stream inflation and per-member inflation yield the same
    * records (WarcSpec pins that equivalence). */
  def recordsGz(bytes: Array[Byte]): Seq[Record] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try records(in.readAllBytes()) finally in.close()
  }
}
