package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** WARC walker: writer round-trip, the phantom-boundary trap that
  * separates Content-Length framing from delimiter splitting, truncated
  * input, and header case-insensitivity. */
class WarcSpec extends AnyFunSuite {

  private val L1 = java.nio.charset.StandardCharsets.ISO_8859_1

  test("write → records round-trips headers and payload bytes") {
    val payload = "hello é world".getBytes(L1)
    val bytes = Warc.write(Seq(
      (Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "http://x/y"), payload),
      (Seq("WARC-Type" -> "metadata"), "k: v".getBytes(L1))))
    val recs = Warc.records(bytes)
    assert(recs.length === 2)
    assert(recs(0).recordType === Some("response"))
    assert(recs(0).targetUri === Some("http://x/y"))
    assert(recs(0).payload.toSeq === payload.toSeq)
    assert(recs(1).recordType === Some("metadata"))
  }

  test("a payload CONTAINING record-boundary bytes does not split the record") {
    // the delimiter-splitting trap: record 1's payload quotes a full
    // WARC header; only Content-Length framing walks past it intact
    val trap = ("quoting a record:\r\nWARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 4\r\n\r\nfake\r\n\r\nend of quote").getBytes(L1)
    val bytes = Warc.write(Seq(
      (Seq("WARC-Type" -> "warcinfo"), trap),
      (Seq("WARC-Type" -> "response"), Warc.httpResponse("<p>real</p>".getBytes(L1), "text/html"))))
    val recs = Warc.records(bytes)
    assert(recs.length === 2)
    assert(recs(0).recordType === Some("warcinfo"))
    assert(recs(0).payload.toSeq === trap.toSeq)
    assert(recs(1).recordType === Some("response"))
  }

  test("truncated trailing record is dropped, earlier records survive") {
    val good = Warc.write(Seq((Seq("WARC-Type" -> "response"), "abc".getBytes(L1))))
    val truncated = good ++ "WARC/1.0\r\nContent-Length: 100\r\n\r\nshort".getBytes(L1)
    val recs = Warc.records(truncated)
    assert(recs.length === 1)
    assert(new String(recs(0).payload, L1) === "abc")
  }

  test("gzip member stream: round-trip, and per-member ≡ whole-stream inflation") {
    val recs = Seq(
      (Seq("WARC-Type" -> "warcinfo"), "info é payload".getBytes(L1)),
      (Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "http://g/z"),
        Warc.httpResponse("<p>gz</p>".getBytes(L1), "text/html")))
    val gz = Warc.writeGz(recs)
    // it IS a member stream: two independent gzip magics present
    val magics = gz.indices.count(i => i + 1 < gz.length &&
      (gz(i) & 0xff) == 0x1f && (gz(i + 1) & 0xff) == 0x8b)
    assert(magics >= 2, s"expected per-record gzip members, found $magics magic(s)")
    val got = Warc.recordsGz(gz)
    assert(got.length === 2)
    assert(got(0).payload.toSeq === recs(0)._2.toSeq)
    assert(got(1).targetUri === Some("http://g/z"))
    // per-member inflation (seek shape) yields the same records: split at
    // the second magic and parse each member independently
    val cut = (1 until gz.length).find(i =>
      (gz(i) & 0xff) == 0x1f && (gz(i + 1) & 0xff) == 0x8b).get
    val a = Warc.recordsGz(java.util.Arrays.copyOfRange(gz, 0, cut))
    val b = Warc.recordsGz(java.util.Arrays.copyOfRange(gz, cut, gz.length))
    assert((a ++ b).map(_.headers) === got.map(_.headers))
    assert((a ++ b).map(_.payload.toSeq) === got.map(_.payload.toSeq))
  }

  test("header lookup is case-insensitive; httpBody splits the envelope") {
    val bytes = ("WARC/1.0\r\nwarc-type: response\r\ncontent-length: 5\r\n\r\n" +
      "12345\r\n\r\n").getBytes(L1)
    val recs = Warc.records(bytes)
    assert(recs.length === 1 && recs(0).recordType === Some("response"))
    val http = Warc.httpResponse("<b>x</b>".getBytes(L1), "text/html")
    assert(new String(Warc.httpBody(http).get, L1) === "<b>x</b>")
    assert(Warc.httpBody("not http".getBytes(L1)) === None)
  }

  test("malformed or negative Content-Length stops the walk instead of throwing") {
    val good = Warc.write(Seq((Seq("WARC-Type" -> "response"), "abc".getBytes(L1))))
    val badLen = good ++
      "WARC/1.0\r\nContent-Length: 12abc\r\n\r\npayload".getBytes(L1)
    assert(Warc.records(badLen).length === 1) // parsed, not crashed
    val negLen = good ++
      "WARC/1.0\r\nContent-Length: -7\r\n\r\npayload".getBytes(L1)
    assert(Warc.records(negLen).length === 1)
  }

  test("headers-only HTTP envelope (no CRLFCRLF) is dropped, not an empty body") {
    val truncated = "HTTP/1.1 200 OK\r\nContent-Type: text/html".getBytes(L1)
    assert(Warc.httpBody(truncated) === None)
  }

  test("httpHeader finds headers case-insensitively; None off the happy path") {
    val payload = Warc.httpResponse("body".getBytes(L1), "text/html; charset=UTF-8")
    assert(Warc.httpHeader(payload, "content-TYPE") ===
      Some("text/html; charset=UTF-8"))
    assert(Warc.httpHeader(payload, "X-Absent") === None)
    assert(Warc.httpHeader("not http".getBytes(L1), "Content-Type") === None)
    assert(Warc.httpHeader("HTTP/1.1 200 OK\r\nA: b".getBytes(L1), "A") === None)
  }

  test("httpHeader joins RFC 9110 obs-fold continuation lines") {
    val payload = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html;\r\n \tcharset=UTF-8\r\n" + // folded value
      "X-Next: intact\r\n\r\nbody").getBytes(L1)
    assert(Warc.httpHeader(payload, "Content-Type") ===
      Some("text/html; charset=UTF-8"))
    // the continuation line never surfaces as a separate garbage header,
    // and headers after the fold still resolve
    assert(Warc.httpHeader(payload, "X-Next") === Some("intact"))
    assert(Warc.httpBody(payload).map(b => new String(b, L1)) === Some("body"))
  }

  test("WET conversion records round-trip URI and UTF-8 text through .gz members") {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val gz = Warc.writeGz(Seq(
      Warc.wetRecord("http://a/1", "wét text © Ω"),
      Warc.wetRecord("http://a/2", "plain")))
    val back = Warc.recordsGz(gz)
    assert(back.map(_.recordType) === Seq(Some("conversion"), Some("conversion")))
    assert(back.map(_.targetUri) === Seq(Some("http://a/1"), Some("http://a/2")))
    assert(back.map(r => new String(r.payload, utf8)) ===
      Seq("wét text © Ω", "plain"))
    assert(back.head.header("Content-Type") === Some("text/plain"))
  }

  test("charset sniffing follows WHATWG precedence: BOM > header > meta > cp1252") {
    import java.nio.charset.StandardCharsets._
    val bom = Array(0xEF, 0xBB, 0xBF).map(_.toByte)
    // a BOM overrides a contradicting header declaration
    assert(Warc.sniffCharset(Some("text/html; charset=iso-8859-1"),
      bom ++ "x".getBytes(UTF_8)) === UTF_8)
    assert(Warc.sniffCharset(None,
      Array(0xFF, 0xFE).map(_.toByte) ++ "x".getBytes(UTF_16LE)) === UTF_16LE)
    assert(Warc.sniffCharset(None,
      Array(0xFE, 0xFF).map(_.toByte) ++ "x".getBytes(UTF_16BE)) === UTF_16BE)
    // header beats meta
    val meta = "<html><meta charset=\"koi8-r\">hi".getBytes(L1)
    assert(Warc.sniffCharset(Some("text/html; charset=UTF-8"), meta) === UTF_8)
    // meta beats the default (both syntaxes)
    assert(Warc.sniffCharset(Some("text/html"), meta).name() === "KOI8-R")
    val httpEquiv = ("<meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=utf-8\">").getBytes(L1)
    assert(Warc.sniffCharset(None, httpEquiv) === UTF_8)
    // undeclared → windows-1252, NOT the JVM default
    assert(Warc.sniffCharset(Some("text/html"), "plain".getBytes(L1)).name()
      === "windows-1252")
    // the WHATWG superset rule: the latin1 label family decodes as cp1252
    assert(Warc.sniffCharset(Some("text/html; charset=latin-1"),
      "x".getBytes(L1)).name() === "windows-1252")
    // an unknown label falls through to the next evidence source
    assert(Warc.sniffCharset(Some("text/html; charset=bogus-enc"), meta)
      .name() === "KOI8-R")
  }

  test("WHATWG meta normalization: meta-declared UTF-16 reads as UTF-8, " +
      "x-user-defined as cp1252; header-declared UTF-16 stays literal") {
    import java.nio.charset.StandardCharsets._
    // the prescan that FOUND the meta decoded ASCII-compatibly, so the
    // body cannot be UTF-16 — taking the label literally would decode
    // the page as mojibake
    val metaU16 = "<meta charset=\"utf-16\">café".getBytes(UTF_8)
    assert(Warc.sniffCharset(Some("text/html"), metaU16) === UTF_8)
    assert(Warc.decodeText(Some("text/html"), metaU16) ===
      "<meta charset=\"utf-16\">café")
    val metaU16le = "<meta charset=\"UTF-16LE\">x".getBytes(UTF_8)
    assert(Warc.sniffCharset(None, metaU16le) === UTF_8)
    val metaXud = "<meta charset=\"x-user-defined\">x".getBytes(L1)
    assert(Warc.sniffCharset(None, metaXud).name() === "windows-1252")
    // an HTTP-header UTF-16 declaration is NOT remapped (no prescan was
    // involved); without a BOM the bytes decode as declared
    assert(Warc.sniffCharset(Some("text/plain; charset=UTF-16LE"),
      "AB".getBytes(UTF_16LE)) === UTF_16LE)
  }

  test("decodeText strips only a BOM that is present; cp1252 maps 0x80 to €") {
    import java.nio.charset.StandardCharsets._
    val bom = Array(0xEF, 0xBB, 0xBF).map(_.toByte)
    assert(Warc.decodeText(None, bom ++ "café".getBytes(UTF_8)) === "café")
    // header-declared UTF-16LE WITHOUT a BOM keeps its first content bytes
    assert(Warc.decodeText(Some("text/plain; charset=UTF-16LE"),
      "AB".getBytes(UTF_16LE)) === "AB")
    assert(Warc.decodeText(None,
      Array(0xFF, 0xFE).map(_.toByte) ++ "Ωλ".getBytes(UTF_16LE)) === "Ωλ")
    // iso-8859-1-declared € (0x80) survives via the cp1252 superset
    assert(Warc.decodeText(Some("text/html; charset=iso-8859-1"),
      Array(0x80.toByte)) === "€")
  }
}
