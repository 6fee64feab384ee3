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

  test("header lookup is case-insensitive; httpBody splits the envelope") {
    val bytes = ("WARC/1.0\r\nwarc-type: response\r\ncontent-length: 5\r\n\r\n" +
      "12345\r\n\r\n").getBytes(L1)
    val recs = Warc.records(bytes)
    assert(recs.length === 1 && recs(0).recordType === Some("response"))
    val http = Warc.httpResponse("<b>x</b>".getBytes(L1), "text/html")
    assert(new String(Warc.httpBody(http).get, L1) === "<b>x</b>")
    assert(Warc.httpBody("not http".getBytes(L1)) === None)
  }
}
