package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-data-pipeline surface
  * (SURVEY.md §2.10): tokenization, shingling, stopword heuristics, quality
  * signals, rolling-hash fingerprints. All pure Catalyst expression trees
  * (no UDFs) so they stay inside whole-stage codegen; every formula has a
  * 1:1 ANSI SQL mirror used by the oracle queries.
  */
object TextFunctions {

  /** Whitespace-normalized lowercase tokens. The explicit collapse-then-
    * split keeps Spark `split` and DuckDB `string_split` in exact agreement
    * on empty-token edge cases. */
  def tokens(text: Column): Column =
    split(regexp_replace(trim(lower(text)), "\\s+", " "), " ")

  /** Unicode canonical composition (NFC) — the normalization a real
    * corpus needs BEFORE exact dedup: decomposed and precomposed accent
    * sequences are byte-distinct but canonically equal, so un-normalized
    * exact dedup silently keeps both (q161/q162 gate this against
    * DuckDB's `nfc_normalize`). Per-row JVM CPU (java.text.Normalizer)
    * inside typed map/mapPartitions operators — never a SQL UDF. */
  def nfc(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  /** One reusable UAX #29 grapheme iterator per thread: BreakIterator
    * construction is the dominant cost in per-row hot paths (typed
    * map/mapPartitions call these once per document), and instances are
    * mutable but fully reusable via setText — a ThreadLocal serves both
    * Spark task threads and driver-side calls without sharing state. */
  private val graphemeIter =
    ThreadLocal.withInitial[java.text.BreakIterator](() =>
      java.text.BreakIterator.getCharacterInstance(java.util.Locale.ROOT))

  /** Extended-grapheme-cluster count (user-perceived characters) — the
    * length a truncation/chunking policy should budget with: a combining
    * mark adds a codepoint but not a grapheme. java.text.BreakIterator's
    * character instance implements the same UAX #29 clustering DuckDB's
    * `length_grapheme` counts. */
  def graphemeLen(s: String): Long = {
    val it = graphemeIter.get()
    it.setText(s)
    var n = 0L
    while (it.next() != java.text.BreakIterator.DONE) n += 1
    n
  }

  /** Grapheme-cluster boundary offsets of `s`: UTF-16 char positions
    * b(0)=0 < … < b(nG) = s.length, one entry PAST each cluster — the
    * walk both [[graphemeLen]] and [[chunkByGraphemes]] budget with. */
  def graphemeBoundaries(s: String): Array[Int] = {
    val it = graphemeIter.get()
    it.setText(s)
    val buf = new scala.collection.mutable.ArrayBuffer[Int](s.length + 1)
    buf += 0
    var b = it.next()
    while (b != java.text.BreakIterator.DONE) { buf += b; b = it.next() }
    buf.toArray
  }

  /** Grapheme-budgeted overlapping chunks: windows of `win` grapheme
    * clusters at a `stride`-cluster step — the truncation policy a real
    * corpus needs where q108's codepoint windows mis-budget combined
    * characters (a decomposed é is 2 codepoints but 1 user-perceived
    * character, and a window must never split base from combining mark).
    * Returns (chunk_idx, start_pos, chunk, chunk_glen) per window, where
    * start_pos is the 1-based CODEPOINT offset of the chunk (the
    * engine-neutral provenance unit: Java char offsets would diverge
    * from any non-UTF-16 engine on supplementary-plane text). An empty
    * or short document yields exactly one (possibly short) chunk, like
    * the codepoint chunker. */
  def chunkByGraphemes(s: String, win: Int, stride: Int): Seq[(Long, Long, String, Long)] = {
    require(win > 0 && stride > 0, "window and stride must be positive")
    val b = graphemeBoundaries(s)
    val nG = b.length - 1
    val nChunks = math.max(1L, ((nG - win + stride - 1) max 0) / stride + 1)
    (0L until nChunks).map { k =>
      val gs = (k * stride).toInt
      val ge = math.min(gs + win, nG)
      val startChar = b(gs)
      (k, s.codePointCount(0, startChar) + 1L,
        s.substring(startChar, b(ge)), (ge - gs).toLong)
    }
  }

  /** Unicode compatibility composition (NFKC) + Locale.ROOT lowercase —
    * the aggressive normalization a multi-source corpus needs before
    * content-hash dedup when canonically-DISTINCT spellings should also
    * collapse: ligatures (ﬁ → fi), fullwidth forms (Ａ → A), unit squares
    * (㎞ → km), roman numerals (Ⅸ → IX), then case-fold. The fold is
    * Locale.ROOT String.toLowerCase, NOT full UAX case folding — the one
    * visible divergence is ß (full folding maps it to ss; toLowerCase
    * keeps it), a documented policy choice matching what e.g. most SQL
    * engines' lower() does. NFC-only canonical dedup is
    * [[graft.operators.Dedup.exactNormalized]]'s gentler sibling. */
  def nfkcFold(s: String): String =
    java.text.Normalizer
      .normalize(s, java.text.Normalizer.Form.NFKC)
      .toLowerCase(java.util.Locale.ROOT)

  /** Scala-side replica of [[tokens]] for typed flatMap operators
    * (shingling, substring windows): SQL `trim` strips SPACES only, and
    * the collapse-then-split keeps leading/trailing empty tokens — a plain
    * `String.trim.split("\\s+")` diverges on text with leading/trailing
    * non-space whitespace and would shift oracle-visible positions.
    *
    * Lowercasing mirrors Spark's `lower()` exactly
    * (`UTF8String.toLowerCase`, verified against the 4.1.2 bytecode):
    * full-ASCII strings take a bytewise A–Z path; anything else falls back
    * to DEFAULT-locale `String.toLowerCase()` — NOT `Locale.ROOT`. Under
    * e.g. a Turkish default JVM locale, non-ASCII text containing 'I'
    * lowercases to 'ı' in both the SQL `tokens` column and here, keeping
    * shingle and window starts aligned; a `Locale.ROOT` replica would
    * silently diverge from the oracle-visible column. */
  def tokenizeLikeSql(text: String): Array[String] = {
    var ascii = true
    var i = 0
    while (ascii && i < text.length) {
      if (text.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    val lowered =
      if (ascii) text.toLowerCase(java.util.Locale.ROOT) // == bytewise A–Z
      else text.toLowerCase() // UTF8String.toLowerCaseSlow: default locale
    lowered.replaceAll("^ +| +$", "").replaceAll("\\s+", " ").split(" ", -1)
  }

  /** Word n-gram shingles (space-joined), as an array; distinct-ified by
    * callers that need set semantics. element_at composition instead of
    * slice+concat_ws: no per-shingle array allocation in the lambda. */
  def shingles(toks: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(0))),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*))

  /** Occurrence count of function-word tokens — the language-ID /
    * quality-score building block. */
  def stopwordHits(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(stopwords)))

  /** Deterministic rolling polynomial fingerprint over the first `maxChars`
    * characters: acc ← (acc·31 + ascii(c)) mod 1e9+7. Engine-independent
    * (document fingerprinting, §2.10). */
  def rollingFingerprint(text: Column, maxChars: Int): Column =
    aggregate(
      sequence(lit(1), least(length(text), lit(maxChars))),
      lit(0L),
      (acc, i) => (acc * lit(31L) + ascii(text.substr(i, lit(1)))) % lit(1000000007L))

  /** Tags whose boundary separates text BLOCKS (a newline in the
    * extracted text); all other tags are inline (a space). The usual
    * structural set a web-corpus extractor keys on. */
  private val HtmlBlockTags = Set(
    "p", "br", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul",
    "ol", "tr", "td", "th", "thead", "tbody", "table", "title",
    "blockquote", "pre", "hr", "section", "article", "header", "footer",
    "nav", "form", "dl", "dt", "dd")

  private val HtmlEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  /** HTML → text BLOCKS with per-block anchor counts — the state
    * machine behind [[htmlToText]], exposed because boilerplate
    * classification (q171) needs the block structure WITH link counts:
    * each returned (text, nLinks) is one normalized non-empty block
    * (the text between block-tag separators), and nLinks counts the
    * `<a>` OPEN tags whose open position falls inside that block (an
    * anchor spanning a block boundary counts where it opens). Same
    * single pass, same policy as [[htmlToText]] — which is exactly the
    * block texts joined with newlines. */
  def htmlBlocks(html: String): Seq[(String, Long)] = {
    val segs = htmlScan(html)
    segs.iterator
      .map { case (raw, links) =>
        (raw.replaceAll("[ \\t\\x0B\\f\\r]+", " ").trim, links) }
      .filter(_._1.nonEmpty)
      .toSeq
  }

  /** HTML → text extraction — the ENTRY stage of every web-trained
    * corpus (WET-style content extraction), as a single-pass JVM state
    * machine (per-row typed map/mapPartitions CPU — never a SQL UDF,
    * never a regex over the whole document). Policy, stated exactly so
    * a closed-form oracle can reconstruct it:
    *
    *   - `<script>`/`<style>` elements are RAW-TEXT: their entire
    *     content is dropped up to the case-insensitive matching close
    *     tag (markup-looking strings inside them are not markup);
    *     unclosed raw-text runs to EOF.
    *   - `<!-- comments -->` are dropped; `<!`/`<?` bogus markup is
    *     consumed to the next `>` (the HTML5 bogus-comment rule).
    *   - Every other tag is replaced by a separator: a NEWLINE when the
    *     tag name is in [[HtmlBlockTags]] (both open and close count — a
    *     block boundary is a block boundary), a SPACE otherwise. Tag
    *     attributes are quote-aware, so `>` inside a quoted attribute
    *     value does not end the tag.
    *   - Character references decode: the five XML-core named entities
    *     plus nbsp (to a plain space), `&#NNN;` decimal and `&#xHH;`
    *     hex (any scalar value, supplementary planes included); an `&`
    *     that does not parse as a reference is literal.
    *   - Raw whitespace in text content (including source newlines) is
    *     inline: only block-tag separators create line structure.
    *   - Normalization: per line, horizontal whitespace collapses to one
    *     space and ends are trimmed; empty lines drop; lines join with
    *     `\n`.
    *
    * The output feeds the rest of the text family directly — notably
    * line-level dedup (Dedup.lineDedup), which consumes exactly this
    * line structure. */
  def htmlToText(html: String): String =
    htmlBlocks(html).map(_._1).mkString("\n")

  /** The one-pass scan shared by [[htmlToText]] and [[htmlBlocks]]:
    * raw (un-normalized) text segments split at block-tag separators,
    * each with its count of `<a>` open tags. */
  private def htmlScan(html: String): Seq[(String, Long)] = {
    val n = html.length
    val segs = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var out = new java.lang.StringBuilder(64)
    var links = 0L
    def flush(): Unit = {
      segs += ((out.toString, links))
      out = new java.lang.StringBuilder(64)
      links = 0L
    }
    var i = 0

    // index just past the closing '>' of the tag starting at '<' (pos),
    // honoring quoted attribute values; n if unterminated
    def tagEnd(pos: Int): Int = {
      var k = pos + 1
      var quote: Char = 0
      while (k < n) {
        val c = html.charAt(k)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '>') return k + 1
        k += 1
      }
      n
    }

    def isAsciiAlpha(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

    def tagNameAt(pos: Int): String = {
      var k = pos + 1
      if (k < n && html.charAt(k) == '/') k += 1
      val st = k
      while (k < n && html.charAt(k).isLetterOrDigit) k += 1
      html.substring(st, k).toLowerCase(java.util.Locale.ROOT)
    }

    // first case-insensitive occurrence of "</name" at or after `from`
    // whose next char closes the name (whitespace or '>'), else -1
    def findCloseTag(name: String, from: Int): Int = {
      val needle = "</" + name
      var k = from
      while (k >= 0 && k + needle.length <= n) {
        if (html.regionMatches(true, k, needle, 0, needle.length)) {
          val after = k + needle.length
          if (after >= n || html.charAt(after) == '>' ||
              Character.isWhitespace(html.charAt(after))) return k
        }
        k += 1
      }
      -1
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n &&
            (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val e = html.indexOf('>', i + 1) // HTML5 bogus comment
          i = if (e < 0) n else e + 1
        } else if (i + 1 >= n || !(isAsciiAlpha(html.charAt(i + 1)) ||
            html.charAt(i + 1) == '/')) {
          // HTML5: '<' not followed by an ASCII letter, '/', '!' or '?'
          // is literal text ("3 < 4", unescaped '<' in real crawls) —
          // emit it instead of swallowing prose up to the next '>'. The
          // tag-open rule is ASCII alpha SPECIFICALLY: '<' before a
          // Greek/Cyrillic/CJK letter is also literal text
          out.append('<')
          i += 1
        } else {
          val name = tagNameAt(i)
          val isClose = html.charAt(i + 1) == '/'
          if (!isClose && name.isEmpty) {
            // '<' + letter is unreachable here, but guard the invariant
            out.append('<')
            i += 1
          } else {
          val afterOpen = tagEnd(i)
          if (!isClose && (name == "script" || name == "style")) {
            val closeAt = findCloseTag(name, afterOpen)
            out.append(' ')
            i = if (closeAt < 0) n else tagEnd(closeAt)
          } else {
            if (name == "a" && !isClose) links += 1
            if (HtmlBlockTags(name)) flush() else out.append(' ')
            i = afterOpen
          }
          }
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        val decoded: Option[String] =
          if (semi < 0 || semi > i + 12) None
          else {
            val body = html.substring(i + 1, semi)
            if (body.startsWith("#x") || body.startsWith("#X")) {
              try Some(new String(Character.toChars(
                Integer.parseInt(body.substring(2), 16))))
              catch { case _: Exception => None }
            } else if (body.startsWith("#")) {
              try Some(new String(Character.toChars(
                Integer.parseInt(body.substring(1)))))
              catch { case _: Exception => None }
            } else HtmlEntities.get(body)
          }
        decoded match {
          case Some(s) => out.append(s); i = semi + 1
          case None => out.append('&'); i += 1
        }
      } else {
        // raw whitespace in content is inline; only block tags break lines
        out.append(if (Character.isWhitespace(c)) ' ' else c)
        i += 1
      }
    }
    flush()
    segs.toSeq
  }

  /** jusText-style main-content selection over [[htmlBlocks]]: a block
    * survives iff it has NO anchors, or carries at least
    * `tokensPerLink` whitespace-separated tokens per anchor — short
    * link-dense blocks (nav bars, footers, related-links lists) are
    * boilerplate, long prose with an occasional inline link is content.
    * Returns (mainText = surviving blocks joined with \n, nKept,
    * nDropped). The rule is deliberately closed-form so a gate can
    * reconstruct it (q171). */
  def htmlMainContent(html: String, tokensPerLink: Int): (String, Long, Long) = {
    val blocks = htmlBlocks(html)
    val (keep, drop) = blocks.partition { case (t, l) =>
      l == 0 || t.split(" ").length >= tokensPerLink * l
    }
    (keep.map(_._1).mkString("\n"), keep.size.toLong, drop.size.toLong)
  }
}
