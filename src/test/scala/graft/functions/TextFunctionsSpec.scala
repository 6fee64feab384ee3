package graft.functions

import graft.SparkSpec
import graft.multimodal.IntVec
import org.apache.spark.sql.functions._

/** Parity between the SQL `tokens` column and its Scala-side replica
  * `tokenizeLikeSql` — the typed flatMap operators (shingling, substring
  * windows) assume the two produce IDENTICAL token arrays, so any
  * divergence silently shifts shingles and window starts. */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    "Plain ASCII Words",
    "  leading and trailing  ",
    "\ttab\nnewlinevtab mixed\r\n",
    "", " ", "\n",
    // non-ASCII: exercises UTF8String.toLowerCaseSlow (default-locale
    // String.toLowerCase) vs the replica's fallback — the round-5 advice
    // divergence. Dotted/dotless I, sharp s, Greek final sigma, fullwidth.
    "İstanbul I ı TITLE",
    "Straße GROSS ΣΟΦΟΣ ΟΔΥΣΣΕΥΣ",
    "ＦＵＬＬＷＩＤＴＨ ＡＳＣＩＩ",
    "mixed İ ascii TAIL",
    " nbsp is not sql-space ")

  test("tokenizeLikeSql matches the SQL tokens column, incl. non-ASCII") {
    val sql = cases.toDF("t")
      .select(TextFunctions.tokens(col("t")).as("toks"))
      .collect().map(_.getSeq[String](0).toArray)
    val scala2 = cases.map(TextFunctions.tokenizeLikeSql)
    for (((s, q), c) <- scala2.zip(sql).zip(cases))
      assert(s.toSeq === q.toSeq, s"case '$c'")
  }

  // every non-ASCII char below is spelled as a \u escape: raw source
  // literals can be silently NFC-composed by editor/tool chains, which
  // would turn these composition assertions into tautologies
  test("nfc composes decomposed sequences and is idempotent") {
    assert(TextFunctions.nfc("e\u0301") === "\u00e9")
    assert(TextFunctions.nfc("A\u0300") === "\u00c0")
    assert(TextFunctions.nfc("o\u0308n\u0303") === "\u00f6\u00f1")
    // already-composed and plain ASCII are fixed points
    assert(TextFunctions.nfc("\u00e9") === "\u00e9")
    assert(TextFunctions.nfc("plain ascii 42") === "plain ascii 42")
    // idempotence on a mixed string (x + marks has no composed form)
    val s = "Cafe\u0301 caf\u00e9 x\u0331\u0302"
    assert(TextFunctions.nfc(TextFunctions.nfc(s)) === TextFunctions.nfc(s))
    // canonical equivalence: both spellings meet at the same bytes
    assert(TextFunctions.nfc("Cafe\u0301") === TextFunctions.nfc("Caf\u00e9"))
  }

  test("graphemeLen counts clusters, not codepoints") {
    assert(TextFunctions.graphemeLen("abc") === 3L)
    assert(TextFunctions.graphemeLen("e\u0301") === 1L) // base + mark
    assert(TextFunctions.graphemeLen("x\u0331\u0302") === 1L) // 2 marks
    assert(TextFunctions.graphemeLen("a\u0301b\u0300") === 2L)
    assert(TextFunctions.graphemeLen("") === 0L)
    // an astral-plane codepoint (2 UTF-16 units) is one grapheme
    assert(TextFunctions.graphemeLen(
      new String(Character.toChars(0x1D11E))) === 1L)
  }

  test("IntVec: growth, slice append, exact toArray") {
    val v = new IntVec(2)
    (0 until 1000).foreach(i => v += i * 3)
    v.addSlice(Array(7, 8, 9, 10), 3)
    assert(v.length === 1003)
    assert(!v.isEmpty)
    val a = v.toArray
    assert(a.length === 1003)
    assert(a(0) === 0 && a(999) === 2997 && a.takeRight(3).toSeq === Seq(7, 8, 9))
    assert((new IntVec()).isEmpty)
  }
}

/** Round-13 grapheme-budget + compatibility-normalization surface. */
class GraphemeChunkSpec extends SparkSpec {

  test("graphemeBoundaries and graphemeLen agree; combining marks attach") {
    val s = "áb́́c" // á (2cp), b́́ (3cp), c — 3 clusters
    val b = TextFunctions.graphemeBoundaries(s)
    assert(b.toSeq === Seq(0, 2, 5, 6))
    assert(TextFunctions.graphemeLen(s) === 3L)
    assert(TextFunctions.graphemeBoundaries("").toSeq === Seq(0))
    assert(TextFunctions.graphemeLen("") === 0L)
  }

  test("chunkByGraphemes never splits a cluster and budgets graphemes") {
    // 7 clusters, every one 2 codepoints: aX bX cX dX eX fX gX (X = U+0301)
    val s = "abcdefg".flatMap(c => Seq(c, '́')).mkString
    val chunks = TextFunctions.chunkByGraphemes(s, 3, 2)
    // windows at graphemes 0, 2, 4 — the last window reaches the end, so
    // no further stride starts (q108's ceil((n-win)/stride)+1 policy)
    assert(chunks.map(_._1) === Seq(0L, 1L, 2L))
    assert(chunks.map(_._4) === Seq(3L, 3L, 3L))
    // codepoint start offsets: cluster g starts at codepoint 2g
    assert(chunks.map(_._2) === Seq(1L, 5L, 9L))
    // every chunk starts with a base char and ends with the combining mark
    chunks.foreach { case (_, _, c, _) =>
      assert(!c.isEmpty && c.last == '́' && c.head != '́', c)
    }
    // short and empty inputs yield exactly one chunk
    assert(TextFunctions.chunkByGraphemes("ab", 5, 3) ===
      Seq((0L, 1L, "ab", 2L)))
    assert(TextFunctions.chunkByGraphemes("", 5, 3) === Seq((0L, 1L, "", 0L)))
    // supplementary-plane text: start_pos counts codepoints, not chars
    val sup = "😀😁😂" // 3 emoji, 6 chars
    val sc = TextFunctions.chunkByGraphemes(sup, 1, 1)
    assert(sc.map(_._2) === Seq(1L, 2L, 3L))
    assert(sc.map(_._3) === Seq("😀", "😁", "😂"))
  }

  test("htmlToText: tags, raw-text elements, comments, entities, normalization") {
    val f = TextFunctions.htmlToText _
    // block vs inline separators; raw source newline is inline
    assert(f("<p>a <b>b</b>\nc</p><p>d</p>") === "a b c\nd")
    // script/style content dropped wholly, even when it LOOKS like markup
    assert(f("<p>x</p><script>var s=\"<p>no</p>\";</script><p>y</p>") === "x\ny")
    assert(f("<style>p{}</style><p>z</p>") === "z")
    // case-insensitive close tag, attribute on the open tag
    assert(f("<SCRIPT type=\"text/javascript\">1<2</ScRiPt><p>ok</p>") === "ok")
    // unclosed raw-text runs to EOF
    assert(f("<p>keep</p><script>lost forever") === "keep")
    // comments and HTML5 bogus comments
    assert(f("a<!-- <p>hidden</p> -->b") === "ab") // a comment is NOT a separator
    // entities: named, decimal, hex, nbsp, literal ampersand
    assert(f("&lt;tag&gt; &amp; &quot;q&quot; &apos;a&apos;") === "<tag> & \"q\" 'a'")
    assert(f("&#82;&#x41;&#x1F600;") === "RA😀")
    assert(f("fish & chips &bogus; &#xZZ;") === "fish & chips &bogus; &#xZZ;")
    assert(f("a&nbsp;b") === "a b")
    // quote-aware tag scan: '>' inside a quoted attribute
    assert(f("<a href=\"x>y\">link</a> out") === "link out")
    // whitespace normalization: collapse, trim, drop empty lines
    assert(f("<div>  a   b  </div><div>   </div><div>c</div>") === "a b\nc")
    // bogus markup consumed to '>'
    assert(f("<!DOCTYPE html><?xml v?><p>t</p>") === "t")
    // HTML5 literal '<': next char is not a letter, '/', '!' or '?' —
    // the prose after it must NOT be swallowed up to the next '>'
    assert(f("<p>3 < 4 is true</p>") === "3 < 4 is true")
    // ...but '<' + letter still opens a tag (HTML5 tag-open state)
    assert(f("<p>x <y attr>swallowed? no, tag ends</p>") === "x swallowed? no, tag ends")
    assert(f("<p>a < b</p><p>c > d</p>") === "a < b\nc > d")
    assert(f("<p>5 <= 6</p>") === "5 <= 6")
    assert(f("trailing <") === "trailing <")
    // '<' + digit is literal too
    assert(f("<p>size <3 hearts</p>") === "size <3 hearts")
    // tag-open is ASCII alpha SPECIFICALLY: '<' before a non-ASCII letter
    // is literal text, not a tag that swallows prose to the next '>'
    assert(f("<p>\u03b5 <\u03b4 whenever x &gt; 0</p>") ===
      "\u03b5 <\u03b4 whenever x > 0")
  }

  test("htmlBlocks counts anchors per block; htmlMainContent applies the ratio rule") {
    val html = "<ul><li><a href=\"/\">Home</a></li><li><a href=\"/x\">About</a></li></ul>" +
      "<p>long prose with no links here</p>" +
      "<p>Read <a href=\"/m\">more</a> about things here</p>" +
      "<div><a href=\"/t\">Terms</a> | <a href=\"/p\">Privacy</a></div>"
    val blocks = TextFunctions.htmlBlocks(html)
    assert(blocks === Seq(("Home", 1L), ("About", 1L),
      ("long prose with no links here", 0L),
      ("Read more about things here", 1L),
      ("Terms | Privacy", 2L)))
    val (main, kept, dropped) = TextFunctions.htmlMainContent(html, 4)
    assert(main === "long prose with no links here\nRead more about things here")
    assert((kept, dropped) === ((2L, 3L)))
    // htmlToText is exactly the block texts joined — the refactor invariant
    assert(TextFunctions.htmlToText(html) === blocks.map(_._1).mkString("\n"))
    // anchor spanning a block boundary counts where it OPENS
    assert(TextFunctions.htmlBlocks("<p>a <a href=\"/\">x<p>y</a> b</p>")
      .map(_._2) === Seq(1L, 0L))
  }

  test("nfkcFold collapses compatibility variants and case") {
    val f = TextFunctions.nfkcFold _
    assert(f("ﬁle") === "file")       // ligature
    assert(f("Ａ９") === "a9")     // fullwidth + case
    assert(f("㎞２") === "km2")    // unit square
    assert(f("Ⅸ") === "ix")           // roman numeral
    assert(f("FILE") === "file")
    // canonical-only input folds too (NFKC ⊇ NFC)
    assert(f("é") === "é")
    // documented policy: Locale.ROOT lowercase, not full case folding
    assert(f("straße") === "straße")
  }
}
