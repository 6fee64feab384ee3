package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** RFC 9309 semantics: group selection/merging, longest-match precedence
  * with Allow winning ties, `*` wildcards, the `$` anchor, empty
  * Disallow, comments, and the allow-by-default rule. */
class RobotsSpec extends AnyFunSuite {

  test("group selection: specific token beats *, groups merge, fallback works") {
    val txt =
      """# policy
        |User-agent: megabot
        |Disallow: /mega
        |
        |User-agent: *
        |Disallow: /a
        |
        |User-agent: *
        |Disallow: /b
        |""".stripMargin
    // '*' groups MERGE: both /a and /b apply
    assert(!Robots.isAllowed(txt, "/a/x", "somebot"))
    assert(!Robots.isAllowed(txt, "/b/x", "somebot"))
    assert(Robots.isAllowed(txt, "/mega", "somebot"))
    // a crawler whose token matches a specific group uses ONLY it
    assert(!Robots.isAllowed(txt, "/mega", "MegaBot/1.0".toLowerCase))
    assert(Robots.isAllowed(txt, "/a/x", "megabot"))
  }

  test("longest match wins; Allow wins exact-length ties; default allow") {
    val rules = Robots.parse(
      "User-agent: *\nDisallow: /private/\nAllow: /private/pub/\n")
    assert(!Robots.isAllowed(rules, "/private/doc"))
    assert(Robots.isAllowed(rules, "/private/pub/x")) // longer Allow wins
    assert(Robots.isAllowed(rules, "/elsewhere"))     // no match → allowed
    val tie = Robots.parse(
      "User-agent: *\nDisallow: /x\nAllow: /x\n")
    assert(Robots.isAllowed(tie, "/x/anything")) // same octets → Allow
  }

  test("wildcards and the $ anchor") {
    val rules = Robots.parse(
      "User-agent: *\nDisallow: /*.pdf$\nDisallow: /a*/c\n")
    assert(!Robots.isAllowed(rules, "/docs/file.pdf"))
    assert(Robots.isAllowed(rules, "/docs/file.pdfx")) // $ anchors the end
    assert(!Robots.isAllowed(rules, "/abc/c"))
    assert(!Robots.isAllowed(rules, "/a/c/d")) // prefix rule, no anchor
    assert(Robots.isAllowed(rules, "/b/c"))
  }

  test("other records between consecutive User-agent lines do not split " +
      "the group (RFC 9309 §2.2.4)") {
    // `Sitemap:` between the two agent lines: both tokens must share ONE
    // group, so megabot inherits the Disallow that follows
    val txt =
      """User-agent: megabot
        |Sitemap: https://ex.com/sitemap.xml
        |User-agent: otherbot
        |Disallow: /x
        |""".stripMargin
    assert(!Robots.isAllowed(txt, "/x/a", "megabot"))
    assert(!Robots.isAllowed(txt, "/x/a", "otherbot"))
    // after a RULE line, an unknown record still doesn't matter, and the
    // next User-agent starts a fresh group as before
    val txt2 =
      """User-agent: a
        |Disallow: /a
        |Crawl-delay: 10
        |User-agent: b
        |Disallow: /b
        |""".stripMargin
    assert(!Robots.isAllowed(txt2, "/a/x", "a"))
    assert(Robots.isAllowed(txt2, "/b/x", "a")) // a's group closed at UA b
    assert(!Robots.isAllowed(txt2, "/b/x", "b"))
    assert(Robots.isAllowed(txt2, "/a/x", "b"))
  }

  test("empty Disallow is allow-all; prefixes match mid-segment; comments strip") {
    val open = Robots.parse("User-agent: *\nDisallow:\n")
    assert(open.isEmpty && Robots.isAllowed(open, "/anything"))
    val rules = Robots.parse(
      "User-agent: * # everyone\nDisallow: /tmp # scratch\n")
    assert(!Robots.isAllowed(rules, "/tmpfile")) // byte prefix, RFC-style
    assert(Robots.isAllowed(rules, "/t"))
  }
}
