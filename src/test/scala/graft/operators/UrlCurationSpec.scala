package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** UrlCuration beyond the q173–q175 fixture shapes: idempotence,
  * non-default ports, single-label hosts, mixed-case tracking keys,
  * fragment-only suffixes, and cap/blocklist semantics on hand-built
  * frames. */
class UrlCurationSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u")
      .select(UrlCuration.canonicalizeUrl(col("u")).as("c"))
      .as[String].collect().toSeq

  test("canonicalizeUrl: scheme/host lowering, default ports, www, fragments") {
    assert(canon(
      "HTTP://WWW.Example.COM:80/Path/To?x=1#frag",
      "https://Site.ORG:443/a",
      "http://host.net/#top",
      "http://host.net/") === Seq(
      "http://example.com/Path/To?x=1", // path case PRESERVED
      "https://site.org/a",
      "http://host.net",
      "http://host.net"))
  }

  test("canonicalizeUrl: non-default ports and other schemes survive") {
    assert(canon(
      "http://a.com:8080/x",
      "https://a.com:80/x", // 80 is NOT the https default
      "ftp://Files.A.com/pub/") === Seq(
      "http://a.com:8080/x",
      "https://a.com:80/x",
      "ftp://files.a.com/pub"))
  }

  test("canonicalizeUrl: tracking params at every position, any case") {
    assert(canon(
      "http://a.com/p?utm_source=x",
      "http://a.com/p?utm_source=x&keep=1",
      "http://a.com/p?keep=1&UTM_Campaign=y",
      "http://a.com/p?keep=1&fbclid=z&also=2",
      "http://a.com/p?gclid=1&msclkid=2&ref_src=t") === Seq(
      "http://a.com/p",
      "http://a.com/p?keep=1",
      "http://a.com/p?keep=1",
      "http://a.com/p?keep=1&also=2",
      "http://a.com/p"))
  }

  test("bare ref is a policy parameter: conservative default keeps it, " +
      "the aggressive set strips it") {
    val urls = Seq(
      "https://host.dev/repo/file?ref=main", // semantic: selects content
      "http://a.com/p?ref=tw&keep=1")
    val conservative = canon(urls: _*)
    assert(conservative === Seq(
      "https://host.dev/repo/file?ref=main",
      "http://a.com/p?ref=tw&keep=1"))
    val aggressive = urls.toDF("u")
      .select(UrlCuration.canonicalizeUrl(col("u"),
        UrlCuration.AggressiveTrackingKeys).as("c"))
      .as[String].collect().toSeq
    assert(aggressive === Seq(
      "https://host.dev/repo/file",
      "http://a.com/p?keep=1"))
  }

  test("canonicalizeUrl is idempotent on its own output") {
    val raw = Seq(
      "HTTP://WWW.Example.COM:80/path/?utm_source=n&id=7&fbclid=a#s",
      "https://News.Site.CO.UK:443/a/b/?gclid=123",
      "http://plain.net/q?x=1",
      "http://a.com//",
      "http://a.com/p//?x=1")
    val once = canon(raw: _*)
    assert(canon(once: _*) === once)
  }

  test("canonicalizeUrl never rewrites query VALUES; slash cleanup is " +
      "boundary-anchored") {
    assert(canon(
      "http://a.com/r?next=/login/?to=home", // '/?' inside a value
      "http://a.com/p?dir=/tmp/",            // trailing '/' inside a value
      "http://a.com/p//?x=1",                // boundary slashes DO collapse
      "http://a.com//") === Seq(
      "http://a.com/r?next=/login/?to=home",
      "http://a.com/p?dir=/tmp/",
      "http://a.com/p?x=1",
      "http://a.com"))
  }

  test("registrableDomain: eTLD+1 incl. multi-label suffixes and bare hosts") {
    val got = Seq("sub.deep.domain.org", "news.site.co.uk", "x.gov.au",
      "plain.net", "localhost", "93.184.216.34")
      .toDF("h")
      .select(UrlCuration.registrableDomain(col("h")).as("d"))
      .as[String].collect().toSeq
    // an IPv4 literal has no registrable suffix: it must pass through,
    // never collapse to its "last two labels" (which would merge every
    // host in a /16 into one curation domain)
    assert(got === Seq("domain.org", "site.co.uk", "x.gov.au",
      "plain.net", "localhost", "93.184.216.34"))
  }

  private val Psl = Seq(
    ("github.io", true), ("blogspot.com", true),
    ("s3.dualstack.us-east-1.amazonaws.com", true),
    ("amazonaws.com", false), ("co.uk", false), ("uk", false),
    ("com", false), ("io", false), ("net", false))

  test("registrableDomainWithSuffixes: longest match wins across depths") {
    val hosts = Seq(
      "user1.github.io",                                  // private depth-2
      "deep.sub.user2.github.io",                         // +1 label above match
      "bucket.s3.dualstack.us-east-1.amazonaws.com",      // depth-5 beats amazonaws.com and com
      "eu.bucket.s3.dualstack.us-east-1.amazonaws.com",   // extra label above depth-5
      "app.amazonaws.com",                                // depth-2 public beats com
      "news.site.co.uk",                                  // public multi-label
      "github.io",                                        // host IS the suffix: passthrough
      "plain.net",                                        // depth-1
      "x.y.example",                                      // no match: embedded fallback
      "93.184.216.34")                                    // IP: fallback passthrough
    val got = UrlCuration.registrableDomainWithSuffixes(
        hosts.toDF("h"), "h", Psl.toDF("suffix", "is_private"), "dom")
      .select("h", "dom", "dom_private").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(got("user1.github.io") === (("user1.github.io", true)))
    assert(got("deep.sub.user2.github.io") === (("user2.github.io", true)))
    assert(got("bucket.s3.dualstack.us-east-1.amazonaws.com") ===
      (("bucket.s3.dualstack.us-east-1.amazonaws.com", true)))
    assert(got("eu.bucket.s3.dualstack.us-east-1.amazonaws.com") ===
      (("bucket.s3.dualstack.us-east-1.amazonaws.com", true)))
    assert(got("app.amazonaws.com") === (("app.amazonaws.com", false)))
    assert(got("news.site.co.uk") === (("site.co.uk", false)))
    assert(got("github.io") === (("github.io", true)))
    assert(got("plain.net") === (("plain.net", false)))
    assert(got("x.y.example") === (("y.example", false)))
    assert(got("93.184.216.34") === (("93.184.216.34", false)))
  }

  test("registrableDomainWithSuffixes: case-insensitive, rejects clashes") {
    val got = UrlCuration.registrableDomainWithSuffixes(
        Seq("User1.GitHub.IO").toDF("h"), "h",
        Seq(("GitHub.io", true)).toDF("suffix", "is_private"), "dom")
      .select("dom").as[String].head()
    assert(got === "user1.github.io")
    val clash = intercept[IllegalArgumentException] {
      UrlCuration.registrableDomainWithSuffixes(
        Seq(("h.io", "x")).toDF("h", "dom"), "h",
        Psl.toDF("suffix", "is_private"), "dom")
    }
    assert(clash.getMessage.contains("already exist"))
  }

  test("domainCap keeps the cap lowest-ordered rows per domain") {
    val df = Seq(("a.com", 3L), ("a.com", 1L), ("a.com", 2L),
      ("b.com", 9L)).toDF("domain", "ord")
    val got = UrlCuration.domainCap(df, "domain", "ord", 2)
      .as[(String, Long)].collect().toSet
    assert(got === Set(("a.com", 1L), ("a.com", 2L), ("b.com", 9L)))
  }

  test("blocklistFilter is an exact-name broadcast anti-join") {
    val df = Seq(("x.com", 1), ("spam.com", 2), ("notspam.com", 3))
      .toDF("domain", "v")
    val bl = Seq("spam.com").toDF("d")
    val got = UrlCuration.blocklistFilter(df, "domain", bl)
      .select("domain").as[String].collect().toSet
    assert(got === Set("x.com", "notspam.com")) // no substring matching
  }
}
