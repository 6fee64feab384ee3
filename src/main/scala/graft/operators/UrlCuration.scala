package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization and domain-level curation — the stage every
  * CC-derived training-data pipeline runs between crawl ingest
  * (sources.Warc / q172's `WARC-Target-URI`) and the dedup family:
  * the same page arrives under `HTTP://WWW.Site.COM:80/x/?utm_source=…`
  * and `http://site.com/x`, and exact/near dedup keyed on the raw URL
  * misses the repeat while per-domain statistics double-count the host.
  *
  * Reference behavior surface: JeremyBuchanan/telescope-data-pipeline has
  * no web-curation stage; this extends §2.10 the way Warc.scala extends
  * §2.1 (public operator family: Gopher/RefinedWeb/CCNet-style curation).
  *
  * Scale posture: [[canonicalizeUrl]] / [[registrableDomain]] are pure
  * Column expression chains — codegen'd, scan-parallel, shuffle-free.
  * [[domainCap]] is a rank-limit window (Spark plans a partial
  * WindowGroupLimit below the exchange, so per-domain floods are cut to
  * `cap` rows map-side before shuffling — the q22 lesson). Blocklists are
  * small curated sets and broadcast anti-joins.
  */
object UrlCuration {

  /** Tracking-parameter keys stripped by canonicalization (the
    * link-decoration families: Google/Urchin campaign tags, social click
    * ids, mail-campaign ids, bare referrer tags). */
  private val TrackingKeys =
    "utm_[a-z0-9_]+|fbclid|gclid|msclkid|mc_eid|igshid|ref|ref_src"

  /** Canonical form of an absolute URL, as a codegen'd expression chain:
    *
    *   1. drop the fragment (`#…` never reaches the server);
    *   2. lowercase the scheme and authority (host names are
    *      case-insensitive; the path/query is NOT touched — it is
    *      case-sensitive by spec);
    *   3. strip the scheme's default port (`:80` for http, `:443` for
    *      https) and a leading `www.`;
    *   4. remove tracking query parameters ([[TrackingKeys]]), wherever
    *      they sit in the query string, keeping parameter order of the
    *      survivors (no reordering: `?a=1&b=2` and `?b=2&a=1` are
    *      different resources on some servers, so reordering would
    *      over-merge);
    *   5. drop a now-empty `?`, slashes directly before the FIRST `?`
    *      (the path/query boundary — `/path/?q` ≡ `/path?q`), and
    *      trailing slashes when the URL has no query. Both rules are
    *      anchored to the boundary/end with a `[^?]*` prefix so a `/?`
    *      or trailing `/` inside a query VALUE (`?next=/login/?to=x`,
    *      `?dir=/tmp/`) is never touched — the query is data.
    *
    * Idempotent: canonical input passes through unchanged.
    */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    // authority prefix (scheme://host[:port]) vs the path+query remainder
    val prefix = regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    val rest = noFrag.substr(length(prefix) + 1, lit(1 << 24))
    val lowered = lower(prefix)
    val noPort = when(lowered.startsWith("http://"),
        regexp_replace(lowered, ":80$", ""))
      .when(lowered.startsWith("https://"),
        regexp_replace(lowered, ":443$", ""))
      .otherwise(lowered)
    val noWww = regexp_replace(noPort, "^(https?://)www\\.", "$1")
    val joined = concat(noWww, rest)
    // tracking params: mid-query, query-leading (next param promoted),
    // then sole-param; (?i) because decorated links arrive in any case
    val t1 = regexp_replace(joined, s"(?i)&($TrackingKeys)=[^&#]*", "")
    val t2 = regexp_replace(t1, s"(?i)\\?($TrackingKeys)=[^&#]*&", "?")
    val t3 = regexp_replace(t2, s"(?i)\\?($TrackingKeys)=[^&#]*$$", "")
    val noEmptyQ = regexp_replace(t3, "\\?$", "")
    // path/query boundary only: [^?]* pins the match to the FIRST '?'
    val noSlashQ =
      regexp_replace(noEmptyQ, "^([^?]*[^/?])/+\\?", "$1?")
    // trailing slashes only when there is no query ([^?]* must span the
    // whole prefix); one-or-more so '//'-padded paths stay idempotent
    regexp_replace(noSlashQ, "^([^?]*[^/?])/+$", "$1")
  }

  /** Host (authority minus any port) of a canonical URL. */
  def hostOf(canon: Column): Column =
    regexp_extract(canon, "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)

  /** Multi-label public suffixes recognized by [[registrableDomain]] — a
    * deliberately small embedded subset of the Public Suffix List (the
    * full PSL is a data file a deployment would broadcast-join instead;
    * the RULE — match the longest known suffix, keep one label more — is
    * what this operator pins). */
  private val MultiSuffix =
    "co|com|org|net|ac|gov|edu"
  private val MultiSuffixTld = "uk|au|jp|nz|za|in|br"

  /** Registrable domain ("eTLD+1") of a host: one label more than the
    * matched public suffix — `sub.domain.org` → `domain.org`,
    * `news.site.co.uk` → `site.co.uk`. Single-label hosts (`localhost`)
    * and IPv4-literal hosts pass through unchanged — an IP has no
    * registrable suffix, and taking its "last two labels" would merge
    * every host sharing a /16 into one curation domain. */
  def registrableDomain(host: Column): Column = {
    val isIp = host.rlike("^[0-9]+(\\.[0-9]+){3}$")
    val isMulti = host.rlike(s"(^|\\.)($MultiSuffix)\\.($MultiSuffixTld)$$")
    val dom = when(isMulti,
        regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1))
      .otherwise(regexp_extract(host, "([^.]+\\.[^.]+)$", 1))
    when(isIp || dom === "", host).otherwise(dom)
  }

  /** Keep at most `cap` rows per domain, by ascending `order` — the
    * per-domain volume cap curation applies so one mega-host cannot
    * dominate a corpus. The rank-filter shape lets Spark plan a partial
    * WindowGroupLimit before the exchange: a domain with 10M pages ships
    * `cap` rows per map partition, not 10M, into the shuffle. */
  def domainCap(df: DataFrame, domainCol: String, orderCol: String,
      cap: Int): DataFrame = {
    val w = Window.partitionBy(col(domainCol)).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Drop rows whose domain is on the blocklist. Curated blocklists are
    * small (thousands of names) next to the corpus, so the anti-join is
    * broadcast — no shuffle of the big side. */
  def blocklistFilter(df: DataFrame, domainCol: String,
      blocklist: DataFrame): DataFrame = {
    val bl = blocklist.toDF("__blocked")
    df.join(broadcast(bl), col(domainCol) === col("__blocked"), "left_anti")
  }
}
