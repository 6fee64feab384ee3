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

  /** Tracking-parameter keys stripped by default: the link-decoration
    * families that are tracking by construction (Google/Urchin campaign
    * tags, social click ids, mail-campaign ids, Twitter's `ref_src`).
    * Deliberately EXCLUDES bare `ref` — on code-hosting and docs sites
    * `?ref=main` / `?ref=v2.1` selects content, so stripping it merges
    * distinct resources; callers that know their corpus is
    * campaign-decorated opt into [[AggressiveTrackingKeys]] instead. */
  val ConservativeTrackingKeys: String =
    "utm_[a-z0-9_]+|fbclid|gclid|msclkid|mc_eid|igshid|ref_src"

  /** [[ConservativeTrackingKeys]] plus bare referrer tags (`ref`) — the
    * over-strip-risk set: correct on social/newsletter-decorated corpora,
    * wrong on hosts where `ref` is semantic. A policy call, so it is a
    * caller parameter, never the silent default. */
  val AggressiveTrackingKeys: String = ConservativeTrackingKeys + "|ref"

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
    *
    * `trackingKeys` is the alternation of query-parameter keys treated
    * as tracking decoration ([[ConservativeTrackingKeys]] default;
    * [[AggressiveTrackingKeys]] adds bare `ref`).
    */
  def canonicalizeUrl(u: Column,
      trackingKeys: String = ConservativeTrackingKeys): Column = {
    val TrackingKeys = trackingKeys
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

  /** Registrable domain against a REAL suffix table — the Public Suffix
    * List as the deployment ships it (a bounded curated data file,
    * broadcast), covering what the embedded [[registrableDomain]] subset
    * cannot: the PSL *private* section. Without it `user1.github.io` and
    * `user2.github.io` both curate as `github.io`, so [[domainCap]]
    * throttles every GitHub-Pages/Blogspot/S3-website author as ONE
    * domain — the most common real-corpus hit in a CC-derived pipeline.
    *
    * `suffixes` must have columns `suffix` (e.g. `github.io`, `co.uk`)
    * and `is_private` (PSL section flag). Longest-match semantics: the
    * matched suffix with the most labels wins; registrable = one label
    * more than the match; a host that IS a suffix exactly passes
    * through (no registrable domain to extract); no match at all falls
    * back to the embedded heuristic. Wildcard (`*.ck`) and exception
    * (`!city.kawasaki.jp`) rules are expanded into plain rows table-side
    * by the deployment's PSL loader — the operator pins the match rule.
    *
    * Scale shape: one shuffle-free BROADCAST left join per distinct
    * suffix depth in the table (the PSL has ≤ ~5), keyed on the host's
    * last-d-labels string — a codegen'd expression. No explode, no
    * re-aggregation, no exchange of the big side; reading the depth set
    * off the bounded suffix table is a driver-side model-sizing action
    * (the LSH-planes pattern), not a data collect.
    *
    * Adds `out` (the registrable domain) and `out_private` (true when
    * the winning suffix is from the private section; false on public
    * match or fallback). */
  def registrableDomainWithSuffixes(df: DataFrame, hostCol: String,
      suffixes: DataFrame, out: String = "domain"): DataFrame = {
    require(Seq("suffix", "is_private").forall(suffixes.columns.contains),
      s"suffix table needs columns (suffix, is_private), got: ${suffixes.columns.mkString(", ")}")
    val clash = Seq(out, s"${out}_private").filter(df.columns.contains)
    require(clash.isEmpty,
      s"output column(s) ${clash.mkString(", ")} already exist in the input")
    val suf = suffixes.select(
      lower(col("suffix")).as("suffix"),
      col("is_private").cast("boolean").as("is_private"),
      size(split(lower(col("suffix")), "\\.")).as("depth"))
    val depths: Seq[Int] = suf.select(col("depth")).distinct()
      .collect().map(_.getInt(0)).sorted.reverse.toSeq
    val host = lower(col(hostCol))
    val labels = split(host, "\\.")
    val n = size(labels)
    def lastLabels(m: Column): Column =
      array_join(slice(labels, n - m + 1, m), ".")
    val joined = depths.foldLeft(df) { (cur, d) =>
      val sufD = suf.filter(col("depth") === d)
        .select(col("suffix").as(s"__psl_s$d"),
          col("is_private").as(s"__psl_p$d"))
      cur.withColumn(s"__psl_k$d", when(n >= d, lastLabels(lit(d))))
        .join(broadcast(sufD),
          col(s"__psl_k$d") === col(s"__psl_s$d"), "left")
    }
    // depths descending ⇒ the first non-null arm IS the longest match
    val domain = coalesce(depths.map { d =>
      when(col(s"__psl_s$d").isNotNull,
        when(n > d, lastLabels(lit(d + 1))).otherwise(host))
    } :+ registrableDomain(host): _*)
    val priv = coalesce(depths.map { d =>
      when(col(s"__psl_s$d").isNotNull, col(s"__psl_p$d"))
    } :+ lit(false): _*)
    joined.withColumn(out, domain)
      .withColumn(s"${out}_private", priv)
      .drop(depths.flatMap(d =>
        Seq(s"__psl_k$d", s"__psl_s$d", s"__psl_p$d")): _*)
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
