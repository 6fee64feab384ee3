package graft.functions

/** robots.txt (RFC 9309) — the access-control stage a crawl pipeline
  * applies between URL canonicalization (operators.UrlCuration) and
  * fetch/curation. Scope: the `*` product-token group (a crawler with
  * its own token selects its group the same way — the group walk below
  * is token-agnostic), `Allow`/`Disallow` rules with `*` wildcards and
  * the `$` end anchor, longest-match precedence with Allow winning
  * length ties (RFC 9309 §2.2.2), undefined/no-match → allowed.
  *
  * Reference behavior surface: JeremyBuchanan/telescope-data-pipeline
  * has no crawl stage; this extends §2.10 alongside sources.Warc and
  * UrlCuration against the public spec only.
  *
  * Scale posture: robots files are per-DOMAIN and tiny next to the
  * corpus — parse once, broadcast the compiled rule sets, apply as a
  * per-row JVM predicate (typed mapPartitions in q177; never a SQL
  * UDF).
  */
object Robots {

  /** One rule: the raw path pattern, its match regex, allow or not.
    * `octets` is the RFC's specificity measure (pattern length). */
  final case class Rule(pattern: String, allow: Boolean) {
    val octets: Int = pattern.length
    private val rx: java.util.regex.Pattern = {
      val sb = new StringBuilder
      val body =
        if (pattern.endsWith("$")) pattern.dropRight(1) else pattern
      body.foreach {
        case '*' => sb.append(".*")
        case c if "\\.[]{}()<>+-=!?^$|".indexOf(c) >= 0 =>
          sb.append('\\').append(c)
        case c => sb.append(c)
      }
      if (pattern.endsWith("$")) sb.append('$') else sb.append(".*")
      java.util.regex.Pattern.compile("^" + sb.toString)
    }
    def matches(path: String): Boolean = rx.matcher(path).lookingAt()
  }

  /** Parse the rule group that applies to `agent` (RFC group walk:
    * consecutive `User-agent:` lines open a group, rule lines attach to
    * it; the most specific matching product token wins, `*` is the
    * fallback). Empty `Disallow:` is a no-op (allow-all marker). */
  def parse(txt: String, agent: String = "*"): Seq[Rule] = {
    val lc = agent.toLowerCase(java.util.Locale.ROOT)
    var groups = List.empty[(List[String], List[Rule])]
    var agents = List.empty[String]
    var rules = List.empty[Rule]
    var inAgents = true
    def close(): Unit = {
      if (agents.nonEmpty) groups ::= ((agents, rules.reverse))
      agents = Nil; rules = Nil
    }
    txt.split("\n", -1).foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents) { close(); inAgents = true }
            agents ::= value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" =>
            inAgents = false
            if (value.nonEmpty) rules ::= Rule(value, key == "allow")
          // other records (Sitemap:, Crawl-delay:, …) MUST NOT interfere
          // with group parsing (RFC 9309 §2.2.4): in particular one
          // between two consecutive User-agent: lines does not split the
          // started group — only a rule line closes the agent run.
          case _ => ()
        }
      }
    }
    close()
    // most specific matching token wins; '*' is the fallback; groups
    // sharing the winning token MERGE (RFC: combine same-agent groups)
    val all = groups.reverse
    val best = all.flatMap(_._1).distinct
      .filter(a => a != "*" && lc.contains(a))
      .sortBy(a => (-a.length, a)).headOption
    val token = best.getOrElse("*")
    all.filter(_._1.contains(token)).flatMap(_._2)
  }

  /** RFC 9309 §2.2.2 precedence: among matching rules the longest
    * pattern wins; on a length tie Allow wins; no match → allowed. */
  def isAllowed(rules: Seq[Rule], path: String): Boolean =
    rules.filter(_.matches(path)) match {
      case Nil => true
      case hits => hits.maxBy(r => (r.octets, if (r.allow) 1 else 0)).allow
    }

  /** Parse-then-check convenience for per-row application. */
  def isAllowed(robotsTxt: String, path: String, agent: String): Boolean =
    isAllowed(parse(robotsTxt, agent), path)
}
