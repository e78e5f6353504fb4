package graft.web

/** robots.txt (RFC 9309, the Robots Exclusion Protocol) parser and
  * matcher — the crawl-side admission filter that decides which URLs a
  * corpus is even allowed to contain.
  *
  * Grammar: `#` comments, case-insensitive field names, groups formed
  * by consecutive `User-agent` lines followed by their rules;
  * `Sitemap` and unknown fields are ignored for matching. Rule
  * patterns support RFC 9309's `*` (any octet sequence) and trailing
  * `$` (end anchor).
  *
  * Matching: the group set for an agent is every group naming the
  * agent token (case-insensitive); the `*` groups apply only when no
  * named group matched. Among matching rules the MOST SPECIFIC wins —
  * longest pattern in octets — and on a tie the least restrictive
  * (Allow) wins, both per RFC 9309 §2.2.2. No matching rule ⇒ allowed.
  *
  * Scale shape: one parsed policy per registrable domain, broadcast
  * beside the URL stream; evaluation is a pure per-row function.
  */
object RobotsTxt {

  case class Rule(allow: Boolean, pattern: String)
  case class Group(agents: Seq[String], rules: Seq[Rule], crawlDelay: Option[Int])
  case class Policy(groups: Seq[Group], sitemaps: Seq[String])

  def parse(txt: String): Policy = {
    val groups   = Seq.newBuilder[Group]
    val sitemaps = Seq.newBuilder[String]
    var agents   = Vector.empty[String]
    var rules    = Vector.empty[Rule]
    var delay    = Option.empty[Int]
    var openGroup = false // between a User-agent run and its rules

    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules, delay)
      agents = Vector.empty; rules = Vector.empty; delay = None
    }

    txt.split("\n").foreach { raw =>
      val line = { val h = raw.indexOf('#'); (if (h >= 0) raw.substring(0, h) else raw).trim }
      val c    = line.indexOf(':')
      if (c > 0) {
        val field = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        field match {
          case "user-agent" =>
            if (!openGroup) { flush(); openGroup = true } // new group starts
            agents :+= value.toLowerCase
          case "allow"    => openGroup = false; rules :+= Rule(allow = true, value)
          case "disallow" => openGroup = false; rules :+= Rule(allow = false, value)
          case "crawl-delay" =>
            openGroup = false
            delay = scala.util.Try(value.toInt).toOption.orElse(delay)
          case "sitemap" => sitemaps += value
          case _         => () // unknown fields ignored per RFC 9309 §2.2.4
        }
      }
    }
    flush()
    Policy(groups.result(), sitemaps.result())
  }

  /** RFC 9309 pattern match: literal octets, `*` = any sequence,
    * trailing `$` anchors the end. Empty pattern matches everything. */
  def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p        = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val parts    = p.split("\\*", -1)
    var pos      = 0
    var i        = 0
    while (i < parts.length) {
      val part = parts(i)
      if (i == 0) {
        if (!path.startsWith(part)) return false
        pos = part.length
      } else {
        val at = path.indexOf(part, pos)
        if (at < 0) return false
        pos = at + part.length
      }
      i += 1
    }
    if (anchored) {
      // last part must end the path; greedy indexOf may have stopped
      // early, so re-check via suffix when a wildcard precedes it
      if (parts.length == 1) pos == path.length
      else path.endsWith(parts.last) && path.length >= pos
    } else true
  }

  /** Rules in force for `agent`: all groups naming the token, else all
    * `*` groups (RFC 9309 merges same-agent groups). */
  def rulesFor(policy: Policy, agent: String): (Seq[Rule], Option[Int]) = {
    val a     = agent.toLowerCase
    val named = policy.groups.filter(_.agents.contains(a))
    val g     = if (named.nonEmpty) named else policy.groups.filter(_.agents.contains("*"))
    (g.flatMap(_.rules), g.flatMap(_.crawlDelay).headOption)
  }

  /** → (allowed, winning pattern or ""). Longest pattern wins; tie goes
    * to Allow; no match ⇒ allowed with "". Empty-pattern Disallow (the
    * classic `Disallow:` = allow-all idiom) never blocks. */
  def evaluate(policy: Policy, agent: String, path: String): (Boolean, String) = {
    val (rules, _) = rulesFor(policy, agent)
    var bestLen   = -1
    var bestAllow = true
    var bestPat   = ""
    rules.foreach { r =>
      if (r.pattern.nonEmpty && patternMatches(r.pattern, path)) {
        val l = r.pattern.length
        if (l > bestLen || (l == bestLen && r.allow && !bestAllow)) {
          bestLen = l; bestAllow = r.allow; bestPat = r.pattern
        }
      }
    }
    if (bestLen < 0) (true, "") else (bestAllow, bestPat)
  }
}
