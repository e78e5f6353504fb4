package graft.web

/** URL parsing + registrable-domain (eTLD+1) extraction — the crawl
  * bookkeeping every corpus pipeline needs (URL-level dedup keys,
  * per-domain caps, domain mixing stats all key on eTLD+1, not host:
  * `a.blogspot.example` and `b.blogspot.example` are different
  * publishers even though they share a "domain").
  *
  * [[parse]] is a hand-rolled RFC-3986-shaped splitter (scheme,
  * userinfo, host incl. `[IPv6]`, port, path, query, fragment) — a
  * pure function usable inside codegen'd `mapPartitions` with zero
  * allocation beyond the result. [[publicSuffix]] implements the real
  * Public Suffix List algorithm over an embedded rule set: normal
  * rules, `*.` wildcard rules, `!` exception rules; exception beats
  * wildcard, else longest match, else the implicit `*` default. The
  * rule list here is a small embedded snapshot — at production scale
  * the full PSL is a ~10k-entry broadcast map, same algorithm.
  */
object UrlOps {

  case class Parsed(scheme: String, userinfo: String, host: String, port: Int,
                    path: String, query: String, fragment: String)

  /** Split `scheme://[userinfo@]host[:port][/path][?query][#fragment]`.
    * Host is lowercased (DNS is case-insensitive); path/query/fragment
    * are preserved verbatim. Fails loudly on a missing scheme. */
  def parse(url: String): Parsed = {
    val ci = url.indexOf("://")
    require(ci > 0, s"URL has no scheme: '$url'")
    val scheme = url.substring(0, ci).toLowerCase
    val start  = ci + 3
    val hashI   = url.indexOf('#', start)
    val fragment = if (hashI < 0) "" else url.substring(hashI + 1)
    val preFrag  = if (hashI < 0) url.length else hashI
    val qRaw     = url.indexOf('?', start)
    val qI       = if (qRaw >= 0 && qRaw < preFrag) qRaw else -1
    val query    = if (qI < 0) "" else url.substring(qI + 1, preFrag)
    val pathEnd  = if (qI >= 0) qI else preFrag
    val sRaw     = url.indexOf('/', start)
    val slashI   = if (sRaw >= 0 && sRaw < pathEnd) sRaw else -1
    val path     = if (slashI < 0) "" else url.substring(slashI, pathEnd)
    val authEnd  = if (slashI >= 0) slashI else pathEnd
    var auth     = url.substring(start, authEnd)
    val at       = auth.lastIndexOf('@')
    val userinfo = if (at >= 0) auth.substring(0, at) else ""
    if (at >= 0) auth = auth.substring(at + 1)
    val (host, port) =
      if (auth.startsWith("[")) { // IPv6 literal: [::1]:8080
        val e = auth.indexOf(']')
        require(e > 0, s"unterminated IPv6 literal in '$url'")
        val rest = auth.substring(e + 1)
        (auth.substring(1, e), if (rest.startsWith(":")) rest.substring(1).toInt else -1)
      } else {
        val c = auth.lastIndexOf(':')
        if (c < 0) (auth, -1) else (auth.substring(0, c), auth.substring(c + 1).toInt)
      }
    Parsed(scheme, userinfo, host.toLowerCase, port, path, query, fragment)
  }

  /** Embedded PSL snapshot: enough shape diversity to exercise every
    * rule kind (plain, multi-label, wildcard, exception). */
  val SuffixRules: Seq[String] = Seq(
    "com", "org", "net", "io", "uk", "co.uk", "org.uk", "au", "gov.au",
    "github.io", "example", "s3.example",
    "jp", "kobe.jp", "*.kobe.jp", "!city.kobe.jp")

  private val parsedRules: Seq[(Boolean, Array[String])] =
    SuffixRules.map { r =>
      val exc = r.startsWith("!")
      (exc, (if (exc) r.substring(1) else r).split('.'))
    }

  /** The PSL algorithm: an exception rule wins outright (its suffix is
    * the rule minus its leftmost label); otherwise the longest
    * matching rule; otherwise the implicit `*` default (last label). */
  def publicSuffix(host: String): String = {
    val labels = host.split('.')
    var best   = 0
    parsedRules.foreach { case (exc, rl) =>
      if (rl.length <= labels.length) {
        val tail = labels.length - rl.length
        var ok   = true
        var k    = 0
        while (ok && k < rl.length) {
          ok = rl(k) == "*" || rl(k) == labels(tail + k); k += 1
        }
        if (ok) {
          if (exc) return labels.takeRight(rl.length - 1).mkString(".")
          if (rl.length > best) best = rl.length
        }
      }
    }
    labels.takeRight(math.max(best, 1)).mkString(".")
  }

  /** Registrable domain: one label more than the public suffix; empty
    * when the host IS a public suffix (not registrable). */
  def etld1(host: String): String = {
    val ps = publicSuffix(host)
    if (host == ps) ""
    else {
      val labels = host.split('.')
      labels.takeRight(ps.count(_ == '.') + 2).mkString(".")
    }
  }

  /** Host minus its registrable domain ("" when none). */
  def subdomain(host: String): String = {
    val e1 = etld1(host)
    if (e1.isEmpty || host == e1) "" else host.substring(0, host.length - e1.length - 1)
  }
}
